"""Anatomy of the PPO update phase: why does one minibatch segment cost
~11 ms inside the train program when its GEMMs are ~1 ms?

Times (blocked, best-of-3, varied keys):
  upd1        one minibatch update (fwd+bwd+clip+adam) standalone
  upd8        8 chained updates in ONE jit (amortizes the dispatch floor)
  upd8_nograd 8 chained forward-only losses (isolates backward+adam)
  upd8_noadam 8 chained fwd+bwd without the optimizer (isolates adam+clip)

Run: timeout 1200 python scripts/probe_update_anatomy.py [--dtype bf16]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import optax

import gpudrive_lab_tpu

gpudrive_lab_tpu.enable_compile_cache()

from gpudrive_lab_tpu.networks.late_fusion import (
    LateFusionPolicy,
    PolicyConfig,
)

p = argparse.ArgumentParser()
p.add_argument("--dtype", choices=["f32", "bf16"], default="f32")
p.add_argument("--batch", type=int, default=8192)
args = p.parse_args()

pc = PolicyConfig(
    action_dim=91,
    dtype=jnp.bfloat16 if args.dtype == "bf16" else jnp.float32,
)
policy = LateFusionPolicy(pc)
B = args.batch
variables = policy.init(jax.random.PRNGKey(0), jnp.zeros((1, pc.obs_dim)))
tx = optax.chain(optax.clip_by_global_norm(0.5), optax.adam(3e-4, eps=1e-5))
opt_state = tx.init(variables)
print(f"dtype={args.dtype} batch={B} obs_dim={pc.obs_dim}", flush=True)


def loss_fn(variables, obs, action, adv, old_logp, ret):
    logits, value = policy.apply(variables, obs)
    logp_all = jax.nn.log_softmax(logits)
    logp = jnp.take_along_axis(logp_all, action[..., None], axis=-1)[..., 0]
    ratio = jnp.exp(logp - old_logp)
    pg = jnp.maximum(-adv * ratio, -adv * jnp.clip(ratio, 0.8, 1.2)).mean()
    v = (0.5 * (value - ret) ** 2).mean()
    ent = -(jnp.exp(logp_all) * logp_all).sum(-1).mean()
    return pg + 0.3 * v - 1e-3 * ent


grad_fn = jax.value_and_grad(loss_fn)


def batch_of(key):
    ks = jax.random.split(key, 5)
    return (
        jax.random.normal(ks[0], (B, pc.obs_dim)),
        jax.random.randint(ks[1], (B,), 0, 91),
        jax.random.normal(ks[2], (B,)),
        jax.random.normal(ks[3], (B,)) * 0.1,
        jax.random.normal(ks[4], (B,)),
    )


def one_update(variables, opt_state, key):
    obs, action, adv, old_logp, ret = batch_of(key)
    loss, grads = grad_fn(variables, obs, action, adv, old_logp, ret)
    updates, opt_state = tx.update(grads, opt_state, variables)
    variables = optax.apply_updates(variables, updates)
    return variables, opt_state, loss


@jax.jit
def upd1(variables, opt_state, key):
    variables, opt_state, loss = one_update(variables, opt_state, key)
    return loss + jax.tree.leaves(variables)[0].sum()


@jax.jit
def upd8(variables, opt_state, key):
    acc = jnp.float32(0)
    for i in range(8):
        variables, opt_state, loss = one_update(
            variables, opt_state, jax.random.fold_in(key, i)
        )
        acc = acc + loss
    return acc + jax.tree.leaves(variables)[0].sum()


@jax.jit
def upd8_nograd(variables, key):
    acc = jnp.float32(0)
    for i in range(8):
        acc = acc + loss_fn(variables, *batch_of(jax.random.fold_in(key, i)))
    return acc


@jax.jit
def upd8_noadam(variables, key):
    acc = jnp.float32(0)
    for i in range(8):
        loss, grads = grad_fn(
            variables, *batch_of(jax.random.fold_in(key, i))
        )
        acc = acc + loss + jax.tree.leaves(grads)[0].sum()
    return acc


def timeit(name, fn, reps=3):
    t0 = time.time()
    jax.block_until_ready(fn(jax.random.PRNGKey(0)))
    c = time.time() - t0
    best = None
    for r in range(reps):
        t0 = time.time()
        jax.block_until_ready(fn(jax.random.PRNGKey(r + 1)))
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"{name:12s} {best*1000:9.1f} ms  (compile {c:.1f}s)", flush=True)


timeit("upd1", lambda k: upd1(variables, opt_state, k))
timeit("upd8", lambda k: upd8(variables, opt_state, k))
timeit("upd8_nograd", lambda k: upd8_nograd(variables, k))
timeit("upd8_noadam", lambda k: upd8_noadam(variables, k))
