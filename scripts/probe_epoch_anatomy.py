"""Update-epoch anatomy v2: replicate ONE real minibatch epoch standalone.

Round-4 measurements: a full train iteration at the W=256 peak config costs
0.335 s rollout + 0.123 s per update epoch, i.e. ~7.7 ms per 8192-sample
minibatch — while probe_update_anatomy's bare fwd+bwd+adam benches ~1-2 ms.
This probe rebuilds the epoch EXACTLY as ppo.update does (bf16 obs store
[T, N, 3368], per-minibatch jnp.take + reshape, the same clip losses and
adam) and bisects where the remaining ~5 ms/minibatch lives:

  ep_real     the real epoch: take-assembly + fwd/bwd + adam x16
  ep_math     same loss/adam but minibatch tensors pre-materialized
              (isolates the take-assembly)
  ep_fwdonly  assembly + forward loss only (isolates backward)
  ep_split    assembly + fwd/bwd/adam on PRE-SPLIT obs stores (ego
              [T,N,6] / partner [T,N,127,6] / road [T,N,200,13]): tests
              whether the flat-3368 unpack (misaligned slice + reshape
              relayouts) is the hidden cost

Run (TPU): timeout 3600 python scripts/probe_epoch_anatomy.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

import gpudrive_lab_tpu

gpudrive_lab_tpu.enable_compile_cache()

from gpudrive_lab_tpu.networks.late_fusion import (
    LateFusionPolicy,
    PolicyConfig,
    sample_logits,
)

import os

N, D = 4096, 3368
# M chained minibatch updates per epoch program.  The production epoch runs
# 16 over a [32, N] store, but the remote TPU compiler crashes (broken
# pipe) on the 16-segment unrolled program — 4 segments compiles, and the
# metric is ms/minibatch at the production minibatch SIZE, so T scales with
# M to keep Tm = 2 and B = 8192 samples exactly as production.
M = int(os.environ.get("PROBE_M", "4"))
EPOCHS = 1
Tm = 2
T = Tm * M
B = Tm * N  # samples per minibatch (8192 = production)

pc = PolicyConfig(action_dim=91, dtype=jnp.bfloat16)
policy = LateFusionPolicy(pc)
variables = policy.init(jax.random.PRNGKey(0), jnp.zeros((1, D)))
tx = optax.chain(optax.clip_by_global_norm(0.5), optax.adam(3e-4, eps=1e-5))
opt_state = tx.init(variables)

key = jax.random.PRNGKey(1)
batch = {
    "obs": jax.random.normal(key, (T, N, D), jnp.bfloat16),
    "action": jnp.zeros((T, N), jnp.int32),
    "logprob": jnp.full((T, N), -4.5),
    "value": jnp.zeros((T, N)),
    "adv": jax.random.normal(key, (T, N)),
    "ret": jax.random.normal(key, (T, N)),
    "mask": jnp.ones((T, N), bool),
}
# pre-split stores for ep_split (reshaped from the same bytes)
split = {
    "ego": batch["obs"][..., :6].astype(jnp.bfloat16),
    "partner": batch["obs"][..., 6:768].reshape(T, N, 127, 6),
    "road": batch["obs"][..., 768:3368].reshape(T, N, 200, 13),
}


def loss_from_obs(variables, obs, mb, rng):
    logits, value = policy.apply(variables, obs)
    _, newlogp, entropy = sample_logits(rng, logits, mb["action"])
    logratio = newlogp - mb["logprob"]
    ratio = jnp.exp(logratio)
    m = mb["mask"].astype(jnp.float32)
    msum = jnp.maximum(m.sum(), 1.0)
    adv = mb["adv"]
    mean = (adv * m).sum() / msum
    var = (((adv - mean) ** 2) * m).sum() / msum
    adv = (adv - mean) * jax.lax.rsqrt(var + 1e-8)
    pg1 = -adv * ratio
    pg2 = -adv * jnp.clip(ratio, 0.8, 1.2)
    pg_loss = (jnp.maximum(pg1, pg2) * m).sum() / msum
    v_clip = mb["value"] + jnp.clip(value - mb["value"], -10.0, 10.0)
    v_loss = (0.5 * jnp.maximum((value - mb["ret"]) ** 2,
                                (v_clip - mb["ret"]) ** 2) * m).sum() / msum
    ent = (entropy * m).sum() / msum
    return pg_loss - 1e-3 * ent + 0.5 * v_loss


def make_epoch(mode):
    def take(x, idx):
        return jnp.take(x, idx, axis=0).reshape((-1,) + x.shape[2:])

    def epoch(variables, opt_state, perm, jitter):
        t_indices = perm.reshape(M, Tm)
        acc = jnp.float32(0)
        for m in range(M):
            idx = t_indices[m]
            rng = jax.random.fold_in(jax.random.PRNGKey(7), m)
            mb = {k: take(v, idx) for k, v in batch.items() if k != "obs"}
            if mode == "ep_math":
                obs = batch["obs"][:Tm].reshape(B, D) + jitter
                loss_fn = lambda v: loss_from_obs(v, obs, mb, rng)
            elif mode == "ep_split":
                obs3 = tuple(take(split[k], idx) for k in
                             ("ego", "partner", "road"))
                loss_fn = lambda v: loss_from_obs(v, obs3, mb, rng)
            else:
                obs = take(batch["obs"], idx)
                loss_fn = lambda v: loss_from_obs(v, obs.reshape(B, D), mb, rng)
            if mode == "ep_fwdonly":
                loss = loss_fn(variables)
            else:
                loss, grads = jax.value_and_grad(loss_fn)(variables)
                updates, opt_state = tx.update(grads, opt_state, variables)
                variables = optax.apply_updates(variables, updates)
            acc = acc + loss
        return variables, opt_state, acc

    return jax.jit(epoch)


if __name__ == "__main__":
    print(f"T={T} N={N} D={D} M={M} minibatch={B}", flush=True)
    for mode in ("ep_real", "ep_math", "ep_fwdonly", "ep_split"):
        fn = make_epoch(mode)
        try:
            t0 = time.time()
            out = fn(variables, opt_state,
                     jax.random.permutation(jax.random.PRNGKey(2), T),
                     jnp.float32(0))
            jax.block_until_ready(out)
            comp = time.time() - t0
            best = 1e9
            for r in range(3):
                perm = jax.random.permutation(jax.random.PRNGKey(3 + r), T)
                t0 = time.time()
                out = fn(variables, opt_state, perm, jnp.float32(r) * 1e-6)
                jax.block_until_ready(out)
                best = min(best, time.time() - t0)
            print(f"{mode:12s} {best*1000:8.1f} ms/epoch  "
                  f"{best*1000/M:6.2f} ms/minibatch  (compile {comp:.0f}s)",
                  flush=True)
        except Exception as e:  # split mode may not be wired into the policy
            print(f"{mode:12s} SKIPPED: {type(e).__name__}: {e}", flush=True)
