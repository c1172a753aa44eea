"""Update-epoch anatomy v3: the production epoch as ONE argument-passing jit.

v2 (probe_epoch_anatomy.py) closed over the [T, N, 3368] store — on the
axon backend closure constants pollute every call with executable-constant
upload, so its absolute numbers were untrustworthy (ep_math == ep_real).
v3 passes the store as an ARGUMENT, runs the full production epoch (M=16
minibatch segments over the [32, 4096] batch, take-assembly + clip losses +
adam, bf16 store + bf16 policy GEMMs) per dispatch, and A/Bs the levers:

  flat          [T, N, 3368] bf16 store, per-minibatch take (round-4 prod)
  split         (ego, partner, road) bf16 stores (round-5 obs_store=split)
  split_remat   split + PolicyConfig.embed_remat (partner/road embed+pool
                rematerialized in bwd: the [B, E, 64] activations never
                round-trip HBM)
  flat_remat    flat + embed_remat

Run (TPU): timeout 3600 python scripts/probe_epoch_v3.py
"""

import os
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

N = int(os.environ.get("PROBE_N", "4096"))
T = int(os.environ.get("PROBE_T", "32"))
M = int(os.environ.get("PROBE_MB", "16"))
D = 3368
Tm = T // M
B = Tm * N

tx = optax.chain(optax.clip_by_global_norm(0.5), optax.adam(3e-4, eps=1e-5))


def make_batch(key, split):
    ks = jax.random.split(key, 4)
    obs = jax.random.normal(ks[0], (T, N, D), jnp.bfloat16)
    batch = {
        "action": jax.random.randint(ks[1], (T, N), 0, 91),
        "logprob": jnp.full((T, N), -4.5),
        "value": jnp.zeros((T, N)),
        "adv": jax.random.normal(ks[2], (T, N)),
        "ret": jax.random.normal(ks[3], (T, N)),
        "mask": jnp.ones((T, N), bool),
    }
    if split:
        batch["obs"] = (
            obs[..., :6],
            obs[..., 6:768].reshape(T, N, 127, 6),
            obs[..., 768:D].reshape(T, N, 200, 13),
        )
    else:
        batch["obs"] = obs
    return batch


def make_epoch(policy, split):
    def loss_fn(variables, mb, rng):
        logits, value = policy.apply(variables, mb["obs"])
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
        v_loss = (0.5 * jnp.maximum(
            (value - mb["ret"]) ** 2, (v_clip - mb["ret"]) ** 2) * m
        ).sum() / msum
        ent = (entropy * m).sum() / msum
        return pg_loss - 1e-3 * ent + 0.5 * v_loss

    grad_fn = jax.value_and_grad(loss_fn)

    def epoch(variables, opt_state, batch, perm):
        t_indices = perm.reshape(M, Tm)
        acc = jnp.float32(0)
        for m in range(M):
            idx = t_indices[m]
            take = lambda x: jnp.take(x, idx, axis=0).reshape(
                (-1,) + x.shape[2:]
            )
            mb = {k: jax.tree.map(take, v) for k, v in batch.items()}
            loss, grads = grad_fn(
                variables, mb, jax.random.fold_in(jax.random.PRNGKey(7), m)
            )
            updates, opt_state = tx.update(grads, opt_state, variables)
            variables = optax.apply_updates(variables, updates)
            acc = acc + loss
        return variables, opt_state, acc

    return jax.jit(epoch, donate_argnums=(0, 1))


if __name__ == "__main__":
    print(f"T={T} N={N} M={M} minibatch={B}", flush=True)
    for mode in ("flat", "split", "split_remat", "flat_remat"):
        split = mode.startswith("split")
        remat = mode.endswith("remat")
        pc = PolicyConfig(action_dim=91, dtype=jnp.bfloat16,
                          embed_remat=remat)
        policy = LateFusionPolicy(pc)
        variables = policy.init(jax.random.PRNGKey(0), jnp.zeros((1, D)))
        opt_state = tx.init(variables)
        fn = make_epoch(policy, split)
        batch = make_batch(jax.random.PRNGKey(1), split)
        t0 = time.time()
        out = fn(variables, opt_state, batch,
                 jax.random.permutation(jax.random.PRNGKey(2), T))
        # HOST FETCH, not block_until_ready: the lazy axon runtime can
        # acknowledge readiness without forcing remote execution — only a
        # device->host fetch of a value that depends on ALL the work is a
        # reliable barrier (CLAUDE.md benchmark doctrine).
        float(out[2])
        comp = time.time() - t0
        best = 1e9
        for r in range(3):
            batch = make_batch(jax.random.PRNGKey(3 + r), split)
            variables2 = jax.tree.map(jnp.copy, out[0])
            opt2 = jax.tree.map(jnp.copy, out[1])
            perm = jax.random.permutation(jax.random.PRNGKey(5 + r), T)
            jax.block_until_ready((batch, variables2, opt2))
            t0 = time.time()
            o = fn(variables2, opt2, batch, perm)
            # acc covers every loss; the leaf fetch covers the final
            # minibatch's optimizer update too.
            float(o[2]); float(jax.tree.leaves(o[0])[0].ravel()[0])
            best = min(best, time.time() - t0)
        print(f"{mode:12s} {best*1000:8.1f} ms/epoch  "
              f"{best*1000/M:6.2f} ms/minibatch  (compile {comp:.0f}s)",
              flush=True)
