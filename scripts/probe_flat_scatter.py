"""Bisect the full-body overhead at the peak flat config: the chained full
body costs ~15 ms/step while step+obs+policy sum to ~5 — find the glue
term (action scatter? sampling? table gather?) and test fixes in-chain."""

import argparse
import time

import jax
import jax.numpy as jnp

import gpudrive_lab_tpu

gpudrive_lab_tpu.enable_compile_cache()

from gpudrive_lab_tpu import constants as C
from gpudrive_lab_tpu.core import step as stepmod
from gpudrive_lab_tpu.env.config import EnvConfig
from gpudrive_lab_tpu.env.dataset import SceneDataLoader
from gpudrive_lab_tpu.env.env_jax import GPUDriveTPUEnv, flat_observation
from gpudrive_lab_tpu.networks.late_fusion import (
    LateFusionPolicy, PolicyConfig, sample_logits,
)

ap = argparse.ArgumentParser()
ap.add_argument("--worlds", type=int, default=256)
ap.add_argument("--flat", type=int, default=4096)
ap.add_argument("--steps", type=int, default=32)
ap.add_argument("--reps", type=int, default=3)
args = ap.parse_args()

W, N, T = args.worlds, args.flat, args.steps

loader = SceneDataLoader(
    root="/root/reference/data/processed/examples", batch_size=W,
    dataset_size=1000, sample_with_replacement=True, seed=0,
)
cfg = EnvConfig(
    num_worlds=W, reward_type="weighted_combination",
    collision_weight=-0.75, off_road_weight=-0.75,
    goal_achieved_weight=1.0, dynamics_model="classic",
    collision_behavior="ignore",
)
env = GPUDriveTPUEnv(cfg, data_loader=loader)
scene, params, spec, weights = env.scene, env.params, env.spec, env.reward_weights
A = scene.agents.valid.shape[1]
policy = LateFusionPolicy(
    PolicyConfig(action_dim=env.action_space_n, dtype=jnp.bfloat16)
)
fresh = jax.jit(stepmod.reset, static_argnames="params")(scene, None, params)
obs0, _, _ = flat_observation(scene, fresh, params, spec, weights, None)
variables = policy.init(jax.random.PRNGKey(0), obs0.reshape(-1, obs0.shape[-1])[:1])

ctrl = scene.agents.controlled.reshape(-1)
order = jnp.argsort(jnp.where(ctrl, 0, 1), stable=True)[:N]
cidx = (order // A, order % A)
# precomputed inverse map: full slot (w, a) -> flat row (or N for "none")
inv = jnp.full((W * A,), N, jnp.int32).at[order].set(jnp.arange(N, dtype=jnp.int32))
inv = inv.reshape(W, A)
table = env.action_keys


def timeit(name, fn):
    t0 = time.time()
    jax.block_until_ready(fn(fresh, jax.random.PRNGKey(0)))
    comp = time.time() - t0
    best = 1e9
    for r in range(args.reps):
        t0 = time.time()
        jax.block_until_ready(fn(fresh, jax.random.PRNGKey(r + 1)))
        best = min(best, time.time() - t0)
    print(f"{name:22s} {best*1000:9.1f} ms total  {best*1000/T:7.2f} ms/step"
          f"  (compile {comp:.0f}s)", flush=True)
    return best


def make_chain(place_back, sample=True):
    @jax.jit
    def chain(state, key):
        acc = jnp.float32(0)
        for _ in range(T):
            key, k = jax.random.split(key)
            obs, _, _ = flat_observation(scene, state, params, spec, weights, cidx)
            logits, value = policy.apply(variables, obs)
            if sample:
                a, logp, ent = sample_logits(k, logits)
            else:
                a = jnp.argmax(logits, axis=-1)
                logp = jnp.zeros(a.shape, jnp.float32)
            a_full = place_back(a)
            act = jnp.zeros((W, A, C.ACTION_DIM), jnp.float32).at[..., :3].set(
                table[a_full]
            )
            state = stepmod.step(scene, state, act, params)
            acc = acc + logp.sum() + value.sum()
        return acc
    return chain


scatter = lambda a: jnp.zeros((W, A), a.dtype).at[cidx[0], cidx[1]].set(a)
scatter_u = lambda a: jnp.zeros((W, A), a.dtype).at[cidx[0], cidx[1]].set(
    a, unique_indices=True
)
gather_inv = lambda a: jnp.concatenate([a, jnp.zeros((1,), a.dtype)])[inv]

timeit("scatter (current)", make_chain(scatter))
timeit("scatter unique", make_chain(scatter_u))
timeit("gather inverse", make_chain(gather_inv))
timeit("gather + argmax", make_chain(gather_inv, sample=False))
timeit("scatter + argmax", make_chain(scatter, sample=False))
