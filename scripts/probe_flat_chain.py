"""Decompose the peak train config's rollout body by timing 32 CHAINED
copies inside ONE jit program (the real unrolled-rollout shape, so the
per-dispatch floor amortizes): step-only vs +obs vs +policy/sample/scatter.

Config mirrors the round-3/4 peak: W=256, flat compaction N=4096, agent
bucket auto, bf16 policy.  Methodology per CLAUDE.md: consumed scalar
threaded through every step, fresh PRNG per repetition, best-of-N.
"""

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
print(f"A bucket = {A}, R bucket = {scene.roads.pos.shape[1]}", flush=True)

policy = LateFusionPolicy(
    PolicyConfig(action_dim=env.action_space_n, dtype=jnp.bfloat16)
)
fresh = jax.jit(stepmod.reset, static_argnames="params")(scene, None, params)
obs0, _, _ = flat_observation(
    scene, fresh, params, spec, weights,
    None,
)
variables = policy.init(jax.random.PRNGKey(0), obs0.reshape(-1, obs0.shape[-1])[:1])

ctrl = scene.agents.controlled.reshape(-1)
order = jnp.argsort(jnp.where(ctrl, 0, 1), stable=True)[:N]
cidx = (order // A, order % A)

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
    print(f"{name:16s} {best*1000:9.1f} ms total  {best*1000/T:7.2f} ms/step"
          f"  (compile {comp:.0f}s)", flush=True)
    return best


def perturb(state, key):
    return state.replace(
        pos=state.pos + jax.random.uniform(key, (), minval=0, maxval=1e-6)
    )


@jax.jit
def chain_step(state, key):
    state = perturb(state, key)
    acc = jnp.float32(0)
    act = jnp.zeros((W, A, C.ACTION_DIM), jnp.float32)
    for _ in range(T):
        state = stepmod.step(scene, state, act, params)
        acc = acc + state.pos[0, 0, 0]
    return acc


@jax.jit
def chain_step_obs(state, key):
    state = perturb(state, key)
    acc = jnp.float32(0)
    act = jnp.zeros((W, A, C.ACTION_DIM), jnp.float32)
    for _ in range(T):
        obs, _, _ = flat_observation(scene, state, params, spec, weights, cidx)
        state = stepmod.step(scene, state, act, params)
        acc = acc + obs[0, 0].astype(jnp.float32) + state.pos[0, 0, 0]
    return acc


@jax.jit
def chain_obs_only(state, key):
    state = perturb(state, key)
    acc = jnp.float32(0)
    for i in range(T):
        state = state.replace(pos=state.pos + 1e-7 * i)
        obs, _, _ = flat_observation(scene, state, params, spec, weights, cidx)
        acc = acc + obs[0, 0].astype(jnp.float32)
    return acc


@jax.jit
def chain_full(state, key):
    acc = jnp.float32(0)
    for _ in range(T):
        key, k = jax.random.split(key)
        obs, _, _ = flat_observation(scene, state, params, spec, weights, cidx)
        logits, value = policy.apply(variables, obs)
        a, logp, ent = sample_logits(k, logits)
        a_full = jnp.zeros((W, A), a.dtype).at[cidx[0], cidx[1]].set(a)
        act = jnp.zeros((W, A, C.ACTION_DIM), jnp.float32).at[..., :3].set(
            table[a_full]
        )
        state = stepmod.step(scene, state, act, params)
        acc = acc + logp.sum() + value.sum()
    return acc


@jax.jit
def chain_policy_only(state, key):
    obs, _, _ = flat_observation(scene, state, params, spec, weights, cidx)
    acc = jnp.float32(0)
    for _ in range(T):
        key, k = jax.random.split(key)
        o = obs + jax.random.uniform(k, (), minval=0, maxval=1e-6)
        logits, value = policy.apply(variables, o)
        a, logp, ent = sample_logits(k, logits)
        acc = acc + logp.sum() + value.sum()
    return acc


timeit("step_only", chain_step)
timeit("obs_only", chain_obs_only)
timeit("step+obs", chain_step_obs)
timeit("policy_only", chain_policy_only)
timeit("full_body", chain_full)
