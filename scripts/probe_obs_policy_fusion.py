"""Bisect the obs->policy composition: is the 464 ms an XLA fusion pathology?

probe_body_bisect showed v_polonly (flat_observation + policy.apply +
sample_logits in ONE program) costs 464 ms warm while flat_observation and
policy.apply standalone each sit at the ~27 ms dispatch floor, and
probe_program_scaling showed there is no per-op/program-size overhead.
Suspect: XLA duplicating the expensive obs producer into the policy's
consumer fusions (the policy slices obs back into ego/partner/road blocks,
so the concat is bypassed and three consumers each pull from the producer).

Variants (each ONE warm jit, blocked, varied key, consumed scalar):
  v_obs          flat_observation alone
  v_polarg       policy.apply + sample on obs passed as an ARGUMENT
  v_obspol       obs -> policy (no sample)
  v_obsbar_pol   obs -> lax.optimization_barrier -> policy (no sample)
  v_full_bar     obs -> barrier -> policy -> sample  (the fixed body)
  v_full         obs -> policy -> sample             (the bad body, control)

Usage: timeout 3000 python scripts/probe_obs_policy_fusion.py
"""

import time

import jax
import jax.numpy as jnp

import gpudrive_lab_tpu

gpudrive_lab_tpu.enable_compile_cache()

from gpudrive_lab_tpu.env.config import EnvConfig
from gpudrive_lab_tpu.env.dataset import SceneDataLoader
from gpudrive_lab_tpu.env.env_jax import GPUDriveTPUEnv, flat_observation
from gpudrive_lab_tpu.ppo.train import build_trainer
from gpudrive_lab_tpu.ppo.ppo import PPOConfig
from gpudrive_lab_tpu.networks.late_fusion import sample_logits

W = 64
CC = 64
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
policy, variables, _, carry, fresh, _ = build_trainer(
    env, PPOConfig(rollout_len=4, compact=CC, unroll=True),
    seed=0, rollout_mode="unroll",
)
scene, weights, params, spec = env.scene, env.reward_weights, env.params, env.spec
cidx = jnp.argsort(
    jnp.where(scene.agents.controlled, 0, 1), axis=1, stable=True
)[:, :CC]


def timeit(name, fn, reps=3):
    out = fn(jax.random.PRNGKey(0))
    jax.block_until_ready(out)
    best = None
    for r in range(reps):
        t0 = time.time()
        out = fn(jax.random.PRNGKey(r + 1))
        jax.block_until_ready(out)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"{name:14s} {best*1000:10.1f} ms", flush=True)


def obs_of(state, key):
    # perturb state so repeated calls can't be memoized
    state = state.replace(pos=state.pos + jax.random.uniform(key) * 1e-6)
    obs, _, _ = flat_observation(scene, state, params, spec, weights, cidx)
    return obs


@jax.jit
def v_obs(state, key):
    return obs_of(state, key).sum()


timeit("v_obs", lambda k: v_obs(fresh, k))


@jax.jit
def v_polarg(variables, obs, key):
    obs = obs + jax.random.uniform(key) * 1e-6
    logits, value = policy.apply(variables, obs)
    a, logp, ent = sample_logits(key, logits)
    return logp[0, 0] + value[0, 0] + a[0, 0]


obs0 = jax.block_until_ready(
    jax.jit(lambda s, k: obs_of(s, k))(fresh, jax.random.PRNGKey(9))
)
timeit("v_polarg", lambda k: v_polarg(variables, obs0, k))


@jax.jit
def v_obspol(state, variables, key):
    obs = obs_of(state, key)
    logits, value = policy.apply(variables, obs)
    return logits.sum() + value.sum()


timeit("v_obspol", lambda k: v_obspol(fresh, variables, k))


@jax.jit
def v_obsbar_pol(state, variables, key):
    obs = obs_of(state, key)
    obs = jax.lax.optimization_barrier(obs)
    logits, value = policy.apply(variables, obs)
    return logits.sum() + value.sum()


timeit("v_obsbar_pol", lambda k: v_obsbar_pol(fresh, variables, k))


@jax.jit
def v_full_bar(state, variables, key):
    obs = obs_of(state, key)
    obs = jax.lax.optimization_barrier(obs)
    logits, value = policy.apply(variables, obs)
    a, logp, ent = sample_logits(key, logits)
    return logp[0, 0] + value[0, 0] + a[0, 0]


timeit("v_full_bar", lambda k: v_full_bar(fresh, variables, k))


@jax.jit
def v_full(state, variables, key):
    obs = obs_of(state, key)
    logits, value = policy.apply(variables, obs)
    a, logp, ent = sample_logits(key, logits)
    return logp[0, 0] + value[0, 0] + a[0, 0]


timeit("v_full", lambda k: v_full(fresh, variables, k))
