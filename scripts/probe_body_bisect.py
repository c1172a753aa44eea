"""Bisect the rollout body: which op composition costs 435 ms?

Variants (each ONE warm jit, blocked):
  v_polonly   obs + policy + sample                      (expect ~30 ms)
  v_steprand  obs + policy + sample, step w/ random acts (dependency-free)
  v_depstep   obs + policy, step consumes sampled a DIRECTLY (compact==A slots)
  v_scatter   full body with the .at[arange, cidx].set scatter
  v_gather    full body with the inverse-rank GATHER construction instead
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

import gpudrive_lab_tpu

gpudrive_lab_tpu.enable_compile_cache()

from gpudrive_lab_tpu.env.config import EnvConfig
from gpudrive_lab_tpu.env.dataset import SceneDataLoader
from gpudrive_lab_tpu.env.env_jax import GPUDriveTPUEnv, flat_observation
from gpudrive_lab_tpu.ppo.train import build_trainer
from gpudrive_lab_tpu.ppo.ppo import PPOConfig
from gpudrive_lab_tpu.core import step as stepmod
from gpudrive_lab_tpu.networks.late_fusion import sample_logits
from gpudrive_lab_tpu import constants as C

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
order = jnp.argsort(jnp.where(scene.agents.controlled, 0, 1), axis=1, stable=True)
cidx = order[:, :CC]
# inverse rank: rank[w, slot] = position of slot in order[w]
rank = jnp.argsort(order, axis=1)  # [W, A]
n_act = env.action_space_n


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
    print(f"{name:12s} {best*1000:10.1f} ms", flush=True)


def polpart(state, k):
    obs, _, _ = flat_observation(scene, state, params, spec, weights, cidx)
    logits, value = policy.apply(variables, obs)
    a, logp, ent = sample_logits(k, logits)
    return a, logp, value


@jax.jit
def v_polonly(state, variables_unused, key):
    a, logp, value = polpart(state, key)
    return logp[0, 0] + value[0, 0] + a[0, 0]


timeit("v_polonly", lambda k: v_polonly(fresh, variables, k))


@jax.jit
def v_steprand(state, key):
    k1, k2 = jax.random.split(key)
    a, logp, value = polpart(state, k1)
    idx = jax.random.randint(k2, (W, C.MAX_AGENTS), 0, n_act)
    act = jnp.zeros((W, C.MAX_AGENTS, C.ACTION_DIM), jnp.float32).at[
        ..., :3
    ].set(env.action_keys[idx])
    s = stepmod.step(scene, state, act, params)
    return logp[0, 0] + value[0, 0] + a[0, 0] + s.pos[0, 0, 0]


timeit("v_steprand", lambda k: v_steprand(fresh, k))


@jax.jit
def v_depstep(state, key):
    """step consumes the sampled actions via a CHEAP place-back: pad compact
    a to [W, A] with zeros on the right (slot mapping wrong, but exercises
    the dependency without scatter/gather)."""
    a, logp, value = polpart(state, key)
    a_full = jnp.pad(a, ((0, 0), (0, C.MAX_AGENTS - CC)))
    act = jnp.zeros((W, C.MAX_AGENTS, C.ACTION_DIM), jnp.float32).at[
        ..., :3
    ].set(env.action_keys[a_full])
    s = stepmod.step(scene, state, act, params)
    return logp[0, 0] + value[0, 0] + s.pos[0, 0, 0]


timeit("v_depstep", lambda k: v_depstep(fresh, k))


@jax.jit
def v_scatter(state, key):
    a, logp, value = polpart(state, key)
    a_full = (
        jnp.zeros((W, C.MAX_AGENTS), a.dtype)
        .at[jnp.arange(W)[:, None], cidx]
        .set(a)
    )
    act = jnp.zeros((W, C.MAX_AGENTS, C.ACTION_DIM), jnp.float32).at[
        ..., :3
    ].set(env.action_keys[a_full])
    s = stepmod.step(scene, state, act, params)
    return logp[0, 0] + value[0, 0] + s.pos[0, 0, 0]


timeit("v_scatter", lambda k: v_scatter(fresh, k))


@jax.jit
def v_gather(state, key):
    a, logp, value = polpart(state, key)
    a_pad = jnp.pad(a, ((0, 0), (0, C.MAX_AGENTS - CC)))  # ranks >= CC -> 0
    r = jnp.minimum(rank, C.MAX_AGENTS - 1)
    a_full = jnp.where(
        rank < CC, jnp.take_along_axis(a_pad, jnp.minimum(rank, CC), axis=1), 0
    )
    act = jnp.zeros((W, C.MAX_AGENTS, C.ACTION_DIM), jnp.float32).at[
        ..., :3
    ].set(env.action_keys[a_full])
    s = stepmod.step(scene, state, act, params)
    return logp[0, 0] + value[0, 0] + s.pos[0, 0, 0]


timeit("v_gather", lambda k: v_gather(fresh, k))
