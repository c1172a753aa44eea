"""Decompose flat_observation at the peak flat config with PROPER result
consumption (the earlier step+obs probe consumed obs[0,0], letting XLA
dead-code-eliminate the obs work — classic elision trap, CLAUDE.md).
Times 32 chained copies of each candidate sub-computation."""

import argparse
import time

import jax
import jax.numpy as jnp

import gpudrive_lab_tpu

gpudrive_lab_tpu.enable_compile_cache()

from gpudrive_lab_tpu import constants as C
from gpudrive_lab_tpu.core import observations as obsmod
from gpudrive_lab_tpu.core import step as stepmod
from gpudrive_lab_tpu.env.config import EnvConfig
from gpudrive_lab_tpu.env.dataset import SceneDataLoader
from gpudrive_lab_tpu.env.env_jax import GPUDriveTPUEnv, flat_observation

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
R = scene.roads.pos.shape[1]
print(f"A={A} R={R} algo={params.road_obs_algorithm}", flush=True)
fresh = jax.jit(stepmod.reset, static_argnames="params")(scene, None, params)

ctrl = scene.agents.controlled.reshape(-1)
order = jnp.argsort(jnp.where(ctrl, 0, 1), stable=True)[:N]
cidx = (order // A, order % A)


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


def chain(fn):
    @jax.jit
    def run(state, key):
        acc = jnp.float32(0)
        for i in range(T):
            key, k = jax.random.split(key)
            st = state.replace(
                pos=state.pos
                + jax.random.uniform(k, (), minval=0, maxval=1e-6)
            )
            acc = acc + fn(st)
        return acc
    return run


def obs_full(st):
    obs, _, _ = flat_observation(scene, st, params, spec, weights, cidx)
    return obs.sum()


def partner_only(st):
    p, _ = obsmod.partner_observations(scene, st, params, cidx,
                                       with_static=True)
    return p.sum()


def road_only(st):
    mo = obsmod.agent_map_observations(scene, st, params, cidx)
    return mo.sum()


def ego_only(st):
    return obsmod.self_observation(scene, st, cidx).sum()


def keys_only(st):
    ego_pos = st.pos[cidx[0], cidx[1]]
    road_pos = scene.roads.pos[cidx[0], :, 0:2]
    road_valid = scene.roads.valid[cidx[0]]
    delta = road_pos - ego_pos[..., None, :]
    d2 = jnp.sum(delta * delta, axis=-1)
    within = road_valid & (d2 <= params.observation_radius**2)
    key = jnp.where(within, jnp.arange(R, dtype=jnp.int32), R)
    return key.sum().astype(jnp.float32)


def keys_topk(st):
    ego_pos = st.pos[cidx[0], cidx[1]]
    road_pos = scene.roads.pos[cidx[0], :, 0:2]
    road_valid = scene.roads.valid[cidx[0]]
    delta = road_pos - ego_pos[..., None, :]
    d2 = jnp.sum(delta * delta, axis=-1)
    within = road_valid & (d2 <= params.observation_radius**2)
    key = jnp.where(within, jnp.arange(R, dtype=jnp.int32), R)
    neg, _ = jax.lax.top_k(-key, C.MAX_AGENT_MAP_OBS)
    return neg.sum().astype(jnp.float32)


timeit("obs_full", chain(obs_full))
timeit("ego_only", chain(ego_only))
timeit("partner_only", chain(partner_only))
timeit("road_only", chain(road_only))
timeit("keys_only", chain(keys_only))
timeit("keys+topk", chain(keys_topk))
