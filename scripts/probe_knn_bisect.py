"""Bisect KNEAREST agent_map_observations: the 445 ms is NOT the top_k
(30 ms on random data) and NOT the [W,C,R] lattice (roadfeat 28 ms).

Variants (each ONE warm jit, varied key, consumed scalar):
  k_score     d2 + where(valid, d2, inf), consume score.sum()
  k_topk      score -> top_k(200), consume idx.sum()
  k_topk_ni   d2 WITHOUT the inf-where -> top_k, consume idx.sum()
  k_gather1   top_k -> ONE take (roads.pos), consume
  k_gatherall top_k -> all six takes + concat, consume
  k_tad       top_k -> take_along_axis(score, idx), consume
  k_full      full agent_map_observations (control, expect ~445)

Usage: timeout 3000 python scripts/probe_knn_bisect.py
"""

import time

import jax
import jax.numpy as jnp

import gpudrive_lab_tpu

gpudrive_lab_tpu.enable_compile_cache()

from gpudrive_lab_tpu.env.config import EnvConfig
from gpudrive_lab_tpu.env.dataset import SceneDataLoader
from gpudrive_lab_tpu.env.env_jax import GPUDriveTPUEnv
from gpudrive_lab_tpu.ppo.train import build_trainer
from gpudrive_lab_tpu.ppo.ppo import PPOConfig
from gpudrive_lab_tpu.core import observations as obsmod
from gpudrive_lab_tpu.core.geometry import rotate_into_frame, quat_yaw_diff
from gpudrive_lab_tpu import constants as C

W = 64
CC = 64
K = C.MAX_AGENT_MAP_OBS
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
_, _, _, _, fresh, _ = build_trainer(
    env, PPOConfig(rollout_len=4, compact=CC, unroll=True),
    seed=0, rollout_mode="unroll",
)
scene, params = env.scene, env.params
roads = scene.roads
cidx = jnp.argsort(
    jnp.where(scene.agents.controlled, 0, 1), axis=1, stable=True
)[:, :CC]
road_valid = roads.valid[:, None, :]


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


def score_of(state, key):
    state = state.replace(pos=state.pos + jax.random.uniform(key) * 1e-6)
    ego_pos = obsmod._ego_take(state.pos, cidx)
    delta = roads.pos[:, None, :, 0:2] - ego_pos[:, :, None, :]
    d2 = jnp.sum(delta * delta, axis=-1)
    return jnp.where(road_valid, d2, jnp.inf), d2


def run(name, make):
    f = jax.jit(make)
    timeit(name, lambda k: f(fresh, k))


run("k_score", lambda s, k: score_of(s, k)[0].sum())
run("k_topk", lambda s, k: jax.lax.top_k(-score_of(s, k)[0], K)[1].sum())
run("k_topk_ni", lambda s, k: jax.lax.top_k(-score_of(s, k)[1], K)[1].sum())


def takes(x, idx):
    return jax.vmap(lambda xw, iw: xw[iw])(x, idx)


def g1(s, k):
    score, _ = score_of(s, k)
    _, idx = jax.lax.top_k(-score, K)
    return takes(roads.pos[..., 0:2], idx).sum()


run("k_gather1", g1)


def gall(s, k):
    score, _ = score_of(s, k)
    _, idx = jax.lax.top_k(-score, K)
    sel = jnp.concatenate(
        [
            takes(roads.pos[..., 0:2], idx),
            takes(roads.scale, idx),
            takes(roads.yaw, idx)[..., None],
            takes(roads.etype, idx).astype(jnp.float32)[..., None],
            takes(roads.rid, idx).astype(jnp.float32)[..., None],
            takes(roads.map_type, idx).astype(jnp.float32)[..., None],
        ],
        axis=-1,
    )
    return sel.sum()


run("k_gatherall", gall)


def tad(s, k):
    score, _ = score_of(s, k)
    _, idx = jax.lax.top_k(-score, K)
    return jnp.take_along_axis(score, idx, axis=2).sum()


run("k_tad", tad)


def full(s, k):
    s = s.replace(pos=s.pos + jax.random.uniform(k) * 1e-6)
    return obsmod.agent_map_observations(scene, s, params, cidx).sum()


run("k_full", full)
