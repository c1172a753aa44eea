"""Build agent_map_observations up incrementally to find the superadditive op.

probe_knn_bisect: score 32, +topk 46, gathers 87, tad 54 — but full 456 ms.
Add the remaining ops one at a time:
  i0  gathers + tad + radius-keep where           (no trig)
  i1  i0 + rotate_into_frame on sel_pos
  i2  i1 + quat_yaw_diff heading                  (= full concat inputs)
  i3  i2 + concat to [W,C,K,9] + KNN zero fill    (= full minus ego_valid pad)
  i4  full agent_map_observations                 (control)

Usage: timeout 3000 python scripts/probe_knn_increment.py
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


def takes(x, idx):
    return jax.vmap(lambda xw, iw: xw[iw])(x, idx)


def stage(s, k, level):
    s = s.replace(pos=s.pos + jax.random.uniform(k) * 1e-6)
    ego_pos = obsmod._ego_take(s.pos, cidx)
    ego_yaw = obsmod._ego_take(s.yaw, cidx)
    delta = roads.pos[:, None, :, 0:2] - ego_pos[:, :, None, :]
    d2 = jnp.sum(delta * delta, axis=-1)
    score = jnp.where(road_valid, d2, jnp.inf)
    _, idx = jax.lax.top_k(-score, K)
    sel_pos = takes(roads.pos[..., 0:2], idx)
    parts = [
        sel_pos,
        takes(roads.scale, idx),
        takes(roads.etype, idx).astype(jnp.float32)[..., None],
        takes(roads.rid, idx).astype(jnp.float32)[..., None],
        takes(roads.map_type, idx).astype(jnp.float32)[..., None],
    ]
    sel_d2 = jnp.take_along_axis(score, idx, axis=2)
    keep = sel_d2 <= params.observation_radius**2
    acc = sum(p.sum() for p in parts) + jnp.sum(keep)
    if level == 0:
        return acc
    rel_ego = rotate_into_frame(
        sel_pos - ego_pos[:, :, None, :], ego_yaw[:, :, None]
    )
    acc = acc + rel_ego.sum()
    if level == 1:
        return acc
    heading = quat_yaw_diff(ego_yaw[:, :, None], takes(roads.yaw, idx))
    acc = acc + heading.sum()
    if level == 2:
        return acc
    sel = jnp.concatenate(
        [rel_ego] + parts[1:2] + [heading[..., None]] + parts[2:], axis=-1
    )
    out = jnp.where(keep[..., None], sel, 0.0)
    return out.sum()


for lvl in (0, 1, 2, 3):
    f = jax.jit(lambda s, k, lvl=lvl: stage(s, k, lvl))
    timeit(f"i{lvl}", lambda k, f=f: f(fresh, k))


def full(s, k):
    s = s.replace(pos=s.pos + jax.random.uniform(k) * 1e-6)
    return obsmod.agent_map_observations(scene, s, params, cidx).sum()


f4 = jax.jit(full)
timeit("i4_full", lambda k: f4(fresh, k))
