"""Find the pathological fusion in agent_map_observations by barrier insertion.

probe_knn_increment: an approximate rebuild of the body with extra
intermediate consumers runs at 91 ms, the exact function at 449 ms — the
extra consumers likely break a bad fusion.  Start from the EXACT body and
insert lax.optimization_barrier at one producer boundary at a time; the
barrier that collapses the time names the fusion.

  e0       exact inline body                      (expect ~450)
  e_score  barrier after score
  e_idx    barrier after top_k idx
  e_gath   barrier after each gather output
  e_sel    barrier after the concat sel
  e_keep   barrier after sel_d2/keep
  e_nopad  exact minus the final ego_valid where
  e_all    barriers everywhere

Usage: timeout 3000 python scripts/probe_knn_barriers.py
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
BAR = jax.lax.optimization_barrier


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
    print(f"{name:10s} {best*1000:10.1f} ms", flush=True)


def body(s, k, b_score=False, b_idx=False, b_gath=False, b_sel=False,
         b_keep=False, pad=True):
    s = s.replace(pos=s.pos + jax.random.uniform(k) * 1e-6)
    ego_pos = obsmod._ego_take(s.pos, cidx)
    ego_yaw = obsmod._ego_take(s.yaw, cidx)
    ego_valid = obsmod._ego_take(scene.agents.valid, cidx)
    delta = roads.pos[:, None, :, 0:2] - ego_pos[:, :, None, :]
    d2 = jnp.sum(delta * delta, axis=-1)
    score = jnp.where(road_valid, d2, jnp.inf)
    if b_score:
        score = BAR(score)
    _, idx = jax.lax.top_k(-score, K)
    if b_idx:
        idx = BAR(idx)

    def take(x):
        out = jax.vmap(lambda xw, iw: xw[iw])(x, idx)
        return BAR(out) if b_gath else out

    sel_pos = take(roads.pos[..., 0:2])
    rel_ego = rotate_into_frame(
        sel_pos - ego_pos[:, :, None, :], ego_yaw[:, :, None]
    )
    heading = quat_yaw_diff(ego_yaw[:, :, None], take(roads.yaw))
    sel = jnp.concatenate(
        [
            rel_ego,
            take(roads.scale),
            heading[..., None],
            take(roads.etype).astype(jnp.float32)[..., None],
            take(roads.rid).astype(jnp.float32)[..., None],
            take(roads.map_type).astype(jnp.float32)[..., None],
        ],
        axis=-1,
    )
    if b_sel:
        sel = BAR(sel)
    sel_d2 = jnp.take_along_axis(score, idx, axis=2)
    keep = sel_d2 <= params.observation_radius**2
    if b_keep:
        keep = BAR(keep)
    out = jnp.where(keep[..., None], sel, 0.0)
    if not pad:
        return out.sum()
    pad_filler = jnp.zeros(9, jnp.float32).at[7].set(-1.0).at[8].set(-1.0)
    return jnp.where(ego_valid[:, :, None, None], out, pad_filler).sum()


cases = [
    ("e0", {}),
    ("e_score", dict(b_score=True)),
    ("e_idx", dict(b_idx=True)),
    ("e_gath", dict(b_gath=True)),
    ("e_sel", dict(b_sel=True)),
    ("e_keep", dict(b_keep=True)),
    ("e_nopad", dict(pad=False)),
    ("e_all", dict(b_score=True, b_idx=True, b_gath=True, b_sel=True,
                   b_keep=True)),
]
for name, kw in cases:
    f = jax.jit(lambda s, k, kw=kw: body(s, k, **kw))
    timeit(name, lambda k, f=f: f(fresh, k))
