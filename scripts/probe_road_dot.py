"""Road-obs decomposition + MXU-gather shootout at the peak train config.

The round-4 obs fast path left the road observation at ~6.4 ms/step
(selection + gather) out of a ~12 ms rollout body — the largest remaining
term.  This probe (a) decomposes that cost (d2 lattice / top_k selection /
winner gather / featurize) and (b) races the TPU-classic alternative for
each part:

  sel_d2        [N, R] distance lattice only
  sel_topk      d2 + exact top_k over index keys (LINEAR selection)
  sel_approx    d2 + approx_max_k selection (recall 0.99; parity-breaking,
                bound only)
  gather_g2     flat row gather of K winners (current production), static idx
  gather_dot32  one-hot matmul gather (HIGHEST precision - exact f32),
                static idx
  gather_dotbf  one-hot matmul gather in bf16 (bound only)
  full_g2       current full LINEAR road obs
  full_rankdot  LINEAR without top_k: within -> cumsum rank -> one-hot dot
                (placement and gather fused into ONE matmul)

Exactness: gather_dot32 and full_rankdot are checked elementwise against the
production path before timing.
"""

import time

import jax
import jax.numpy as jnp

import gpudrive_lab_tpu

gpudrive_lab_tpu.enable_compile_cache()

from gpudrive_lab_tpu import constants as C
from gpudrive_lab_tpu.core import observations as obsmod
from gpudrive_lab_tpu.core import step as stepmod
from gpudrive_lab_tpu.core.geometry import quat_yaw_diff, rotate_into_frame
from gpudrive_lab_tpu.env.config import EnvConfig
from gpudrive_lab_tpu.env.dataset import SceneDataLoader
from gpudrive_lab_tpu.env.env_jax import GPUDriveTPUEnv

W, N, T = 256, 4096, 32

loader = SceneDataLoader(
    root="/root/reference/data/processed/examples", batch_size=W,
    dataset_size=1000, sample_with_replacement=True, seed=0,
)
cfg = EnvConfig(
    num_worlds=W, reward_type="weighted_combination",
    collision_weight=-0.75, off_road_weight=-0.75,
    goal_achieved_weight=1.0, dynamics_model="classic",
    collision_behavior="ignore", agent_bucket="auto",
)
env = GPUDriveTPUEnv(cfg, data_loader=loader)
scene, params = env.scene, env.params
A = scene.agents.valid.shape[1]
R = scene.roads.pos.shape[1]
K = C.MAX_AGENT_MAP_OBS
print(f"A={A} R={R} K={K} radius={params.observation_radius}", flush=True)
fresh = jax.jit(stepmod.reset, static_argnames="params")(scene, None, params)

ctrl = scene.agents.controlled.reshape(-1)
order = jnp.argsort(jnp.where(ctrl, 0, 1), stable=True)[:N]
w_idx, a_idx = order // A, order % A

packed = obsmod._packed_road_columns(scene.roads)  # [W, R, 10]
packed_flat = packed.reshape(W * R, 10)
road_valid_n = scene.roads.valid[w_idx]            # [N, R]
road_pos_n = scene.roads.pos[w_idx, :, 0:2]        # [N, R, 2]  (static)


def timeit(name, fn):
    t0 = time.time()
    jax.block_until_ready(fn(fresh, jax.random.PRNGKey(0)))
    comp = time.time() - t0
    best = 1e9
    for r in range(3):
        t0 = time.time()
        jax.block_until_ready(fn(fresh, jax.random.PRNGKey(r + 1)))
        best = min(best, time.time() - t0)
    print(f"{name:16s} {best*1000:9.1f} ms total  {best*1000/T:7.2f} ms/step"
          f"  (compile {comp:.0f}s)", flush=True)


def chain(fn):
    @jax.jit
    def run(state, key):
        acc = jnp.float32(0)
        for i in range(T):
            key, k = jax.random.split(key)
            st = state.replace(
                pos=state.pos + jax.random.uniform(k, (), minval=0, maxval=1e-6)
            )
            acc = acc + fn(st)
        return acc
    return run


def d2_of(st):
    ego_pos = st.pos[w_idx, a_idx]
    delta = road_pos_n - ego_pos[..., None, :]
    return jnp.sum(delta * delta, axis=-1)  # [N, R]


def winners(st):
    d2 = d2_of(st)
    within = road_valid_n & (d2 <= params.observation_radius**2)
    key = jnp.where(within, jnp.arange(R, dtype=jnp.int32), R)
    neg, _ = jax.lax.top_k(-key, K)
    idx = -neg
    return jnp.where(idx < R, idx, 0)


def sel_d2(st):
    return d2_of(st).sum()


def sel_topk(st):
    return winners(st).sum()


def sel_approx(st):
    d2 = d2_of(st)
    within = road_valid_n & (d2 <= params.observation_radius**2)
    key = jnp.where(within, jnp.arange(R, dtype=jnp.int32), R)
    _, idx = jax.lax.approx_max_k(-key.astype(jnp.float32), K,
                                  recall_target=0.99)
    return idx.sum()


# static winner set (computed once) + per-step jitter so CSE cannot hoist
base_idx = jax.jit(winners)(fresh)


def _jitter_idx(st):
    return base_idx + (st.pos.sum() * 0).astype(jnp.int32)


def gather_g2(st):
    idx = _jitter_idx(st)
    sel = packed_flat[w_idx[:, None] * R + idx]
    return sel.sum()


def _dot_gather(idx, dtype, precision):
    # one-hot [N, K, R] built from an iota compare: XLA fuses the compare
    # into the dot operand (VMEM tiles only), so nothing K*R-wide hits HBM.
    oh = (idx[..., None] == jnp.arange(R, dtype=jnp.int32)).astype(dtype)
    pw = packed[w_idx].astype(dtype)  # [N, R, 10] block row gather
    return jax.lax.dot_general(
        oh, pw, (((2,), (1,)), ((0,), (0,))), precision=precision,
        preferred_element_type=jnp.float32,
    )  # [N, K, 10]


def gather_dot32(st):
    return _dot_gather(_jitter_idx(st), jnp.float32,
                       jax.lax.Precision.HIGHEST).sum()


def gather_dotbf(st):
    return _dot_gather(_jitter_idx(st), jnp.bfloat16,
                       jax.lax.Precision.DEFAULT).sum()


def _featurize(sel_p, st):
    ego_pos = st.pos[w_idx, a_idx]
    ego_yaw = st.yaw[w_idx, a_idx]
    rel = sel_p[..., 0:2] - ego_pos[..., None, :]
    rel_ego = rotate_into_frame(rel, ego_yaw[..., None])
    heading = quat_yaw_diff(ego_yaw[..., None], sel_p[..., 5])
    return jnp.concatenate(
        [rel_ego, sel_p[..., 2:5], heading[..., None], sel_p[..., 6:9]],
        axis=-1,
    )


def full_g2(st):
    idx = winners(st)
    sel_p = packed_flat[w_idx[:, None] * R + idx]
    d2 = d2_of(st)
    within = road_valid_n & (d2 <= params.observation_radius**2)
    nwithin = within.sum(axis=-1)
    filled = jnp.arange(K) < nwithin[:, None]
    out = jnp.where(filled[..., None], _featurize(sel_p, st), 0.0)
    return out.sum()


def full_rankdot(st):
    d2 = d2_of(st)
    within = road_valid_n & (d2 <= params.observation_radius**2)
    rank = jnp.cumsum(within.astype(jnp.int32), axis=-1)  # inclusive
    # one-hot[n, k, r] = within & rank == k+1 : winner k IS road r.
    oh = (
        within[:, None, :]
        & (rank[:, None, :] == (jnp.arange(K, dtype=jnp.int32) + 1)[None, :, None])
    ).astype(jnp.float32)
    pw = packed[w_idx]  # [N, R, 10]
    sel_p = jax.lax.dot_general(
        oh, pw, (((2,), (1,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    nwithin = rank[:, -1]
    filled = jnp.arange(K) < nwithin[:, None]
    out = jnp.where(filled[..., None], _featurize(sel_p, st), 0.0)
    return out.sum()


# ---- exactness ----------------------------------------------------------
st0 = fresh
g_ref = jax.jit(lambda s: packed_flat[w_idx[:, None] * R + winners(s)])(st0)
g_dot = jax.jit(lambda s: _dot_gather(winners(s), jnp.float32,
                                      jax.lax.Precision.HIGHEST))(st0)
print("dot32 exact:", bool(jnp.all(g_ref == g_dot)),
      " maxerr:", float(jnp.max(jnp.abs(g_ref - g_dot))), flush=True)


def _full_ref(s):
    idx = winners(s)
    sel_p = packed_flat[w_idx[:, None] * R + idx]
    d2 = d2_of(s)
    within = road_valid_n & (d2 <= params.observation_radius**2)
    filled = jnp.arange(K) < within.sum(axis=-1)[:, None]
    return jnp.where(filled[..., None], _featurize(sel_p, s), 0.0)


def _full_rd(s):
    d2 = d2_of(s)
    within = road_valid_n & (d2 <= params.observation_radius**2)
    rank = jnp.cumsum(within.astype(jnp.int32), axis=-1)
    oh = (
        within[:, None, :]
        & (rank[:, None, :] == (jnp.arange(K, dtype=jnp.int32) + 1)[None, :, None])
    ).astype(jnp.float32)
    sel_p = jax.lax.dot_general(
        oh, packed[w_idx], (((2,), (1,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    filled = jnp.arange(K) < rank[:, -1][:, None]
    return jnp.where(filled[..., None], _featurize(sel_p, s), 0.0)


f_ref = jax.jit(_full_ref)(st0)
f_rd = jax.jit(_full_rd)(st0)
print("rankdot exact:", bool(jnp.all(f_ref == f_rd)),
      " maxerr:", float(jnp.max(jnp.abs(f_ref - f_rd))), flush=True)

timeit("sel_d2", chain(sel_d2))
timeit("sel_topk", chain(sel_topk))
timeit("sel_approx", chain(sel_approx))
timeit("gather_g2", chain(gather_g2))
timeit("gather_dot32", chain(gather_dot32))
timeit("gather_dotbf", chain(gather_dotbf))
timeit("full_g2", chain(full_g2))
timeit("full_rankdot", chain(full_rankdot))
