"""Gather-formulation shootout for the two obs hot spots (road winners
gather ~5.3 ms/step, partner all-but-self gather ~5.0 ms/step at the peak
config).  Variants:

road:  G1 current 2-D advanced gather [w_idx, idx] of [W,R,10]
       G2 flat 1-D row gather (reshape W*R)
       G3 G2 with jax.lax.gather indices_are_sorted
       G4 bf16 table (half the slice bytes; probe only)
partner: P1 current element gather x[w_idx, src_f]
         P2 block gather packed[w_idx] + static-slice all-but-self select
            (slot k = agent k + (k>=i)  ==  where(k < a_idx, full[:, :A-1],
             full[:, 1:]) — NO per-element gather at all)
"""

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
print(f"A={A} R={R} K={K}", flush=True)
fresh = jax.jit(stepmod.reset, static_argnames="params")(scene, None, params)

ctrl = scene.agents.controlled.reshape(-1)
order = jnp.argsort(jnp.where(ctrl, 0, 1), stable=True)[:N]
w_idx, a_idx = order // A, order % A

packed = obsmod._packed_road_columns(scene.roads)  # [W, R, 10]
packed_flat = packed.reshape(W * R, 10)
packed_bf16 = packed.astype(jnp.bfloat16)


def timeit(name, fn):
    t0 = time.time()
    jax.block_until_ready(fn(fresh, jax.random.PRNGKey(0)))
    comp = time.time() - t0
    best = 1e9
    for r in range(3):
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
                pos=state.pos + jax.random.uniform(k, (), minval=0, maxval=1e-6)
            )
            acc = acc + fn(st)
        return acc
    return run


def winners(st):
    """[N, K] sorted winner indices (LINEAR branch selection)."""
    ego_pos = st.pos[w_idx, a_idx]
    road_pos = scene.roads.pos[w_idx, :, 0:2]
    road_valid = scene.roads.valid[w_idx]
    delta = road_pos - ego_pos[..., None, :]
    d2 = jnp.sum(delta * delta, axis=-1)
    within = road_valid & (d2 <= params.observation_radius**2)
    key = jnp.where(within, jnp.arange(R, dtype=jnp.int32), R)
    neg, _ = jax.lax.top_k(-key, K)
    idx = -neg
    return jnp.where(idx < R, idx, 0)


def g1(st):
    idx = winners(st)
    sel = packed[w_idx[:, None], idx]
    return sel.sum()


def g2(st):
    idx = winners(st)
    flat = w_idx[:, None] * R + idx
    sel = packed_flat[flat]
    return sel.sum()


def g3(st):
    idx = winners(st)
    flat = (w_idx[:, None] * R + idx).astype(jnp.int32)
    sel = jax.lax.gather(
        packed_flat, flat[..., None],
        jax.lax.GatherDimensionNumbers(
            offset_dims=(2,), collapsed_slice_dims=(0,),
            start_index_map=(0,),
        ),
        slice_sizes=(1, 10),
        indices_are_sorted=False, unique_indices=False,
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )
    return sel.sum()


def g3s(st):
    idx = winners(st)
    flat = (w_idx[:, None] * R + idx).astype(jnp.int32)
    sel = jax.lax.gather(
        packed_flat, flat[..., None],
        jax.lax.GatherDimensionNumbers(
            offset_dims=(2,), collapsed_slice_dims=(0,),
            start_index_map=(0,),
        ),
        slice_sizes=(1, 10),
        indices_are_sorted=True, unique_indices=False,
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )
    return sel.sum()


def g4(st):
    idx = winners(st)
    sel = packed_bf16[w_idx[:, None], idx]
    return sel.astype(jnp.float32).sum()


# partner variants --------------------------------------------------------
cols = None


def _packed_agents(st):
    return jnp.concatenate(
        [
            st.pos,                                            # 0:2
            st.speed[..., None],                               # 2
            st.yaw[..., None],                                 # 3
            scene.agents.size,                                 # 4:7
            scene.agents.etype.astype(jnp.float32)[..., None], # 7
            scene.agents.aid.astype(jnp.float32)[..., None],   # 8
        ],
        axis=-1,
    )


def p1(st):
    pk = _packed_agents(st)  # [W, A, 9]
    k = jnp.arange(A - 1)
    src_f = k[None, :] + (k[None, :] >= a_idx[:, None])
    sel = pk[w_idx[:, None], src_f]  # [N, A-1, 9]
    return sel.sum()


def p2(st):
    pk = _packed_agents(st)       # [W, A, 9]
    full = pk[w_idx]              # [N, A, 9] block gather
    k = jnp.arange(A - 1)
    keep_low = (k[None, :] < a_idx[:, None])[..., None]
    sel = jnp.where(keep_low, full[:, : A - 1], full[:, 1:])
    return sel.sum()


timeit("road g1 current", chain(g1))
timeit("road g2 flat", chain(g2))
timeit("road g3 lax", chain(g3))
timeit("road g3 sorted", chain(g3s))
timeit("road g4 bf16", chain(g4))
timeit("partner p1 cur", chain(p1))
timeit("partner p2 slice", chain(p2))
