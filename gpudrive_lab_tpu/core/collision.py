"""Collision detection.

Replaces the reference's broadphase BVH + narrow-phase OBB taskgraph nodes
(reference: src/sim.cpp:628-747 plus madrona's broadphase) with masked,
fully-vectorized all-pairs tests using a closed-form separating-axis test
(core/obb.py obb_overlap_sat — dense regular element-wise math that XLA maps
straight onto the VPU; cheaper on TPU than building candidate lists):

  * agent-agent: [W, A, A] lattice (A=128).
  * agent-road:  [W, A, R] lattice.  ``Params.collision_top_k`` optionally
    prunes to the top-K candidate segments per agent ranked by
    (center distance - segment half length), a conservative bound on box
    distance — only worth it for very large R buckets.

Pure-functional reductions (ORs over pair axes) replace the reference's
atomic writes (types.hpp:384-387) — no races by construction.

Skip rules replicate isInvalidExpertOrDone (src/sim.cpp:631-666): uncontrolled
agents in invalid log states and done-but-not-collided controlled agents are
transparent to collision.  The collision-pair whitelist (src/sim.hpp:88-102)
reduces to: vehicles collide only with RoadEdge/StopSign among road types;
pedestrians/cyclists only with StopSign; agent-agent pairs always collide.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gpudrive_lab_tpu import constants as C
from gpudrive_lab_tpu.core import obb
from gpudrive_lab_tpu.core.types import Params, Scene, SimState


def agent_half_extents(scene: Scene) -> jnp.ndarray:
    """Collision box half extents: (len/2, wid/2) * 0.7
    (reference: src/level_gen.cpp:140-141)."""
    return scene.agents.size[..., 0:2] * (0.5 * C.VEHICLE_LENGTH_SCALE)


def _skip_mask(scene: Scene, state: SimState, cur_step: jnp.ndarray) -> jnp.ndarray:
    """Agents invisible to collision detection (src/sim.cpp:631-666).
    Also masks out padded (never-created) agents."""
    traj_valid_now = jnp.take_along_axis(
        scene.agents.traj_valid, cur_step[..., None], axis=-1
    )[..., 0]
    uncontrolled_invalid = (~scene.agents.controlled) & (traj_valid_now == 0)
    done_not_collided = (
        scene.agents.controlled & (state.done != 0) & (state.collided == 0)
    )
    return (~scene.agents.valid) | uncontrolled_invalid | done_not_collided


def _road_allowed(agent_etype: jnp.ndarray, road_etype: jnp.ndarray) -> jnp.ndarray:
    """Complement of the collision-pair whitelist for agent-road pairs
    (reference: src/sim.hpp:88-102)."""
    is_vehicle = agent_etype == C.ET_VEHICLE
    veh_ok = (road_etype == C.ET_ROAD_EDGE) | (road_etype == C.ET_STOP_SIGN)
    other_ok = road_etype == C.ET_STOP_SIGN
    return jnp.where(is_vehicle, veh_ok, other_ok)


def _tiled_road_hits(
    scene: Scene, state: SimState, active: jnp.ndarray, half: jnp.ndarray
) -> jnp.ndarray:
    """Agent-road any-hit via the tile-skip Pallas kernel
    (core/pallas_kernels.agent_road_hits_tiled; tiles from scene/rtiles.py).

    Agents are Morton-sorted each step so that blocks of AGENT_BLOCK
    consecutive agents are spatially compact (and dead/padded agents, keyed
    to +inf, collapse into blocks that skip every tile).  The per-
    [agent-block, road-tile] reachability mask is a conservative AABB
    distance bound — exact vs the dense SAT, verified in
    tests/test_tile_collision.py.  Returns bool [W, A] in original order."""
    from gpudrive_lab_tpu.core.pallas_kernels import (
        AGENT_BLOCK,
        agent_road_hits_tiled,
    )

    rt = scene.rtiles
    W, A = active.shape
    is_veh = scene.agents.etype == C.ET_VEHICLE

    feat = jnp.concatenate(
        [
            state.pos,
            jnp.cos(state.yaw)[..., None],
            jnp.sin(state.yaw)[..., None],
            half,
            active.astype(jnp.float32)[..., None],
            is_veh.astype(jnp.float32)[..., None],
        ],
        axis=-1,
    )  # [W, A, 8]

    from gpudrive_lab_tpu.scene.rtiles import MORTON_CELLS, morton_interleave

    q = jnp.clip(
        (state.pos - rt.world_min[:, None]) * rt.world_inv_ext[:, None]
        * MORTON_CELLS,
        0.0,
        MORTON_CELLS - 1.0,
    ).astype(jnp.int32)
    key = morton_interleave(q[..., 0]) | (morton_interleave(q[..., 1]) << 1)
    key = jnp.where(active, key, jnp.int32(1) << 30)
    perm = jnp.argsort(key, axis=1)  # [W, A]
    inv_perm = jnp.argsort(perm, axis=1)
    feat_s = jnp.take_along_axis(feat, perm[..., None], axis=1)

    # conservative block-tile reachability: distance from agent center to
    # tile AABB vs tile reach + agent half-diagonal
    pos_s = feat_s[..., 0:2]
    reach_a = jnp.hypot(feat_s[..., 4], feat_s[..., 5])
    active_s = feat_s[..., 6] > 0.5
    b = rt.bounds  # [W, T, 6]
    x = pos_s[..., 0:1]  # [W, A, 1]
    y = pos_s[..., 1:2]
    dx = jnp.maximum(jnp.maximum(b[:, None, :, 0] - x, x - b[:, None, :, 2]), 0.0)
    dy = jnp.maximum(jnp.maximum(b[:, None, :, 1] - y, y - b[:, None, :, 3]), 0.0)
    limit = b[:, None, :, 4] + reach_a[..., None]
    near = (dx * dx + dy * dy <= limit * limit) & (b[:, None, :, 5] > 0.5)
    near = near & active_s[..., None]
    T = b.shape[1]
    mask = jnp.any(
        near.reshape(W, A // AGENT_BLOCK, AGENT_BLOCK, T), axis=2
    ).astype(jnp.int32)

    hits_s = agent_road_hits_tiled(feat_s, rt.feat, mask)
    return jnp.take_along_axis(hits_s, inv_perm, axis=1) > 0.5


def collision_system(
    scene: Scene, state: SimState, params: Params, cur_step: jnp.ndarray
) -> SimState:
    """One collision pass; returns state with collided/info flags OR-ed in.

    ``cur_step`` is the pre-decrement trajectory index [W, A] (the same one
    movement used this step, src/sim.cpp:23-25,640).
    """
    agents = scene.agents
    skip = _skip_mask(scene, state, cur_step)  # [W, A]
    active = ~skip

    half = agent_half_extents(scene)  # [W, A, 2]

    # ---- agent vs agent -------------------------------------------------
    hit_aa = obb.obb_overlap_sat(
        state.pos[:, :, None, :], state.yaw[:, :, None], half[:, :, None],
        state.pos[:, None, :, :], state.yaw[:, None, :], half[:, None, :],
    )  # [W, A, A]
    eye = jnp.eye(hit_aa.shape[-1], dtype=bool)
    pair_ok = active[:, :, None] & active[:, None, :] & ~eye
    hit_aa = hit_aa & pair_ok

    other_t = agents.etype[:, None, :]  # [W, 1, A] broadcast over ego axis
    hit_veh = jnp.any(hit_aa & (other_t == C.ET_VEHICLE), axis=-1)
    # Info attribution chain (src/sim.cpp:713-724): not road, not vehicle,
    # type <= Cyclist => collidedWithNonVehicle.
    hit_nonveh = jnp.any(
        hit_aa & (other_t != C.ET_VEHICLE) & (other_t <= C.ET_CYCLIST), axis=-1
    )
    any_aa = jnp.any(hit_aa, axis=-1)

    # ---- agent vs road --------------------------------------------------
    roads = scene.roads
    road_half = roads.scale[..., 0:2]  # [W, R, 2]

    allowed = _road_allowed(agents.etype[:, :, None], roads.etype[:, None, :])
    pair_ok_ar = active[:, :, None] & roads.valid[:, None, :] & allowed

    use_tiles = (
        scene.rtiles is not None
        and params.use_tile_collision is not False
        and not (params.use_collision_grid and scene.grid is not None)
        and params.collision_top_k is None
    )
    if use_tiles:
        hit_ar = _tiled_road_hits(scene, state, active, half)[..., None]
    elif params.use_collision_grid and scene.grid is not None:
        # Scene-static spatial hash: each agent tests only the road entities
        # registered in its grid cell (candidate count independent of R; the
        # grid builder guarantees no cell overflow — scene/grid.py).
        g = scene.grid
        cell = jnp.floor(
            (state.pos - g.origin[:, None, :]) / g.cell_size[:, None, None]
        ).astype(jnp.int32)
        cx = jnp.clip(cell[..., 0], 0, g.dims[:, None, 0] - 1)
        cy = jnp.clip(cell[..., 1], 0, g.dims[:, None, 1] - 1)
        cand = jax.vmap(lambda tw, yw, xw: tw[yw, xw])(
            g.table, cy, cx
        )  # [W, A, K]
        safe = jnp.maximum(cand, 0)
        gather = jax.vmap(lambda xw, cw: xw[cw])
        r_ok = (
            (cand >= 0)
            & jnp.take_along_axis(pair_ok_ar, safe, axis=2)
        )
        hit_ar = obb.obb_overlap_sat(
            state.pos[:, :, None, :], state.yaw[:, :, None], half[:, :, None],
            gather(roads.pos[..., 0:2], safe),
            gather(roads.yaw, safe),
            gather(road_half, safe),
        ) & r_ok
    elif params.collision_top_k is not None and params.collision_top_k < roads.valid.shape[1]:
        K = params.collision_top_k
        # Conservative candidate ranking: center distance minus segment half
        # length lower-bounds box distance; any truly overlapping segment
        # scores below ~agent radius, so top-K by -score keeps all hits for
        # reasonable K.
        d = jnp.linalg.norm(
            roads.pos[:, None, :, 0:2] - state.pos[:, :, None, :], axis=-1
        )
        score = d - roads.scale[:, None, :, 0]
        score = jnp.where(pair_ok_ar, score, jnp.inf)
        if params.approx_top_k:
            # exact lax.top_k is a full sort on TPU — ~8x slower than the
            # hardware approx_max_k at R=10k.  NOTE: approx_max_k bins the
            # input and can drop a genuinely-overlapping segment that shares
            # a reduction bin with a closer-scoring candidate, so this
            # opt-in mode may RARELY miss a collision; the conservative
            # score bound makes that unlikely (hits rank far above the K-th
            # cut) but does not strictly prevent it.  Use the exact path
            # (approx_top_k=False, bench --exact) when comparing collision
            # counts for correctness; keep approx for throughput benching.
            _, cand = jax.lax.approx_max_k(-score, K, recall_target=0.99)
        else:
            _, cand = jax.lax.top_k(-score, K)  # [W, A, K]
        gather = jax.vmap(lambda xw, cw: xw[cw])  # [R,...],[A,K] -> [A,K,...]
        r_ok = jnp.take_along_axis(pair_ok_ar, cand, axis=2)
        hit_ar = obb.obb_overlap_sat(
            state.pos[:, :, None, :], state.yaw[:, :, None], half[:, :, None],
            gather(roads.pos[..., 0:2], cand),
            gather(roads.yaw, cand),
            gather(road_half, cand),
        ) & r_ok
    else:
        hit_ar = obb.obb_overlap_sat(
            state.pos[:, :, None, :], state.yaw[:, :, None], half[:, :, None],
            roads.pos[:, None, :, 0:2], roads.yaw[:, None, :],
            road_half[:, None, :],
        ) & pair_ok_ar

    # All road entity types (RoadEdge..StopSign = 1..6) attribute to
    # collidedWithRoad (src/sim.cpp:713-716).
    any_ar = jnp.any(hit_ar, axis=-1)

    one = jnp.int32(1)
    return state.replace(
        collided=jnp.where(any_aa | any_ar, one, state.collided),
        collided_road=jnp.where(any_ar, one, state.collided_road),
        collided_vehicle=jnp.where(hit_veh, one, state.collided_vehicle),
        collided_non_vehicle=jnp.where(
            hit_nonveh, one, state.collided_non_vehicle
        ),
    )
