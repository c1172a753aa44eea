"""Birds-eye-view rasterized observation.

Vectorized replacement for the reference's per-agent CPU rasterizer
(reference: src/rasterizer.hpp:27-78 driven by
src/sim.cpp:462-555 collectBevObservationsSystem).  Each agent gets a
200x200 grid of entity-type ids over a (2*radius)^2 ego-aligned... NOTE: the
reference rasterizes in the ego *frame* (relative position + relative yaw),
i.e. the grid rotates with the agent; we reproduce that.

The reference scan-fills each rectangle's bounding disk of cells and lets
later writes win: roads are painted in entity order (first
kMaxAgentMapObservationsCount within the radius), then all other agents.
Here every cell tests coverage against every candidate entity and takes the
LAST covering entity (max paint index) — identical write-order semantics,
expressed as a reduction so XLA can fuse it.

Memory/perf (round 5): only the FIRST K=kMaxAgentMapObservationsCount
within-radius roads can ever paint (sim.cpp:497-505), so the road term is
gather-then-compute — exact first-K index selection (the same rank trick as
core/observations.py) shrinks the coverage lattice from [A, cells, R] to
[A, cells, K], and a lax.map over (world, agent-chunk) bounds what is live
in HBM.  The naive dense lattice at W=8/R=1280 is >200 GB of fused
intermediates and OOMs; the chunked gather path is bounded by one
[chunk, cells, K] tile.  Cost remains O(cells x K) per agent; gate BEV on
only when needed (EnvConfig.bev_obs, default False, mirroring the
reference's Python default).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gpudrive_lab_tpu import constants as C
from gpudrive_lab_tpu.core.geometry import quat_yaw_diff, rotate_into_frame
from gpudrive_lab_tpu.core.types import Params, Scene, SimState


def _cells(res: int, radius: float) -> jnp.ndarray:
    """[cells, 2] cell-center coordinates in the ego frame (reference:
    src/rasterizer.hpp:60-62)."""
    scale_px = 2.0 * radius / res
    coords = jnp.arange(res, dtype=jnp.float32) * scale_px - radius
    px = coords[None, :].repeat(res, 0)  # [y, x] grids
    py = coords[:, None].repeat(res, 1)
    return jnp.stack([px, py], axis=-1).reshape(res * res, 2)


def _covers(cells, rel_pos, rel_yaw, half_l, half_w):
    """[..., E] entity rects -> [..., cells, E] coverage."""
    d = cells[:, None, :] - rel_pos[..., None, :, :]
    c = jnp.cos(-rel_yaw)[..., None, :]
    s = jnp.sin(-rel_yaw)[..., None, :]
    lx = d[..., 0] * c - d[..., 1] * s
    ly = d[..., 0] * s + d[..., 1] * c
    eps = 1e-3
    return (jnp.abs(lx) <= half_l[..., None, :] + eps) & (
        jnp.abs(ly) <= half_w[..., None, :] + eps
    )


def bev_observation(
    scene: Scene,
    state: SimState,
    params: Params,
    agent_chunk: int = 8,
) -> jnp.ndarray:
    """[W, A, RES, RES, 1] float type-id grid (export layout: SURVEY.md
    Appendix B bev_observation_tensor).  ``agent_chunk``: agents rasterized
    per lax.map step (memory bound); 0 disables chunking AND the road
    gather (the round-4 dense reference path, kept for equivalence tests).
    """
    res = C.BEV_RESOLUTION
    radius = params.observation_radius
    K = C.MAX_AGENT_MAP_OBS
    agents = scene.agents
    roads = scene.roads
    W, A = state.pos.shape[:2]
    R = roads.valid.shape[1]
    cells = _cells(res, radius)

    if agent_chunk == 0:
        return _bev_dense(scene, state, params, cells)

    # ---- first-K within-radius road selection (exact, sim.cpp:497-505):
    # key[r] = r if painted else R; the K smallest keys are the first K
    # within indices in order (core/observations.py's selection shape).
    dist = jnp.linalg.norm(
        roads.pos[:, None, :, 0:2] - state.pos[:, :, None, :], axis=-1
    )  # [W, A, R]
    within = roads.valid[:, None, :] & (dist <= radius)
    rank = jnp.cumsum(within, axis=-1) - 1
    painted = within & (rank < K)
    K = min(K, R)  # tiny road buckets: can't select more rows than exist
    keys = jnp.where(painted, jnp.arange(R)[None, None, :], R)
    neg_keys, _ = jax.lax.top_k(-keys, K)
    idx = -neg_keys  # [W, A, K] ascending original road indices (R = none)
    live = idx < R
    gidx = jnp.minimum(idx, R - 1)

    def g(x):
        """[W, R, ...] -> [W, A, K, ...] rows of the K winners."""
        flat = x.reshape((W, R, -1))
        out = jnp.take_along_axis(
            flat[:, None], gidx[..., None], axis=2
        )
        return out.reshape((W, A, K) + x.shape[2:])

    rpos = g(roads.pos[..., 0:2])
    ryaw = g(roads.yaw)
    rscale = g(roads.scale[..., 0:2])
    retype = g(roads.etype)

    # Min segment width (src/sim.cpp:507-510).  NB the reference passes the
    # MapObservation scale (already half-extents) into a rasterizer that
    # halves again (rasterizer.hpp:37-38), so roads paint at half their
    # true extent; reproduced faithfully.
    min_w = 2.0 * radius / res
    road_half_l = rscale[..., 0] / 2.0
    road_half_w = jnp.maximum(rscale[..., 1], min_w) / 2.0

    n_chunks = (A + agent_chunk - 1) // agent_chunk
    pad_A = n_chunks * agent_chunk
    blocks = (jnp.arange(pad_A) % A).reshape(n_chunks, agent_chunk)

    def per_world(w):
        def block(a_idx):
            # [chunk] agent rows
            apos = state.pos[w][a_idx]
            ayaw = state.yaw[w][a_idx]
            rel_road = rotate_into_frame(
                rpos[w][a_idx] - apos[:, None, :], ayaw[:, None]
            )  # [chunk, K, 2]
            rel_yaw_road = quat_yaw_diff(ayaw[:, None], ryaw[w][a_idx])
            cov_road = _covers(
                cells, rel_road, rel_yaw_road,
                road_half_l[w][a_idx], road_half_w[w][a_idx],
            ) & live[w][a_idx][:, None, :]  # [chunk, cells, K]
            # gathered indices ascend in k, so max paint == max k
            pk = jnp.where(cov_road, jnp.arange(K)[None, None, :], -1)
            best_k = jnp.max(pk, axis=-1)  # [chunk, cells]
            road_type = jnp.take_along_axis(
                retype[w][a_idx], jnp.maximum(best_k, 0), axis=-1
            )
            best_road = jnp.where(
                best_k >= 0,
                jnp.take_along_axis(
                    idx[w][a_idx], jnp.maximum(best_k, 0), axis=-1
                ),
                -1,
            )

            rel_agent = rotate_into_frame(
                state.pos[w][None, :, :] - apos[:, None, :], ayaw[:, None]
            )
            rel_yaw_agent = quat_yaw_diff(ayaw[:, None], state.yaw[w][None])
            a_dist = jnp.linalg.norm(rel_agent, axis=-1)
            not_self = jnp.arange(A)[None, :] != a_idx[:, None]
            a_ok = (
                agents.valid[w][None] & not_self & (a_dist <= radius)
            )
            # Agents rasterize with FULL length/width (not halves, not
            # 0.7-scaled): collectBevObservationsSystem passes
            # other_size.length/width to a rasterizer expecting full
            # extents (src/sim.cpp:544-553).
            cov_agent = _covers(
                cells, rel_agent, rel_yaw_agent,
                jnp.broadcast_to(agents.size[w, :, 0] / 2.0, (len(a_idx), A)),
                jnp.broadcast_to(agents.size[w, :, 1] / 2.0, (len(a_idx), A)),
            ) & a_ok[:, None, :]
            pa = jnp.where(cov_agent, jnp.arange(A)[None, None, :], -1)
            best_a = jnp.max(pa, axis=-1)
            agent_type = jnp.take_along_axis(
                jnp.broadcast_to(agents.etype[w][None], (len(a_idx), A)),
                jnp.maximum(best_a, 0),
                axis=-1,
            )
            # last-writer-wins: agent paint index = R + a
            best_agent = jnp.where(best_a >= 0, R + best_a, -1)
            cell_type = jnp.where(
                jnp.maximum(best_road, best_agent) < 0,
                0,
                jnp.where(
                    best_agent >= best_road, agent_type, road_type
                ),
            )
            return cell_type  # [chunk, cells] int

        out = jax.lax.map(block, blocks)  # [n_chunks, chunk, cells]
        return out.reshape(pad_A, res * res)[:A]

    cell_type = jax.lax.map(per_world, jnp.arange(W))  # [W, A, cells]
    grid = cell_type.reshape(W, A, res, res, 1).astype(jnp.float32)
    return jnp.where(agents.valid[:, :, None, None, None], grid, 0.0)


def _bev_dense(scene, state, params, cells):
    """Round-4 dense path: full [W, A, cells, R] lattice (reference
    semantics oracle for tests; OOMs at production W)."""
    res = C.BEV_RESOLUTION
    radius = params.observation_radius
    K = C.MAX_AGENT_MAP_OBS
    agents = scene.agents
    roads = scene.roads
    W, A = state.pos.shape[:2]

    # ---- road entities: first K within radius, entity order -------------
    rel_road = rotate_into_frame(
        roads.pos[:, None, :, 0:2] - state.pos[:, :, None, :],
        state.yaw[:, :, None],
    )  # [W, A, R, 2]
    rel_yaw_road = quat_yaw_diff(state.yaw[:, :, None], roads.yaw[:, None, :])
    dist = jnp.linalg.norm(rel_road, axis=-1)
    within = roads.valid[:, None, :] & (dist <= radius)
    rank = jnp.cumsum(within, axis=-1) - 1
    painted_road = within & (rank < K)

    min_w = 2.0 * radius / res
    road_half_l = roads.scale[:, None, :, 0] / 2.0
    road_half_w = jnp.maximum(roads.scale[:, None, :, 1], min_w) / 2.0

    cov_road = _covers(cells, rel_road, rel_yaw_road, road_half_l, road_half_w)
    cov_road = cov_road & painted_road[..., None, :]
    order_road = jnp.arange(roads.valid.shape[1])

    # ---- other agents ---------------------------------------------------
    rel_agent = rotate_into_frame(
        state.pos[:, None, :, :] - state.pos[:, :, None, :],
        state.yaw[:, :, None],
    )
    rel_yaw_agent = quat_yaw_diff(state.yaw[:, :, None], state.yaw[:, None, :])
    a_dist = jnp.linalg.norm(rel_agent, axis=-1)
    eye = jnp.eye(A, dtype=bool)[None]
    a_ok = agents.valid[:, None, :] & ~eye & (a_dist <= radius)
    cov_agent = _covers(
        cells,
        rel_agent,
        rel_yaw_agent,
        agents.size[:, None, :, 0] / 2.0,
        agents.size[:, None, :, 1] / 2.0,
    )
    cov_agent = cov_agent & a_ok[..., None, :]

    # ---- last-writer-wins composition -----------------------------------
    R = roads.valid.shape[1]
    neg = -1
    road_paint = jnp.where(cov_road, order_road[None, None, None, :], neg)
    agent_paint = jnp.where(
        cov_agent, R + jnp.arange(A)[None, None, None, :], neg
    )
    best_road = jnp.max(road_paint, axis=-1)
    best_agent = jnp.max(agent_paint, axis=-1)
    best = jnp.maximum(best_road, best_agent)  # [W, A, cells]

    road_types = roads.etype  # [W, R]
    take_road = jnp.take_along_axis(
        road_types[:, None, :], jnp.maximum(best_road, 0), axis=-1
    )
    take_agent = jnp.take_along_axis(
        jnp.broadcast_to(agents.etype[:, None, :], (W, A, A)),
        jnp.maximum(best_agent - R, 0),
        axis=-1,
    )
    cell_type = jnp.where(
        best < 0,
        0,
        jnp.where(best_agent >= best_road, take_agent, take_road),
    )

    grid = cell_type.reshape(W, A, res, res, 1).astype(jnp.float32)
    return jnp.where(agents.valid[:, :, None, None, None], grid, 0.0)
