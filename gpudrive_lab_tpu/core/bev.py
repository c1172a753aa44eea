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

Cost is O(cells x entities) per agent; gate BEV on only when needed
(EnvConfig.bev_obs, default False, mirroring the reference's Python default).
"""

from __future__ import annotations

import jax.numpy as jnp

from gpudrive_lab_tpu import constants as C
from gpudrive_lab_tpu.core.geometry import quat_yaw_diff, rotate_into_frame
from gpudrive_lab_tpu.core.types import Params, Scene, SimState


def bev_observation(scene: Scene, state: SimState, params: Params) -> jnp.ndarray:
    """[W, A, RES, RES, 1] float type-id grid (export layout: SURVEY.md
    Appendix B bev_observation_tensor)."""
    res = C.BEV_RESOLUTION
    radius = params.observation_radius
    K = C.MAX_AGENT_MAP_OBS
    agents = scene.agents
    roads = scene.roads
    W, A = state.pos.shape[:2]

    # Cell centers in the ego frame: px = x * scale_px - radius
    # (reference: src/rasterizer.hpp:60-62; note the integer-truncation grid
    # mapping of toGridCoords is reproduced by construction since we test
    # cell centers directly against the rectangle).
    scale_px = 2.0 * radius / res
    coords = jnp.arange(res, dtype=jnp.float32) * scale_px - radius
    px = coords[None, :].repeat(res, 0)  # [y, x] grids
    py = coords[:, None].repeat(res, 1)
    cells = jnp.stack([px, py], axis=-1).reshape(res * res, 2)  # [cells, 2]

    def covers(rel_pos, rel_yaw, half_l, half_w):
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

    # Min segment width (src/sim.cpp:507-510).  NB the reference passes the
    # MapObservation scale (already half-extents) into a rasterizer that
    # halves again (rasterizer.hpp:37-38), so roads paint at half their true
    # extent; reproduced faithfully.
    min_w = 2.0 * radius / res
    road_half_l = roads.scale[:, None, :, 0] / 2.0
    road_half_w = jnp.maximum(roads.scale[:, None, :, 1], min_w) / 2.0

    cov_road = covers(rel_road, rel_yaw_road, road_half_l, road_half_w)
    cov_road = cov_road & painted_road[..., None, :]
    # paint order = road entity index
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
    # Agents rasterize with FULL length/width (not halves, not 0.7-scaled):
    # collectBevObservationsSystem passes other_size.length/width to a
    # rasterizer expecting full extents (src/sim.cpp:544-553).
    cov_agent = covers(
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
