"""Lidar observation collector.

Vectorized replacement for the reference's BVH ray-trace lidar
(reference: src/sim.cpp:394-460): per agent, 3 height planes x 50 rays over a
120-degree cone centered on the heading.  The warp-per-agent CUDA dispatch
(sim.cpp:898-913) becomes a broadcasted [W, A, 3, S, E] ray-vs-OBB slab test
reduced with a masked min over entities — pure VPU work.

Plane semantics come from the reference's z-offsets (src/consts.hpp:42-44):
each horizontal ray plane only intersects entities whose z-extent contains
the plane height — cars plane (z=1.5) sees agents + stop signs, road-edge
plane (z=1.1) adds road edges, road-line plane (z=0.9) sees road
lines/lanes/crosswalks/speed bumps instead.  We test z-overlap against the
actual entity boxes rather than special-casing types.

Sample layout matches the Lidar export struct (src/types.hpp:296-313):
[depth, encodedType, hit_x, hit_y] with hit positions in the ego ray frame
(depth * cos(theta), depth * sin(theta)).
"""

from __future__ import annotations

import jax.numpy as jnp

from gpudrive_lab_tpu import constants as C
from gpudrive_lab_tpu.core.types import Params, Scene, SimState

_PLANE_OFFSETS = (
    C.LIDAR_CAR_OFFSET,
    C.LIDAR_ROAD_EDGE_OFFSET,
    C.LIDAR_ROAD_LINE_OFFSET,
)


def _ray_box_t(origin, dir_xy, box_pos, box_yaw, box_half):
    """First positive intersection parameter of rays with 2-D OBBs (slab
    test in the box frame); inf when missed.  Shapes broadcast:
    origin/dir [..., 2], box_* [..., 2]/[...]."""
    c = jnp.cos(box_yaw)
    s = jnp.sin(box_yaw)
    rel = origin - box_pos
    ox = c * rel[..., 0] + s * rel[..., 1]
    oy = -s * rel[..., 0] + c * rel[..., 1]
    dx = c * dir_xy[..., 0] + s * dir_xy[..., 1]
    dy = -s * dir_xy[..., 0] + c * dir_xy[..., 1]

    eps = 1e-9
    dx = jnp.where(jnp.abs(dx) < eps, eps, dx)
    dy = jnp.where(jnp.abs(dy) < eps, eps, dy)

    tx1 = (-box_half[..., 0] - ox) / dx
    tx2 = (box_half[..., 0] - ox) / dx
    ty1 = (-box_half[..., 1] - oy) / dy
    ty2 = (box_half[..., 1] - oy) / dy

    tmin = jnp.maximum(jnp.minimum(tx1, tx2), jnp.minimum(ty1, ty2))
    tmax = jnp.minimum(jnp.maximum(tx1, tx2), jnp.maximum(ty1, ty2))
    hit = (tmax >= tmin) & (tmax > 0.0) & (tmin > 0.0)
    return jnp.where(hit, tmin, jnp.inf)


def lidar_observation(
    scene: Scene, state: SimState, params: Params, actions: jnp.ndarray
) -> jnp.ndarray:
    """[W, A, 3, S, 4] lidar samples.  ``actions`` supplies headAngle for
    controlled agents (src/sim.cpp:409-410)."""
    W, A = state.pos.shape[:2]
    S = C.NUM_LIDAR_SAMPLES
    agents = scene.agents
    roads = scene.roads

    head = jnp.where(agents.controlled, actions[..., 2], 0.0)  # [W, A]
    idx = jnp.arange(S, dtype=jnp.float32)
    theta = C.LIDAR_ANGLE * (2.0 * idx / S - 1.0)  # [S]
    theta = theta[None, None, :] + head[..., None]  # [W, A, S]
    # Cone is centered on the heading: the box x-axis (vehicle length axis)
    # is the madrona `right` vector in sim.cpp:403-414.
    ray_yaw = state.yaw[..., None] + theta
    dir_xy = jnp.stack([jnp.cos(ray_yaw), jnp.sin(ray_yaw)], axis=-1)

    origin = state.pos[:, :, None, :]  # [W, A, 1, 2]
    plane_z = state.z[..., None] + jnp.asarray(
        _PLANE_OFFSETS, jnp.float32
    )  # [W, A, 3]

    # --- road entities -------------------------------------------------
    r_lo = roads.pos[..., 2] - roads.scale[..., 2]
    r_hi = roads.pos[..., 2] + roads.scale[..., 2]
    # [W, A, 3, R]: plane height within entity z-extent
    rz_ok = (
        (plane_z[..., :, None] >= r_lo[:, None, None, :])
        & (plane_z[..., :, None] <= r_hi[:, None, None, :])
        & roads.valid[:, None, None, :]
    )
    t_road = _ray_box_t(
        origin[:, :, None, :, None, :],  # [W, A, 1, S, 1, 2]
        dir_xy[:, :, None, :, None, :],
        roads.pos[:, None, None, None, :, 0:2],
        roads.yaw[:, None, None, None, :],
        roads.scale[:, None, None, None, :, 0:2],
    )  # [W, A, 1, S, R] -> broadcast over planes via where
    t_road = jnp.where(rz_ok[:, :, :, None, :], t_road, jnp.inf)

    # --- other agents ---------------------------------------------------
    half = agents.size[..., 0:2] * (0.5 * C.VEHICLE_LENGTH_SCALE)
    a_lo = state.z - 0.7
    a_hi = state.z + 0.7
    az_ok = (
        (plane_z[..., :, None] >= a_lo[:, None, None, :])
        & (plane_z[..., :, None] <= a_hi[:, None, None, :])
        & agents.valid[:, None, None, :]
    )
    # exclude self
    eye = jnp.eye(A, dtype=bool)[None, :, None, :]
    az_ok = az_ok & ~eye
    t_agent = _ray_box_t(
        origin[:, :, None, :, None, :],
        dir_xy[:, :, None, :, None, :],
        state.pos[:, None, None, None, :, :],
        state.yaw[:, None, None, None, :],
        half[:, None, None, None, :, :],
    )  # [W, A, 1, S, A2]
    t_agent = jnp.where(az_ok[:, :, :, None, :], t_agent, jnp.inf)

    # --- nearest hit ----------------------------------------------------
    t_all = jnp.concatenate([t_road, t_agent], axis=-1)  # [W,A,3,S,R+A]
    types = jnp.concatenate(
        [
            roads.etype[:, None, None, None, :],
            agents.etype[:, None, None, None, :],
        ],
        axis=-1,
    )
    best = jnp.min(t_all, axis=-1)
    best_idx = jnp.argmin(t_all, axis=-1)
    hit = best <= C.LIDAR_DISTANCE
    best_type = jnp.take_along_axis(
        jnp.broadcast_to(types, t_all.shape[:-1] + (types.shape[-1],)),
        best_idx[..., None],
        axis=-1,
    )[..., 0]

    depth = jnp.where(hit, best, 0.0)
    etype = jnp.where(hit, best_type.astype(jnp.float32), 0.0)
    # Local hit position: depth * (cos(theta), sin(theta))
    # (reference: src/sim.cpp:433-435)
    local = depth[..., None] * jnp.stack(
        [jnp.cos(theta), jnp.sin(theta)], axis=-1
    )[:, :, None]
    out = jnp.concatenate(
        [depth[..., None], etype[..., None], local], axis=-1
    )
    return jnp.where(agents.valid[:, :, None, None, None], out, 0.0)
