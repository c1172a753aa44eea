"""Lidar observation collector.

Vectorized replacement for the reference's BVH ray-trace lidar
(reference: src/sim.cpp:394-460): per agent, 3 height planes x 50 rays over a
120-degree cone centered on the heading.  The warp-per-agent CUDA dispatch
(sim.cpp:898-913) becomes a broadcasted [W, A, 3, S, E] ray-vs-OBB slab test
reduced with a masked min over entities — pure VPU work.

Memory (round 5, all measured on a v5e): the dense [W, A, S, R] road
lattice is the FAST formulation while it fits (72K agent-steps/s at
W=64/R=1280) but is 25 GB at the forced R=10240 bucket.  Two bounded
variants exist, selected automatically by lattice size:

* world-group mapping (default for big lattices): lax.map the dense
  reduction over groups of worlds — each step is the well-fused dense
  program on a [Wg, A, S, R] tile.
* road-axis scan (``road_chunk``): reduce R in chunks carrying the running
  (min-t, type).  Exact, but measured 2.4x slower than dense at R=1280
  (scan serialization) and pathologically slow to compile at R=10240 with
  40 chunks — kept for the extreme case where even ONE world's dense
  lattice cannot fit.

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

import jax
import jax.numpy as jnp

from gpudrive_lab_tpu import constants as C
from gpudrive_lab_tpu.core.types import Params, Scene, SimState

_PLANE_OFFSETS = (
    C.LIDAR_CAR_OFFSET,
    C.LIDAR_ROAD_EDGE_OFFSET,
    C.LIDAR_ROAD_LINE_OFFSET,
)

# dense-lattice budget: above this the road term is world-group-mapped
_DENSE_BYTES_BUDGET = 4 * 1024**3


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


def _road_min_scan(
    rpos, ryaw, rscale, rvalid, retype, origin, dir_xy, plane_z, chunk: int
):
    """Chunked (min-t, type-of-argmin) reduction over the road axis.

    Returns (best_t [W, A, 3, S], best_type [W, A, 3, S] int32) with dense
    first-index tie-break.  One [W, A, S, chunk] slab-test tile is live at
    a time; the scan carry is [W, A, 3, S]-sized."""
    W, A, S = dir_xy.shape[:3]
    R = rvalid.shape[1]
    n = (R + chunk - 1) // chunk
    pad = n * chunk - R

    def chunked(x, fill=0.0):
        if pad:
            cfg = [(0, 0)] * x.ndim
            cfg[1] = (0, pad)
            x = jnp.pad(x, cfg, constant_values=fill)
        return jnp.moveaxis(
            x.reshape((x.shape[0], n, chunk) + x.shape[2:]), 1, 0
        )

    xs = (
        chunked(rpos),  # [n, W, RC, 3]
        chunked(ryaw),
        chunked(rscale),
        chunked(rvalid, fill=False),
        chunked(retype),
    )

    init = (
        jnp.full((W, A, 3, S), jnp.inf, jnp.float32),
        jnp.zeros((W, A, 3, S), jnp.int32),
    )

    def body(carry, x):
        best_t, best_ty = carry
        cpos, cyaw, cscale, cvalid, cetype = x
        c_t, c_ty = _road_min_dense(
            cpos, cyaw, cscale, cvalid, cetype, origin, dir_xy, plane_z
        )
        upd = c_t < best_t  # strict: earlier chunk wins ties = dense argmin
        return (
            jnp.where(upd, c_t, best_t),
            jnp.where(upd, c_ty, best_ty),
        ), None

    (best_t, best_ty), _ = jax.lax.scan(body, init, xs)
    return best_t, best_ty


def _road_min_dense(rpos, ryaw, rscale, rvalid, retype, origin, dir_xy,
                    plane_z):
    """Dense road reduction: (best_t, best_type) over all R segments."""
    r_lo = rpos[..., 2] - rscale[..., 2]
    r_hi = rpos[..., 2] + rscale[..., 2]
    # [W, A, 3, R]: plane height within entity z-extent
    rz_ok = (
        (plane_z[..., :, None] >= r_lo[:, None, None, :])
        & (plane_z[..., :, None] <= r_hi[:, None, None, :])
        & rvalid[:, None, None, :]
    )
    t_road = _ray_box_t(
        origin[:, :, None, :, None, :],  # [W, A, 1, S, 1, 2]
        dir_xy[:, :, None, :, None, :],
        rpos[:, None, None, None, :, 0:2],
        ryaw[:, None, None, None, :],
        rscale[:, None, None, None, :, 0:2],
    )  # [W, A, 1, S, R] -> broadcast over planes via where
    t_road = jnp.where(rz_ok[:, :, :, None, :], t_road, jnp.inf)
    best_t = jnp.min(t_road, axis=-1)
    best_ty = jnp.take_along_axis(
        jnp.broadcast_to(retype[:, None, None, None, :], t_road.shape),
        jnp.argmin(t_road, axis=-1)[..., None],
        axis=-1,
    )[..., 0]
    return best_t, best_ty


def _lidar_core(
    rpos, ryaw, rscale, rvalid, retype,
    avalid, aetype, asize, acontrolled,
    spos, syaw, sz, actions, road_chunk: int,
):
    """Full lidar for one batch of worlds (field-array form so the caller
    can lax.map world groups through it).  Returns [W, A, 3, S, 4]."""
    W, A = spos.shape[:2]
    S = C.NUM_LIDAR_SAMPLES

    head = jnp.where(acontrolled, actions[..., 2], 0.0)  # [W, A]
    idx = jnp.arange(S, dtype=jnp.float32)
    theta = C.LIDAR_ANGLE * (2.0 * idx / S - 1.0)  # [S]
    theta = theta[None, None, :] + head[..., None]  # [W, A, S]
    # Cone is centered on the heading: the box x-axis (vehicle length axis)
    # is the madrona `right` vector in sim.cpp:403-414.
    ray_yaw = syaw[..., None] + theta
    dir_xy = jnp.stack([jnp.cos(ray_yaw), jnp.sin(ray_yaw)], axis=-1)

    origin = spos[:, :, None, :]  # [W, A, 1, 2]
    plane_z = sz[..., None] + jnp.asarray(
        _PLANE_OFFSETS, jnp.float32
    )  # [W, A, 3]

    # --- road entities -------------------------------------------------
    if road_chunk:
        road_best_t, road_best_ty = _road_min_scan(
            rpos, ryaw, rscale, rvalid, retype,
            origin, dir_xy, plane_z, road_chunk,
        )
    else:
        road_best_t, road_best_ty = _road_min_dense(
            rpos, ryaw, rscale, rvalid, retype, origin, dir_xy, plane_z
        )

    # --- other agents ---------------------------------------------------
    half = asize[..., 0:2] * (0.5 * C.VEHICLE_LENGTH_SCALE)
    a_lo = sz - 0.7
    a_hi = sz + 0.7
    az_ok = (
        (plane_z[..., :, None] >= a_lo[:, None, None, :])
        & (plane_z[..., :, None] <= a_hi[:, None, None, :])
        & avalid[:, None, None, :]
    )
    # exclude self
    eye = jnp.eye(A, dtype=bool)[None, :, None, :]
    az_ok = az_ok & ~eye
    t_agent = _ray_box_t(
        origin[:, :, None, :, None, :],
        dir_xy[:, :, None, :, None, :],
        spos[:, None, None, None, :, :],
        syaw[:, None, None, None, :],
        half[:, None, None, None, :, :],
    )  # [W, A, 1, S, A2]
    t_agent = jnp.where(az_ok[:, :, :, None, :], t_agent, jnp.inf)

    # --- nearest hit ----------------------------------------------------
    # combine the road reduction with the agent lattice; ties go to the
    # road term (lower concatenated index, matching the dense argmin)
    agent_best_t = jnp.min(t_agent, axis=-1)  # [W, A, 3, S]
    agent_best_ty = jnp.take_along_axis(
        jnp.broadcast_to(aetype[:, None, None, None, :], t_agent.shape),
        jnp.argmin(t_agent, axis=-1)[..., None],
        axis=-1,
    )[..., 0]
    agent_wins = agent_best_t < road_best_t
    best = jnp.where(agent_wins, agent_best_t, road_best_t)
    best_type = jnp.where(agent_wins, agent_best_ty, road_best_ty)
    hit = best <= C.LIDAR_DISTANCE

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
    return jnp.where(avalid[:, :, None, None, None], out, 0.0)


def lidar_observation(
    scene: Scene,
    state: SimState,
    params: Params,
    actions: jnp.ndarray,
    road_chunk: int | None = None,
    world_group: int | None = None,
) -> jnp.ndarray:
    """[W, A, 3, S, 4] lidar samples.  ``actions`` supplies headAngle for
    controlled agents (src/sim.cpp:409-410).

    Memory strategy (see module docstring): ``world_group=None`` auto-sizes
    groups so each dense [Wg, A, S, R] tile stays under the budget;
    ``road_chunk`` (0=off) forces the road-axis scan instead."""
    W, A = state.pos.shape[:2]
    S = C.NUM_LIDAR_SAMPLES
    agents = scene.agents
    roads = scene.roads
    R = roads.valid.shape[1]

    if road_chunk is None:
        road_chunk = 0
    if world_group is None:
        per_world = A * S * R * 4
        world_group = (
            W if (road_chunk or W * per_world <= _DENSE_BYTES_BUDGET)
            else max(1, _DENSE_BYTES_BUDGET // per_world)
        )
    world_group = min(world_group, W)

    fields = (
        roads.pos, roads.yaw, roads.scale, roads.valid, roads.etype,
        agents.valid, agents.etype, agents.size, agents.controlled,
        state.pos, state.yaw, state.z, actions,
    )
    if world_group >= W:
        return _lidar_core(*fields, road_chunk=road_chunk)

    G = (W + world_group - 1) // world_group
    pad = G * world_group - W

    def grouped(x):
        if pad:
            cfg = [(0, 0)] * x.ndim
            cfg[0] = (0, pad)
            x = jnp.pad(x, cfg)
        return x.reshape((G, world_group) + x.shape[1:])

    out = jax.lax.map(
        lambda xs: _lidar_core(*xs, road_chunk=road_chunk),
        tuple(grouped(x) for x in fields),
    )
    return out.reshape((G * world_group,) + out.shape[2:])[:W]
