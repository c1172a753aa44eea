"""Batch camera renderer: per-agent RGB + depth tensors.

TPU-native equivalent of the madrona batch renderer's tensor exports
(reference: src/mgr.cpp:922-948 rgbTensor [W, A, H, Wpx, 4] uint8 /
depthTensor [W, A, H, Wpx, 1] float32, fed by the engine's raytracer).
Instead of a BVH raytracer, every pixel ray is intersected against ALL
scene boxes with the same oriented-slab test the lidar uses, extended to
3-D (xy OBB slab + z slab) — a dense [A, H*Wpx, E] lattice reduced with a
masked min, which is exactly the shape of work the VPU/MXU wants.

Cameras sit at each agent's position (z + eye height), looking along the
agent heading with a pinhole projection.  Flat shading: entity-type albedo
modulated by inverse depth, sky/ground background split at the horizon.
Memory is bounded by chunking the agent axis through lax.map.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from gpudrive_lab_tpu import constants as C
from gpudrive_lab_tpu.core.types import Scene, SimState

EYE_HEIGHT = 1.5  # camera z offset above the agent origin
AGENT_HALF_HEIGHT = 0.7  # matches the lidar's agent z-extent

# entity-type -> RGB albedo (uint8), index = EntityType enum value
_TYPE_ALBEDO = np.zeros((16, 3), np.uint8)
_TYPE_ALBEDO[C.ET_ROAD_LANE] = (180, 180, 180)
_TYPE_ALBEDO[C.ET_ROAD_LINE] = (230, 230, 230)
_TYPE_ALBEDO[C.ET_ROAD_EDGE] = (90, 90, 90)
_TYPE_ALBEDO[C.ET_CROSSWALK] = (200, 200, 120)
_TYPE_ALBEDO[C.ET_SPEED_BUMP] = (200, 150, 60)
_TYPE_ALBEDO[C.ET_STOP_SIGN] = (220, 40, 40)
_TYPE_ALBEDO[C.ET_VEHICLE] = (60, 120, 220)
_TYPE_ALBEDO[C.ET_PEDESTRIAN] = (240, 120, 40)
_TYPE_ALBEDO[C.ET_CYCLIST] = (120, 220, 120)
_SKY = np.array((153, 204, 255), np.uint8)
_GROUND = np.array((70, 80, 70), np.uint8)


@dataclasses.dataclass(frozen=True)
class CameraConfig:
    """reference: mgr.hpp batchRenderViewWidth/Height."""

    height: int = 64
    width: int = 64
    hfov_deg: float = 90.0
    max_depth: float = 200.0
    agent_chunk: int = 8  # agents rendered per lax.map step (memory bound)


def _pixel_dirs(cfg: CameraConfig) -> np.ndarray:
    """[H, Wpx, 3] unit ray directions in the camera frame (x forward,
    y left, z up); pinhole projection."""
    tan_h = np.tan(np.radians(cfg.hfov_deg) / 2)
    tan_v = tan_h * cfg.height / cfg.width
    # pixel centers, image row 0 = top of frame
    ys = (1.0 - 2.0 * (np.arange(cfg.width) + 0.5) / cfg.width) * tan_h
    zs = (1.0 - 2.0 * (np.arange(cfg.height) + 0.5) / cfg.height) * tan_v
    d = np.stack(
        [
            np.ones((cfg.height, cfg.width)),
            np.broadcast_to(ys[None, :], (cfg.height, cfg.width)),
            np.broadcast_to(zs[:, None], (cfg.height, cfg.width)),
        ],
        axis=-1,
    )
    return (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)


def _ray_box_t3(origin, dir3, box_pos, box_yaw, box_half):
    """First positive hit parameter of 3-D rays against z-aligned OBBs
    (xy oriented slab + z slab); inf on miss.  Broadcasting shapes:
    origin/dir3 [..., 3], box_pos/box_half [..., 3], box_yaw [...]."""
    c = jnp.cos(box_yaw)
    s = jnp.sin(box_yaw)
    rel = origin - box_pos
    ox = c * rel[..., 0] + s * rel[..., 1]
    oy = -s * rel[..., 0] + c * rel[..., 1]
    oz = rel[..., 2]
    dx = c * dir3[..., 0] + s * dir3[..., 1]
    dy = -s * dir3[..., 0] + c * dir3[..., 1]
    dz = dir3[..., 2]

    eps = 1e-9
    dx = jnp.where(jnp.abs(dx) < eps, eps, dx)
    dy = jnp.where(jnp.abs(dy) < eps, eps, dy)
    dz = jnp.where(jnp.abs(dz) < eps, eps, dz)

    tx1 = (-box_half[..., 0] - ox) / dx
    tx2 = (box_half[..., 0] - ox) / dx
    ty1 = (-box_half[..., 1] - oy) / dy
    ty2 = (box_half[..., 1] - oy) / dy
    tz1 = (-box_half[..., 2] - oz) / dz
    tz2 = (box_half[..., 2] - oz) / dz

    tmin = jnp.maximum(
        jnp.maximum(jnp.minimum(tx1, tx2), jnp.minimum(ty1, ty2)),
        jnp.minimum(tz1, tz2),
    )
    tmax = jnp.minimum(
        jnp.minimum(jnp.maximum(tx1, tx2), jnp.maximum(ty1, ty2)),
        jnp.maximum(tz1, tz2),
    )
    hit = (tmax >= tmin) & (tmax > 0.0) & (tmin > 0.0)
    return jnp.where(hit, tmin, jnp.inf)


def _shade_hits(t_all, etypes, dz, cfg: CameraConfig):
    """Shared flat shading: nearest hit over the entity axis -> (rgba f32,
    depth f32).  t_all [..., E] hit params, etypes [E], dz [...] world-frame
    ray z component (horizon split for the background)."""
    albedo = jnp.asarray(_TYPE_ALBEDO, jnp.float32)
    sky = jnp.asarray(_SKY, jnp.float32)
    ground = jnp.asarray(_GROUND, jnp.float32)
    best = jnp.min(t_all, axis=-1)
    best_idx = jnp.argmin(t_all, axis=-1)
    hit = best <= cfg.max_depth
    hit_type = jnp.take(etypes, best_idx)
    shade = 1.0 / (1.0 + 0.01 * best)
    color = jnp.take(albedo, jnp.clip(hit_type, 0, 15), axis=0) * shade[..., None]
    background = jnp.where(
        (dz < 0.0)[..., None], ground[None, None], sky[None, None]
    )
    rgb = jnp.where(hit[..., None], color, background)
    rgb = jnp.concatenate(
        [rgb, jnp.full(rgb.shape[:-1] + (1,), 255.0)], axis=-1
    )
    depth = jnp.where(hit, best, 0.0)
    return rgb, depth


@functools.partial(jax.jit, static_argnames=("config", "world"))
def free_camera_render(
    scene: Scene,
    state: SimState,
    cam_pos: jnp.ndarray,
    cam_yaw: jnp.ndarray,
    cam_pitch: jnp.ndarray,
    config: CameraConfig,
    world: int = 0,
    exclude_agent: int = -1,
):
    """Render ONE free camera (fly-camera viewer parity, reference:
    src/viewer.cpp:16-210 — the Madrona viewer's user-piloted 3-D camera).

    cam_pos [3] world-frame eye; cam_yaw/cam_pitch scalars (radians,
    pitch > 0 looks up); exclude_agent >= 0 hides that agent's box (the
    batch renderer's self-exclusion, for rides-along views).  Returns
    (rgb [H, Wpx, 4] uint8, depth [H, Wpx] float32).  Same ray-vs-OBB
    lattice as batch_render: at pose (agent pos + eye height, agent yaw,
    pitch 0) with exclude_agent=that agent it reproduces the agent's batch
    view exactly (tests/test_render.py)."""
    cfg = config
    A = state.pos.shape[1]
    P = cfg.height * cfg.width
    agents = scene.agents
    roads = scene.roads

    d_cam = jnp.asarray(_pixel_dirs(cfg).reshape(P, 3))  # [P, 3]
    # pitch about the camera's left (y) axis: forward -> (cos p, 0, sin p)
    cp, sp = jnp.cos(cam_pitch), jnp.sin(cam_pitch)
    px = d_cam[:, 0] * cp - d_cam[:, 2] * sp
    pz = d_cam[:, 0] * sp + d_cam[:, 2] * cp
    # yaw about world z
    cy, sy = jnp.cos(cam_yaw), jnp.sin(cam_yaw)
    d3 = jnp.stack(
        [px * cy - d_cam[:, 1] * sy, px * sy + d_cam[:, 1] * cy, pz],
        axis=-1,
    )  # [P, 3]
    o3 = cam_pos[None, :]  # [1, 3]

    rhalf = roads.scale[world]
    t_road = _ray_box_t3(
        o3[:, None, :], d3[:, None, :],
        roads.pos[world][None], roads.yaw[world][None], rhalf[None],
    )  # [P, R]
    t_road = jnp.where(roads.valid[world][None], t_road, jnp.inf)

    apos3 = jnp.concatenate(
        [state.pos[world], state.z[world][:, None]], axis=-1
    )
    ahalf = jnp.concatenate(
        [
            agents.size[world, :, 0:2] * (0.5 * C.VEHICLE_LENGTH_SCALE),
            jnp.full((A, 1), AGENT_HALF_HEIGHT),
        ],
        axis=-1,
    )
    t_agent = _ray_box_t3(
        o3[:, None, :], d3[:, None, :],
        apos3[None], state.yaw[world][None], ahalf[None],
    )  # [P, A]
    visible = agents.valid[world] & (jnp.arange(A) != exclude_agent)
    t_agent = jnp.where(visible[None], t_agent, jnp.inf)

    t_all = jnp.concatenate([t_road, t_agent], axis=-1)  # [P, E]
    etypes = jnp.concatenate([roads.etype[world], agents.etype[world]])
    rgb, depth = _shade_hits(t_all, etypes, d3[:, 2], cfg)
    return (
        rgb.reshape(cfg.height, cfg.width, 4).astype(jnp.uint8),
        depth.reshape(cfg.height, cfg.width),
    )


@functools.partial(jax.jit, static_argnames="config")
def batch_render(scene: Scene, state: SimState, config: CameraConfig):
    """Render every agent's camera.  Returns (rgb [W, A, H, Wpx, 4] uint8,
    depth [W, A, H, Wpx, 1] float32; depth 0 where nothing is hit, matching
    the empty-view convention of the reference exports)."""
    cfg = config
    W, A = state.pos.shape[:2]
    P = cfg.height * cfg.width
    agents = scene.agents
    roads = scene.roads

    dirs_cam = jnp.asarray(_pixel_dirs(cfg).reshape(P, 3))  # [P, 3]

    # scene boxes: roads then agents
    road_pos = roads.pos  # [W, R, 3]
    road_half = roads.scale
    agent_half = jnp.concatenate(
        [
            agents.size[..., 0:2] * (0.5 * C.VEHICLE_LENGTH_SCALE),
            jnp.full(agents.size[..., :1].shape, AGENT_HALF_HEIGHT),
        ],
        axis=-1,
    )
    def render_agent_block(args):
        """One chunk of agent indices for one world slice; returns
        (rgb [chunk, P, 4] u8, depth [chunk, P])."""
        (w_pos, w_yaw, w_z, a_idx, rpos, ryaw, rhalf, retype, rvalid,
         apos3, ayaw, ahalf, aetype, avalid) = args
        cam_pos = jnp.concatenate(
            [
                jnp.take(w_pos, a_idx, axis=0),
                jnp.take(w_z, a_idx)[:, None] + EYE_HEIGHT,
            ],
            axis=-1,
        )  # [chunk, 3]
        yaw = jnp.take(w_yaw, a_idx)  # [chunk]
        c, s = jnp.cos(yaw), jnp.sin(yaw)
        # camera frame -> world: rotate xy by yaw
        dx = dirs_cam[None, :, 0] * c[:, None] - dirs_cam[None, :, 1] * s[:, None]
        dy = dirs_cam[None, :, 0] * s[:, None] + dirs_cam[None, :, 1] * c[:, None]
        dz = jnp.broadcast_to(dirs_cam[None, :, 2], dx.shape)
        d3 = jnp.stack([dx, dy, dz], axis=-1)  # [chunk, P, 3]
        o3 = cam_pos[:, None, :]  # [chunk, 1, 3]

        t_road = _ray_box_t3(
            o3[:, :, None, :], d3[:, :, None, :],
            rpos[None, None], ryaw[None, None], rhalf[None, None],
        )  # [chunk, P, R]
        t_road = jnp.where(rvalid[None, None], t_road, jnp.inf)

        t_agent = _ray_box_t3(
            o3[:, :, None, :], d3[:, :, None, :],
            apos3[None, None], ayaw[None, None], ahalf[None, None],
        )  # [chunk, P, A]
        not_self = jnp.arange(A)[None, :] != a_idx[:, None]  # [chunk, A]
        t_agent = jnp.where(
            avalid[None, None] & not_self[:, None, :], t_agent, jnp.inf
        )

        t_all = jnp.concatenate([t_road, t_agent], axis=-1)  # [chunk,P,E]
        etypes = jnp.concatenate([retype, aetype])  # [E]
        rgb, depth = _shade_hits(t_all, etypes, dz, cfg)
        return rgb.astype(jnp.uint8), depth

    chunk = min(cfg.agent_chunk, A)
    n_chunks = (A + chunk - 1) // chunk
    pad_A = n_chunks * chunk
    agent_ids = jnp.arange(pad_A) % A  # wrap padding (discarded below)

    def per_world(w):
        rpos, ryaw, rhalf = road_pos[w], roads.yaw[w], road_half[w]
        retype, rvalid = roads.etype[w], roads.valid[w]
        apos3 = jnp.concatenate(
            [state.pos[w], state.z[w][:, None]], axis=-1
        )
        args_static = (
            state.pos[w], state.yaw[w], state.z[w],
        )
        blocks = agent_ids.reshape(n_chunks, chunk)

        def body(a_idx):
            return render_agent_block(
                args_static + (a_idx, rpos, ryaw, rhalf, retype, rvalid,
                               apos3, state.yaw[w], agent_half[w],
                               agents.etype[w], agents.valid[w])
            )

        rgb, depth = jax.lax.map(body, blocks)
        rgb = rgb.reshape(pad_A, cfg.height, cfg.width, 4)[:A]
        depth = depth.reshape(pad_A, cfg.height, cfg.width, 1)[:A]
        return rgb, depth

    rgb, depth = jax.lax.map(per_world, jnp.arange(W))
    # invalid agents render as empty views
    valid = agents.valid[..., None, None, None]
    return (
        jnp.where(valid, rgb, 0).astype(jnp.uint8),
        jnp.where(valid, depth, 0.0),
    )
