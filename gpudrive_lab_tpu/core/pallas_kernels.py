"""Pallas TPU kernels for the simulation hot spots.

The agent-road narrow phase is ~half the fused step's cost (the [W, A, R]
separating-axis lattice).  This kernel streams road tiles through VMEM and
accumulates per-agent hit flags without materializing any [A, R] intermediate
in HBM — one grid step per (world, road-tile).

Layouts are chosen for the VPU: agents ride the sublane axis ([A, 1]
columns), roads ride the lane axis ([1, R_T] rows, inputs pre-transposed to
[8, R]), so the SAT broadcasts are native [A, R_T] element-wise ops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# agent feature rows: px, py, cos, sin, half0, half1, active, is_vehicle
AGENT_F = 8
# road feature rows: px, py, cos, sin, half0, half1, allow_veh, allow_other
ROAD_F = 8

ROAD_TILE = 512


def _ar_kernel(a_ref, r_ref, out_ref):
    a = a_ref[0]  # [A, 8]
    px = a[:, 0:1]
    py = a[:, 1:2]
    ca = a[:, 2:3]
    sa = a[:, 3:4]
    a0 = a[:, 4:5]
    a1 = a[:, 5:6]
    active = a[:, 6:7]
    is_veh = a[:, 7:8]

    r = r_ref[0]  # [8, R_T]
    rx = r[0:1, :]
    ry = r[1:2, :]
    cb = r[2:3, :]
    sb = r[3:4, :]
    b0 = r[4:5, :]
    b1 = r[5:6, :]
    allow_veh = r[6:7, :]
    allow_other = r[7:8, :]

    dx_w = rx - px  # [A, R_T]
    dy_w = ry - py

    # |cos(yb - ya)|, |sin(yb - ya)|
    ac = jnp.abs(cb * ca + sb * sa)
    asn = jnp.abs(sb * ca - cb * sa)

    dxa = ca * dx_w + sa * dy_w
    dya = -sa * dx_w + ca * dy_w
    exb = cb * dx_w + sb * dy_w
    eyb = -sb * dx_w + cb * dy_w

    sep = (
        (jnp.abs(dxa) > a0 + b0 * ac + b1 * asn)
        | (jnp.abs(dya) > a1 + b0 * asn + b1 * ac)
        | (jnp.abs(exb) > b0 + a0 * ac + a1 * asn)
        | (jnp.abs(eyb) > b1 + a0 * asn + a1 * ac)
    )
    allowed = jnp.where(is_veh > 0.5, allow_veh, allow_other)
    hit = jnp.where(sep, 0.0, 1.0) * allowed * active
    partial = jnp.max(hit, axis=1, keepdims=True)  # [A, 1]
    tile = jnp.broadcast_to(partial[None], out_ref.shape)  # [1, A, 128]

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[...] = tile

    @pl.when(pl.program_id(1) != 0)
    def _():
        out_ref[...] = jnp.maximum(out_ref[...], tile)


# Agent-block size (sublane axis) for the tile-skip kernel; A=128 must be a
# multiple.  Smaller blocks skip more (tighter spatial extent per block once
# agents are Morton-sorted) but add loop iterations; 16 measured best.
AGENT_BLOCK = 16


def _sat_hits(a, r):
    """Dense SAT over one [asz, RT] block.  a: [asz, 8] agent features,
    r: [8, RT] road features (rows as in module docstring).  Returns
    [asz, RT] float32 1.0 where an allowed active overlap exists."""
    px, py = a[:, 0:1], a[:, 1:2]
    ca, sa = a[:, 2:3], a[:, 3:4]
    a0, a1 = a[:, 4:5], a[:, 5:6]
    active, is_veh = a[:, 6:7], a[:, 7:8]

    rx, ry = r[0:1, :], r[1:2, :]
    cb, sb = r[2:3, :], r[3:4, :]
    b0, b1 = r[4:5, :], r[5:6, :]
    allow_veh, allow_other = r[6:7, :], r[7:8, :]

    dx_w = rx - px
    dy_w = ry - py
    ac = jnp.abs(cb * ca + sb * sa)
    asn = jnp.abs(sb * ca - cb * sa)
    dxa = ca * dx_w + sa * dy_w
    dya = -sa * dx_w + ca * dy_w
    exb = cb * dx_w + sb * dy_w
    eyb = -sb * dx_w + cb * dy_w
    sep = (
        (jnp.abs(dxa) > a0 + b0 * ac + b1 * asn)
        | (jnp.abs(dya) > a1 + b0 * asn + b1 * ac)
        | (jnp.abs(exb) > b0 + a0 * ac + a1 * asn)
        | (jnp.abs(eyb) > b1 + a0 * asn + a1 * ac)
    )
    allowed = jnp.where(is_veh > 0.5, allow_veh, allow_other)
    return jnp.where(sep, 0.0, 1.0) * allowed * active


def _ar_tiled_kernel(mask_ref, a_ref, r_ref, out_ref):
    asz = a_ref.shape[1]
    T = r_ref.shape[1]
    ab = pl.program_id(1)
    a = a_ref[0]  # [asz, 8]

    def body(t, acc):
        def live(acc):
            hit = _sat_hits(a, r_ref[0, t])  # [asz, RT]
            return jnp.maximum(acc, jnp.max(hit, axis=1, keepdims=True))

        return jax.lax.cond(mask_ref[0, ab, t] > 0, live, lambda acc: acc, acc)

    acc = jax.lax.fori_loop(0, T, body, jnp.zeros((asz, 1), jnp.float32))
    out_ref[...] = jnp.broadcast_to(acc[None], out_ref.shape)


def agent_road_hits_tiled(
    agents_feat: jnp.ndarray,  # [W, A, 8] (agents Morton-sorted by caller)
    tiles_feat: jnp.ndarray,  # [W, T, 8, RT] (Scene.rtiles.feat)
    mask: jnp.ndarray,  # [W, AB, T] int32 — tile reachable from agent block
) -> jnp.ndarray:
    """Tile-skip agent-road narrow phase.

    The full road set rides in VMEM per world (T*8*RT*4 B — 327 KB at the
    R=10240 worst case); the kernel loops tiles and only runs the SAT for
    tiles the caller's AABB bound marked reachable.  Replaces the
    reference's broadphase BVH cull (src/sim.cpp:925-935) with dense
    tile-granular work skipping.  Returns [W, A] float32 any-hit flags in
    the caller's (sorted) agent order."""
    W, A, _ = agents_feat.shape
    T, RT = tiles_feat.shape[1], tiles_feat.shape[3]
    asz = AGENT_BLOCK
    AB = A // asz
    assert mask.shape == (W, AB, T), (mask.shape, (W, AB, T))
    interpret = jax.default_backend() != "tpu"  # CI runs on CPU
    out = pl.pallas_call(
        _ar_tiled_kernel,
        grid=(W, AB),
        in_specs=[
            pl.BlockSpec((1, AB, T), lambda w, ab: (w, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, asz, AGENT_F), lambda w, ab: (w, ab, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, ROAD_F, RT), lambda w, ab: (w, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, asz, 128), lambda w, ab: (w, ab, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((W, A, 128), jnp.float32),
        interpret=interpret,
    )(mask, agents_feat, tiles_feat)
    return out[:, :, 0]


@functools.partial(jax.jit, static_argnames=())
def agent_road_hits_pallas(agents_feat: jnp.ndarray, roads_feat_t: jnp.ndarray):
    """agents_feat: [W, A, 8]; roads_feat_t: [W, 8, R] (R multiple of the
    tile).  Returns [W, A] float32 (1.0 = some allowed road box overlaps)."""
    W, A, _ = agents_feat.shape
    R = roads_feat_t.shape[2]
    tile = min(ROAD_TILE, R)
    assert R % tile == 0, (R, tile)
    interpret = jax.default_backend() != "tpu"  # CI runs on CPU
    out = pl.pallas_call(
        _ar_kernel,
        grid=(W, R // tile),
        in_specs=[
            pl.BlockSpec((1, A, AGENT_F), lambda w, j: (w, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ROAD_F, tile), lambda w, j: (w, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, A, 128), lambda w, j: (w, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((W, A, 128), jnp.float32),
        interpret=interpret,
    )(agents_feat, roads_feat_t)
    return out[:, :, 0]
