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
