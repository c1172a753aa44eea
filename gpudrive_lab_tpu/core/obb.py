"""2-D oriented-bounding-box overlap test.

Vectorized re-implementation of the SAT-style test the reference uses for
narrow-phase collision (reference: src/obb.hpp:11-92, after the flipcode 2D
OBB article).  Instead of building explicit corner structs per entity pair,
everything is expressed as broadcasted element-wise math so XLA can fuse the
whole narrow phase into one VPU loop over the [W, pairs] lattice.

Semantics match the reference exactly: each box projects the *other* box's
corners onto its two edge axes normalized by squared edge length, and overlap
requires intersection on both axes in both directions.
"""

import jax.numpy as jnp


def corners(center, yaw, half_extents):
    """Corners of an OBB, in the reference's order (src/obb.hpp:22-28).

    center: [..., 2]; yaw: [...]; half_extents: [..., 2] (d0 along heading).
    Returns [..., 4, 2].
    """
    c = jnp.cos(yaw)
    s = jnp.sin(yaw)
    X = jnp.stack([c, s], axis=-1) * half_extents[..., 0:1]
    Y = jnp.stack([-s, c], axis=-1) * half_extents[..., 1:2]
    return jnp.stack(
        [center - X - Y, center + X - Y, center + X + Y, center - X + Y],
        axis=-2,
    )


def _overlaps_on_axes(own_corners, other_corners):
    """own.overlaps(other) (reference: src/obb.hpp:51-82): project other's
    corners on own's two axes (scaled by 1/len^2) and intersect with
    [origin, origin+1]."""
    c0 = own_corners[..., 0, :]
    axes = jnp.stack(
        [own_corners[..., 1, :] - c0, own_corners[..., 3, :] - c0], axis=-2
    )  # [..., 2, 2]
    len2 = jnp.sum(axes * axes, axis=-1, keepdims=True)
    axes = axes / jnp.where(len2 == 0.0, 1.0, len2)
    origin = jnp.sum(c0[..., None, :] * axes, axis=-1)  # [..., 2]
    # t[..., axis, corner] = other_corner . axis
    t = jnp.einsum("...ax,...cx->...ac", axes, other_corners)
    t_min = jnp.min(t, axis=-1)
    t_max = jnp.max(t, axis=-1)
    separated = (t_min > 1.0 + origin) | (t_max < origin)
    return ~jnp.any(separated, axis=-1)


def obb_overlap(corners_a, corners_b):
    """OrientedBoundingBox2D::hasCollided (reference: src/obb.hpp:34-37)."""
    return _overlaps_on_axes(corners_a, corners_b) & _overlaps_on_axes(
        corners_b, corners_a
    )


def obb_overlap_from_params(center_a, yaw_a, half_a, center_b, yaw_b, half_b):
    return obb_overlap(
        corners(center_a, yaw_a, half_a), corners(center_b, yaw_b, half_b)
    )


def obb_overlap_sat(center_a, yaw_a, half_a, center_b, yaw_b, half_b):
    """Closed-form separating-axis test, mathematically equivalent to the
    corner-projection formulation above but ~5x fewer ops and no [..., 4, 2]
    corner tensors — the production collision path (boundary-inclusive like
    the reference's interval test, src/obb.hpp:72).

    All operands broadcast elementwise; returns bool[...]."""
    d = center_b - center_a
    rel = yaw_b - yaw_a
    c = jnp.cos(rel)
    s = jnp.sin(rel)
    ac = jnp.abs(c)
    asn = jnp.abs(s)

    ca = jnp.cos(yaw_a)
    sa = jnp.sin(yaw_a)
    # delta in A's frame
    dx = ca * d[..., 0] + sa * d[..., 1]
    dy = -sa * d[..., 0] + ca * d[..., 1]

    a0, a1 = half_a[..., 0], half_a[..., 1]
    b0, b1 = half_b[..., 0], half_b[..., 1]

    # A's axes
    sep_a0 = jnp.abs(dx) > a0 + b0 * ac + b1 * asn
    sep_a1 = jnp.abs(dy) > a1 + b0 * asn + b1 * ac
    # B's axes: delta in B's frame
    cb = jnp.cos(yaw_b)
    sb = jnp.sin(yaw_b)
    ex = cb * d[..., 0] + sb * d[..., 1]
    ey = -sb * d[..., 0] + cb * d[..., 1]
    sep_b0 = jnp.abs(ex) > b0 + a0 * ac + a1 * asn
    sep_b1 = jnp.abs(ey) > b1 + a0 * asn + a1 * ac

    return ~(sep_a0 | sep_a1 | sep_b0 | sep_b1)
