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
