"""Angle and 2-D rigid-transform helpers.

TPU-native counterparts of the reference's quaternion/angle utilities
(reference: src/utils.hpp:11-65).  The reference stores orientation as a
z-axis quaternion; since all rotations are about +z we represent orientation
directly as a yaw angle and work with 2x2 rotations, which XLA maps onto pure
VPU element-wise ops (no MXU needed at these sizes).
"""

import jax.numpy as jnp

TWO_PI = 2.0 * jnp.pi


def normalize_angle(angle):
    """Wrap angle to (-pi, pi] via fmod, matching utils::NormalizeAngle
    (reference: src/utils.hpp:11-14) exactly, including its use of fmod
    (C-style remainder with the sign of the dividend)."""
    ret = jnp.fmod(angle, TWO_PI)
    return jnp.where(
        ret > jnp.pi, ret - TWO_PI, jnp.where(ret < -jnp.pi, ret + TWO_PI, ret)
    )


def angle_add(lhs, rhs):
    """utils::AngleAdd (reference: src/utils.hpp:16-18)."""
    return normalize_angle(lhs + rhs)


def yaw_to_quat_wxyz(yaw):
    """Quat::angleAxis(yaw, up) -> (w, x, y, z). Used only for the absolute
    observation export (reference: src/types.hpp:389-406)."""
    half = 0.5 * yaw
    w = jnp.cos(half)
    z = jnp.sin(half)
    zeros = jnp.zeros_like(yaw)
    return jnp.stack([w, zeros, zeros, z], axis=-1)


def quat_yaw_diff(yaw_a, yaw_b):
    """yaw of (quat(yaw_a)^-1 * quat(yaw_b)) as computed by quatToYaw
    (reference: src/utils.hpp:20-25).  For pure z rotations this reduces to
    atan2(sin(b-a), cos(b-a)), i.e. the wrapped difference."""
    d = yaw_b - yaw_a
    return jnp.arctan2(jnp.sin(d), jnp.cos(d))


def rotate_into_frame(rel_xy, frame_yaw):
    """Rotate world-frame offsets into an ego frame: R(-yaw) @ rel.

    Matches rot.inv().rotateVec(...) used throughout the obs collectors
    (reference: src/sim.cpp:180-181, 208-209; src/utils.hpp:50-57).
    rel_xy: [..., 2]; frame_yaw broadcastable to rel_xy[..., 0].
    """
    c = jnp.cos(frame_yaw)
    s = jnp.sin(frame_yaw)
    x = rel_xy[..., 0]
    y = rel_xy[..., 1]
    return jnp.stack([c * x + s * y, -s * x + c * y], axis=-1)


def rotate_out_of_frame(local_xy, frame_yaw):
    """Rotate ego-frame offsets into the world frame: R(yaw) @ local.
    Used by the delta dynamics model (reference: src/dynamics.hpp:89-97)."""
    c = jnp.cos(frame_yaw)
    s = jnp.sin(frame_yaw)
    x = local_xy[..., 0]
    y = local_xy[..., 1]
    return jnp.stack([c * x - s * y, s * x + c * y], axis=-1)
