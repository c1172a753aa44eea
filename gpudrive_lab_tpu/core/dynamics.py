"""Vehicle dynamics models.

Vectorized [W, A] re-implementations of the four forward models and two
inverse models (reference: src/dynamics.hpp).  All models use dt=0.1
(hardcoded in the reference, src/dynamics.hpp:14,58,87,119) regardless of the
physics deltaT.

Each forward model maps (action, kinematic state) -> kinematic state where the
state is (pos[...,2], yaw, vel[...,2], ang_vel).  Actions arrive as the
10-float union rows of the action tensor (reference: src/types.hpp:109-145):
classic/bicycle read [accel, steer, head_angle], delta reads [dx, dy, dyaw],
state reads [x, y, z, yaw, vx, vy, vz, wx, wy, wz].
"""

import jax.numpy as jnp

from gpudrive_lab_tpu import constants as C
from gpudrive_lab_tpu.core.geometry import (
    angle_add,
    normalize_angle,
    rotate_out_of_frame,
)

DT = C.DYNAMICS_DT


def forward_classic(action, length, pos, yaw, vel):
    """Nocturne-style kinematic bicycle ("Classic"), average-speed variant
    (reference: src/dynamics.hpp:11-50)."""
    accel = action[..., 0]
    steer = action[..., 1]
    speed = jnp.linalg.norm(vel, axis=-1)
    v = speed + 0.5 * accel * DT  # average speed over the step
    tan_delta = jnp.tan(steer)
    beta = jnp.arctan(0.5 * tan_delta)  # center of mass at mid-length
    d = jnp.stack(
        [v * jnp.cos(yaw + beta), v * jnp.sin(yaw + beta)], axis=-1
    )
    w = v * jnp.cos(beta) * tan_delta / length
    new_yaw = angle_add(yaw, w * DT)
    new_speed = speed + accel * DT
    new_pos = pos + d * DT
    new_vel = jnp.stack(
        [new_speed * jnp.cos(new_yaw), new_speed * jnp.sin(new_yaw)], axis=-1
    )
    return new_pos, new_yaw, new_vel, w


def forward_invertible_bicycle(action, pos, yaw, vel):
    """Waymax-style invertible bicycle; accel clipped to +-6, steering to +-3
    (reference: src/dynamics.hpp:52-81)."""
    accel = jnp.clip(action[..., 0], -6.0, 6.0)
    steer = jnp.clip(action[..., 1], -3.0, 3.0)
    speed = jnp.linalg.norm(vel, axis=-1)
    new_x = pos[..., 0] + vel[..., 0] * DT + 0.5 * accel * jnp.cos(yaw) * DT * DT
    new_y = pos[..., 1] + vel[..., 1] * DT + 0.5 * accel * jnp.sin(yaw) * DT * DT
    delta_yaw = steer * (speed * DT + 0.5 * accel * DT * DT)
    new_yaw = angle_add(yaw, delta_yaw)
    new_speed = speed + accel * DT
    new_vel = jnp.stack(
        [new_speed * jnp.cos(new_yaw), new_speed * jnp.sin(new_yaw)], axis=-1
    )
    return jnp.stack([new_x, new_y], axis=-1), new_yaw, new_vel, delta_yaw / DT


def forward_delta_local(action, pos, yaw, vel):
    """Ego-frame displacement model (reference: src/dynamics.hpp:83-115)."""
    local = action[..., 0:2]
    dyaw = action[..., 2]
    d = rotate_out_of_frame(local, yaw)
    new_pos = pos + d
    new_vel = d / DT
    new_yaw = angle_add(yaw, dyaw)
    return new_pos, new_yaw, new_vel, dyaw / DT


def forward_state(action):
    """Teleport to an absolute state, no clipping
    (reference: src/dynamics.hpp:186-194)."""
    new_pos = action[..., 0:2]
    new_yaw = action[..., 3]
    new_vel = action[..., 4:6]
    ang_vel = action[..., 9]
    return new_pos, new_yaw, new_vel, ang_vel


def inverse_bicycle(vel, yaw, target_vel, target_yaw):
    """Recover (accel, steer) mapping state_t -> state_{t+1}
    (reference: src/dynamics.hpp:117-149).  With USE_ESTIMATED_YAW the target
    yaw is taken from the target velocity direction."""
    speed = jnp.linalg.norm(vel, axis=-1)
    target_speed = jnp.linalg.norm(target_vel, axis=-1)
    accel = (target_speed - speed) / DT
    yaw_n = normalize_angle(yaw)
    if C.USE_ESTIMATED_YAW:
        tgt = jnp.arctan2(target_vel[..., 1], target_vel[..., 0])
    else:
        tgt = normalize_angle(target_yaw)
    denom = speed * DT + 0.5 * accel * DT * DT
    steering = jnp.where(denom != 0.0, (tgt - yaw_n) / jnp.where(denom == 0, 1.0, denom), 0.0)
    zeros = jnp.zeros_like(accel)
    return jnp.stack([accel, steering, zeros], axis=-1)


def inverse_delta(pos, yaw, target_pos, target_yaw):
    """Recover (dx, dy, dyaw) in the ego frame; the *global* delta is clipped
    to +-6 before rotation and the local delta clipped again, faithfully
    replicating the reference's double clip (src/dynamics.hpp:151-184)."""
    d = jnp.clip(target_pos - pos, -6.0, 6.0)
    dyaw = target_yaw - yaw
    # rotate into ego frame: R(-yaw)
    c = jnp.cos(-yaw)
    s = jnp.sin(-yaw)
    local_dx = d[..., 0] * c - d[..., 1] * s
    local_dy = d[..., 0] * s + d[..., 1] * c
    return jnp.stack(
        [
            jnp.clip(local_dx, -6.0, 6.0),
            jnp.clip(local_dy, -6.0, 6.0),
            normalize_angle(dyaw),
        ],
        axis=-1,
    )
