"""Linearized game dynamics for IBR/iLQ-style guidance.

JAX port of the reference's iLQGame utilities
(reference: gpudrive/integrations/vbd/sim_agent/guidance_metrics/ilqgame.py):
a one-action-block unicycle rollout and its (A, B) Jacobians, used by the
iterative-best-response guidance mode (sim_actor.py ibr_guidance).

States are [..., 5] = (x, y, theta, v_x, v_y); actions [..., 2] =
(accel, yaw_rate).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def wrap_angle(angle):
    return (angle + jnp.pi) % (2 * jnp.pi) - jnp.pi


@functools.partial(jax.jit, static_argnums=(2, 3))
def dynamics(current_states, actions, dt: float = 0.1, action_len: int = 2):
    """Apply one action held for ``action_len`` substeps; returns the final
    state (reference: ilqgame.py dynamics).  Velocity clamps at 0 and the
    yaw rate is zeroed below 0.1 m/s, matching the sampler's roll_out."""
    x = current_states[..., 0:1]
    y = current_states[..., 1:2]
    theta = current_states[..., 2:3]
    v = jnp.hypot(current_states[..., 3:4], current_states[..., 4:5])

    accel = jnp.repeat(actions[..., None, 0], action_len, axis=-1)
    yaw_rate = jnp.repeat(actions[..., None, 1], action_len, axis=-1)

    v = jnp.clip(v + jnp.cumsum(accel * dt, axis=-1), 0.0, None)
    yaw_rate = jnp.where(v > 0.1, yaw_rate, 0.0)
    theta = wrap_angle(jnp.cumsum(yaw_rate * dt, axis=-1) + theta)
    v_x = v * jnp.cos(theta)
    v_y = v * jnp.sin(theta)
    x = jnp.cumsum(v_x * dt, axis=-1) + x
    y = jnp.cumsum(v_y * dt, axis=-1) + y
    out = jnp.stack([x, y, theta, v_x, v_y], axis=-1)
    return out[..., -1, :]


@jax.jit
def linearize(state_start, pred_action):
    """Per-element Jacobians (A = df/dx [..., 5, 5], B = df/du [..., 5, 2])
    of ``dynamics`` (reference: ilqgame.py get_A_and_B)."""
    jac = jax.jacfwd(dynamics, argnums=(0, 1))
    for _ in state_start.shape[:-1]:
        jac = jax.vmap(jac)
    return jac(state_start, pred_action)
