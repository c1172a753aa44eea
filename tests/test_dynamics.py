"""Dynamics contract tests.

(a) Classic-bicycle recurrence validated against an independent scalar
    reference implementation, mirroring tests/bicyclemodel.cpp:84-242 which
    re-derives the model locally and checks the sim step-by-step (eps 1e-3).
(b) Forward(inverse(log)) round-trips for DeltaLocal and InvertibleBicycle on
    a real scene, mirroring tests/test_delta_model.py and
    tests/test_waymax_model.py tolerances.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpudrive_lab_tpu.core import dynamics
from gpudrive_lab_tpu.core import step as stepmod
from gpudrive_lab_tpu.core.types import (
    CollisionBehaviour,
    DynamicsModel,
    Params,
    RewardType,
)
from gpudrive_lab_tpu.scene.compiler import build_scene


def scalar_classic_step(x, y, yaw, speed, accel, steer, length):
    """Independent reference recurrence (the analogue of StepBicycleModel in
    tests/bicyclemodel.cpp:187-242)."""
    dt = 0.1
    v = speed + 0.5 * accel * dt
    tan_delta = math.tan(steer)
    beta = math.atan(0.5 * tan_delta)
    w = v * math.cos(beta) * tan_delta / length
    x += v * math.cos(yaw + beta) * dt
    y += v * math.sin(yaw + beta) * dt
    yaw = math.atan2(math.sin(yaw + w * dt), math.cos(yaw + w * dt))
    speed = speed + accel * dt
    return x, y, yaw, speed


def test_classic_matches_scalar_recurrence():
    rng = np.random.default_rng(7)
    length = 4.2
    x, y, yaw, speed = 1.0, -2.0, 0.3, 5.0
    fwd = jax.jit(dynamics.forward_classic)
    pos = jnp.array([[x, y]])
    jyaw = jnp.array([yaw])
    vel = jnp.array([[speed * math.cos(yaw), speed * math.sin(yaw)]])
    for _ in range(10):
        accel = float(rng.uniform(-4, 4))
        steer = float(rng.uniform(-0.6, 0.6))
        act = jnp.array([[accel, steer, 0.0] + [0.0] * 7])
        pos, jyaw, vel, _ = fwd(act, jnp.array([length]), pos, jyaw, vel)
        x, y, yaw, speed = scalar_classic_step(x, y, yaw, speed, accel, steer, length)
        p = np.asarray(pos)[0]
        assert abs(p[0] - x) < 1e-3 and abs(p[1] - y) < 1e-3
        assert abs(float(np.asarray(jyaw)[0]) - yaw) < 1e-3
        assert abs(float(np.linalg.norm(np.asarray(vel)[0])) - abs(speed)) < 1e-3


def _roundtrip(reference_scene_path, model, pos_tol, yaw_tol, speed_tol):
    params = Params(
        dynamics_model=model,
        collision_behaviour=CollisionBehaviour.AGENT_STOP,
        reward_type=RewardType.DISTANCE_BASED,
        dist_to_goal_threshold=1.0,
        observation_radius=10.0,
        polyline_reduction_threshold=0.5,
        ignore_non_vehicles=True,
        max_num_controlled_agents=2,
    )
    scene = build_scene([reference_scene_path], params)
    reset_fn = jax.jit(stepmod.reset, static_argnames="params")
    step_fn = jax.jit(stepmod.step, static_argnames="params")
    state = reset_fn(scene, None, params)

    i = 1  # the second agent is controlled (mirrors test_delta_model.py:33)
    traj_pos = np.asarray(scene.agents.traj_pos)[0, i]
    traj_yaw = np.asarray(scene.agents.traj_yaw)[0, i]
    traj_vel = np.asarray(scene.agents.traj_vel)[0, i]
    assert bool(np.asarray(scene.agents.controlled)[0, i])

    # Initial state matches log step 0
    np.testing.assert_allclose(np.asarray(state.pos)[0, i], traj_pos[0], atol=1e-2)
    assert abs(float(np.asarray(state.yaw)[0, i]) - traj_yaw[0]) < 1e-2

    a = jnp.zeros((1, 128, 10)).at[0, i].set(scene.agents.traj_inv_actions[0, i, 0])
    state = step_fn(scene, state, a, params)

    np.testing.assert_allclose(
        np.asarray(state.pos)[0, i], traj_pos[1], atol=pos_tol
    )
    assert abs(float(np.asarray(state.yaw)[0, i]) - traj_yaw[1]) < yaw_tol
    speed = float(np.linalg.norm(np.asarray(state.vel)[0, i]))
    assert abs(speed - np.linalg.norm(traj_vel[1])) < speed_tol


def test_forward_inverse_delta(reference_scene_path):
    """reference: tests/test_delta_model.py:30-61 tolerances."""
    _roundtrip(
        reference_scene_path, DynamicsModel.DELTA_LOCAL, 2e-2, 3e-3, 1e-3
    )


def test_forward_inverse_bicycle(reference_scene_path):
    """reference: tests/test_waymax_model.py (same structure).

    Heading tolerance is 1e-2 rather than the reference's 3e-3: with
    useEstimatedYaw=true (src/consts.hpp:15) the inverse model targets
    atan2(v_{t+1}) instead of the logged heading (src/dynamics.hpp:131-134),
    and on this scene |atan2(v_1) - heading_1| = 0.0089 for the controlled
    agent — the replayed yaw lands exactly on the estimated yaw, 0.0089 off
    the log, in the reference C++ as well."""
    _roundtrip(
        reference_scene_path, DynamicsModel.INVERTIBLE_BICYCLE, 2e-2, 1e-2, 1e-3
    )


def test_state_model_teleports():
    act = jnp.zeros((1, 1, 10)).at[0, 0].set(
        jnp.array([5.0, -3.0, 1.0, 0.7, 2.0, 0.5, 0.0, 0.0, 0.0, 0.1])
    )
    pos, yaw, vel, w = jax.jit(dynamics.forward_state)(act)
    np.testing.assert_allclose(np.asarray(pos)[0, 0], [5.0, -3.0])
    assert float(np.asarray(yaw)[0, 0]) == pytest.approx(0.7)
    np.testing.assert_allclose(np.asarray(vel)[0, 0], [2.0, 0.5])
    assert float(np.asarray(w)[0, 0]) == pytest.approx(0.1)


def test_bicycle_clips_action():
    act = jnp.array([[100.0, -100.0] + [0.0] * 8])
    pos = jnp.zeros((1, 2))
    yaw = jnp.zeros(1)
    vel = jnp.zeros((1, 2))
    p1, y1, v1, _ = jax.jit(dynamics.forward_invertible_bicycle)(act, pos, yaw, vel)
    # accel clipped to 6: dx = 0.5*6*0.01 = 0.03, speed = 0.6
    assert float(np.asarray(p1)[0, 0]) == pytest.approx(0.03, abs=1e-6)
    assert float(np.linalg.norm(np.asarray(v1)[0])) == pytest.approx(0.6, abs=1e-5)
