"""Expert-replay determinism contract.

Mirror of the reference's closed-loop acceptance test
(reference: tests/test_expert.py): an all-expert simulation of the pytest
scene must drive every vehicle to its goal with zero collision flags.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpudrive_lab_tpu import constants as C
from gpudrive_lab_tpu.core import step as stepmod
from gpudrive_lab_tpu.core.types import (
    CollisionBehaviour,
    DynamicsModel,
    Params,
    RewardType,
)
from gpudrive_lab_tpu.scene.compiler import build_scene

PARAMS = Params(
    dynamics_model=DynamicsModel.CLASSIC,
    collision_behaviour=CollisionBehaviour.AGENT_STOP,
    reward_type=RewardType.DISTANCE_BASED,
    dist_to_goal_threshold=1.0,
    observation_radius=10.0,
    polyline_reduction_threshold=0.5,
    ignore_non_vehicles=True,
    max_num_controlled_agents=0,
)


@pytest.fixture(scope="module")
def replay_result(reference_scene_path):
    scene = build_scene([reference_scene_path], PARAMS)
    reset_fn = jax.jit(stepmod.reset, static_argnames="params")
    step_fn = jax.jit(stepmod.step, static_argnames="params")
    state = reset_fn(scene, None, PARAMS)
    acts = jnp.zeros((1, C.MAX_AGENTS, C.ACTION_DIM))
    n = 0
    while not np.asarray(state.done).all() and n < 120:
        state = step_fn(scene, state, acts, PARAMS)
        n += 1
    return scene, state, n


def test_episode_terminates_at_horizon(replay_result):
    _, _, n = replay_result
    assert n == C.EPISODE_LEN


def test_goal_reaching(replay_result):
    scene, state, _ = replay_result
    veh = np.asarray(scene.agents.valid) & (
        np.asarray(scene.agents.etype) == C.ET_VEHICLE
    )
    reached = np.asarray(state.reached_goal)
    assert (reached * veh).sum() == veh.sum()


def test_collision_rate(replay_result):
    scene, state, _ = replay_result
    veh = np.asarray(scene.agents.valid) & (
        np.asarray(scene.agents.etype) == C.ET_VEHICLE
    )
    collisions = (
        np.asarray(state.collided_road) * veh
        + np.asarray(state.collided_vehicle) * veh
        + np.asarray(state.collided_non_vehicle) * veh
    ).sum()
    assert collisions == 0


def test_replay_is_deterministic(reference_scene_path):
    scene = build_scene([reference_scene_path], PARAMS)
    step_fn = jax.jit(stepmod.step, static_argnames="params")
    acts = jnp.zeros((1, C.MAX_AGENTS, C.ACTION_DIM))

    def rollout():
        state = jax.jit(stepmod.reset, static_argnames="params")(
            scene, None, PARAMS
        )
        traj = []
        for _ in range(20):
            state = step_fn(scene, state, acts, PARAMS)
            traj.append(np.asarray(state.pos))
        return np.stack(traj)

    a, b = rollout(), rollout()
    np.testing.assert_array_equal(a, b)
