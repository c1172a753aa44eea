"""Agent-axis bucketing: a scene compiled with agent_bucket='auto' must be
indistinguishable from the fixed 128-row layout on every real agent row —
observations bitwise (the 3368-float ABI keeps 127 partner slots via raw
nonexistent-row padding), dynamics, collisions, masks, rewards.

TPU extension (not in the reference): real WOMD scenes average ~35 created
agents, so the kMaxAgentCount=128 padding costs ~3.7x in every agent-axis
op.  Agents are created densely from slot 0, so slicing is lossless.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpudrive_lab_tpu.env.config import EnvConfig
from gpudrive_lab_tpu.env.env_jax import GPUDriveTPUEnv
from gpudrive_lab_tpu.scene.compiler import build_scene


@pytest.fixture(scope="module")
def envs(example_scene_paths):
    paths = example_scene_paths[:4]
    kw = dict(
        reward_type="weighted_combination", collision_weight=-0.75,
        off_road_weight=-0.75, goal_achieved_weight=1.0,
        dynamics_model="classic", collision_behavior="ignore",
    )
    env_b = GPUDriveTPUEnv(
        EnvConfig(num_worlds=len(paths), agent_bucket="auto", **kw),
        scene_paths=paths,
    )
    env_f = GPUDriveTPUEnv(
        EnvConfig(num_worlds=len(paths), **kw), scene_paths=paths
    )
    return env_b, env_f


def test_bucket_shape_and_obs_abi(envs):
    env_b, env_f = envs
    A = env_b.max_agent_count
    assert A < 128 and A % 16 == 0
    obs_b = np.asarray(env_b.reset())
    obs_f = np.asarray(env_f.reset())
    assert obs_b.shape == (env_b.num_worlds, A, 3368)  # ABI feature width
    np.testing.assert_array_equal(obs_b, obs_f[:, :A])
    np.testing.assert_array_equal(
        np.asarray(env_b.get_partner_mask()),
        np.asarray(env_f.get_partner_mask())[:, :A],
    )
    np.testing.assert_array_equal(
        np.asarray(env_b.get_road_mask()),
        np.asarray(env_f.get_road_mask())[:, :A],
    )


def test_bucket_step_equivalence(envs):
    env_b, env_f = envs
    A = env_b.max_agent_count
    env_b.reset()
    env_f.reset()
    rng = np.random.default_rng(0)
    for t in range(5):
        acts = rng.integers(0, env_f.action_space_n, (env_f.num_worlds, 128))
        env_f.step_dynamics(acts)
        env_b.step_dynamics(acts)  # full-128 ABI actions sliced internally
    np.testing.assert_allclose(
        np.asarray(env_b.state.pos), np.asarray(env_f.state.pos)[:, :A]
    )
    np.testing.assert_array_equal(
        np.asarray(env_b.state.collided),
        np.asarray(env_f.state.collided)[:, :A],
    )
    np.testing.assert_array_equal(
        np.asarray(env_b.get_obs()), np.asarray(env_f.get_obs())[:, :A]
    )
    np.testing.assert_allclose(
        np.asarray(env_b.get_rewards()),
        np.asarray(env_f.get_rewards())[:, :A],
    )
    np.testing.assert_array_equal(
        np.asarray(env_b.get_dones()), np.asarray(env_f.get_dones())[:, :A]
    )


def test_bucket_expert_replay_contract(example_scene_paths):
    """All-expert replay still reaches every goal collision-free with the
    bucketed agent axis (the canonical verify contract)."""
    from gpudrive_lab_tpu.core import step as stepmod
    from gpudrive_lab_tpu.core.types import (
        CollisionBehaviour, DynamicsModel, Params, RewardType,
    )

    params = Params(
        dynamics_model=DynamicsModel.CLASSIC,
        collision_behaviour=CollisionBehaviour.AGENT_STOP,
        reward_type=RewardType.DISTANCE_BASED,
        dist_to_goal_threshold=1.0, observation_radius=10.0,
        polyline_reduction_threshold=0.5, ignore_non_vehicles=True,
        max_num_controlled_agents=0,
    )
    scene = build_scene(
        ["/root/reference/tests/pytest_data/test.json"], params,
        max_agents="auto",
    )
    A = scene.agents.valid.shape[1]
    assert A < 128
    step_fn = jax.jit(stepmod.step, static_argnames="params")
    state = jax.jit(stepmod.reset, static_argnames="params")(
        scene, None, params
    )
    acts = jnp.zeros((1, A, 10))
    for _ in range(91):
        state = step_fn(scene, state, acts, params)
    veh = np.asarray(scene.agents.valid[0]) & (
        np.asarray(scene.agents.etype[0]) == 7
    )
    assert np.asarray(state.reached_goal[0])[veh].all()
    assert (np.asarray(state.collided[0])[veh] == 0).all()


def test_bucket_rejects_undersized_cap(example_scene_paths):
    params = EnvConfig(num_worlds=1).sim_params()
    with pytest.raises(ValueError):
        build_scene(example_scene_paths[:1], params, max_agents=1)
