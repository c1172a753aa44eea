"""VBD integration tests: trajectory sources, egocentric obs block, reward
shaping, and the sample-batch builder."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gpudrive_lab_tpu import constants as C
from gpudrive_lab_tpu.core import step as stepmod
from gpudrive_lab_tpu.core.types import Params
from gpudrive_lab_tpu.env.config import EnvConfig
from gpudrive_lab_tpu.env.env_jax import GPUDriveTPUEnv
from gpudrive_lab_tpu.scene.synthetic import synthetic_scene
from gpudrive_lab_tpu.vbd.data_utils import VBDSampleConfig, process_scenario_data
from gpudrive_lab_tpu.vbd.integration import (
    LogReplaySource,
    egocentric_vbd_obs,
    log_replay_trajectories,
    vbd_distance_reward,
)


def test_egocentric_vbd_obs_identity_frame():
    scene = synthetic_scene(num_worlds=1, num_agents=4, num_roads=8)
    state = jax.jit(stepmod.reset, static_argnames="params")(
        scene, None, Params()
    )
    traj = log_replay_trajectories(scene, state)
    assert traj.shape == (1, C.MAX_AGENTS, C.TRAJECTORY_LEN, 5)
    ego = np.asarray(egocentric_vbd_obs(state, traj))
    assert ego.shape == (1, C.MAX_AGENTS, C.TRAJECTORY_LEN * 5)
    # agents have yaw 0 at start of the synthetic scene: first waypoint of
    # its own trajectory is the agent position -> ego-frame (0, 0)
    first = ego[0, 0, :5]
    np.testing.assert_allclose(first[:2], 0.0, atol=1e-4)
    # ego-frame forward velocity = 5 m/s
    np.testing.assert_allclose(first[3], 5.0, atol=1e-4)


def test_vbd_distance_reward_decays():
    scene = synthetic_scene(num_worlds=1, num_agents=2, num_roads=8)
    state = jax.jit(stepmod.reset, static_argnames="params")(
        scene, None, Params()
    )
    traj = log_replay_trajectories(scene, state)
    r_on = np.asarray(
        vbd_distance_reward(state, traj, jnp.zeros(1, jnp.int32), 1.0)
    )
    # on-trajectory reward = exp(0) = 1
    np.testing.assert_allclose(r_on[0, :2], 1.0, atol=1e-5)
    shifted = traj.at[..., 0].add(3.0)
    r_off = np.asarray(
        vbd_distance_reward(state, shifted, jnp.zeros(1, jnp.int32), 1.0)
    )
    assert (r_off[0, :2] < r_on[0, :2]).all()


def test_env_vbd_obs_and_reward(reference_scene_path):
    env = GPUDriveTPUEnv(
        EnvConfig(num_worlds=1, use_vbd=True, vbd_in_obs=True,
                  reward_type="distance_to_vdb_trajs"),
        scene_paths=[reference_scene_path],
    )
    env.set_vbd_trajectories(LogReplaySource())
    obs = env.get_obs()
    assert obs.shape[-1] == 3368 + 455
    r = env.get_rewards()
    assert np.isfinite(np.asarray(r)).all()


def test_process_scenario_data(reference_scene_path):
    env = GPUDriveTPUEnv(
        EnvConfig(num_worlds=1), scene_paths=[reference_scene_path]
    )
    batch = process_scenario_data(
        env.scene, env.state, current_step=10,
        config=VBDSampleConfig(max_agents=8),
    )
    assert batch["agents_history"].shape == (1, 8, 11, 8)
    assert batch["agents_id"].shape == (1, 8)
    # slot 0 is the nearest agent to the SDC: the SDC itself
    assert batch["agents_id"][0, 0] == 0
    assert batch["polylines"].shape[0] == 1
    assert (batch["agents_interested"] >= 0).all()
