"""Env-layer tests: gym-style API, discrete action mapping, obs layout,
frame stacking, scene swapping (reference smoke test: tests/test_gpudrive.py
plus env_torch behaviors)."""

import jax.numpy as jnp
import os

import numpy as np
import pytest

from gpudrive_lab_tpu import constants as C
from gpudrive_lab_tpu.env.config import EnvConfig
from gpudrive_lab_tpu.env.dataset import SceneDataLoader
from gpudrive_lab_tpu.env.env_jax import GPUDriveTPUEnv


@pytest.fixture(scope="module")
def env(example_scene_paths):
    loader = SceneDataLoader(
        root=os.path.dirname(example_scene_paths[0]),
        batch_size=2,
        dataset_size=4,
    )
    cfg = EnvConfig(
        num_worlds=2,
        reward_type="weighted_combination",
        collision_weight=-0.5,
        off_road_weight=-0.5,
    )
    return GPUDriveTPUEnv(cfg, data_loader=loader)


def test_obs_shape_and_dim(env):
    obs = env.reset()
    assert obs.shape == (2, C.MAX_AGENTS, 3368)
    assert env.observation_dim == 3368
    assert np.isfinite(np.asarray(obs)).all()


def test_action_table_cartesian_order(env):
    # delta_local: product(dx, dy, dyaw), row-major — index 0 is
    # (dx[0], dy[0], dyaw[0]); index 1 increments dyaw first.
    t = np.asarray(env.action_keys)
    assert env.action_space_n == 20 * 20 * 20
    cfg = env.config
    np.testing.assert_allclose(t[0], [cfg.dx[0], cfg.dy[0], cfg.dyaw[0]])
    np.testing.assert_allclose(t[1], [cfg.dx[0], cfg.dy[0], cfg.dyaw[1]])
    np.testing.assert_allclose(t[20], [cfg.dx[0], cfg.dy[1], cfg.dyaw[0]])


def test_random_steps(env):
    env.reset()
    rng = np.random.default_rng(0)
    for _ in range(10):
        acts = rng.integers(0, env.action_space_n, (2, C.MAX_AGENTS))
        env.step_dynamics(jnp.asarray(acts))
        r = env.get_rewards()
        d = env.get_dones()
        o = env.get_obs()
    assert np.asarray(r).shape == (2, C.MAX_AGENTS)
    assert np.asarray(d).shape == (2, C.MAX_AGENTS)
    assert np.isfinite(np.asarray(o)).all()
    # rewards zero for invalid agents
    valid = np.asarray(env.scene.agents.valid)
    assert (np.asarray(r)[~valid] == 0).all()


def test_controlled_mask_and_infos(env):
    env.reset()
    mask = env.get_controlled_agents_mask()
    valid = np.asarray(env.scene.agents.valid)
    assert (mask <= valid).all()
    infos = env.get_infos()
    for key in ("off_road", "collided", "goal_achieved", "type"):
        assert np.asarray(infos[key]).shape == (2, C.MAX_AGENTS)


def test_frame_stacking(example_scene_paths):
    cfg = EnvConfig(num_worlds=1, num_stack=3)
    env = GPUDriveTPUEnv(cfg, scene_paths=example_scene_paths[:1])
    obs = env.reset()
    assert obs.shape[-1] == 3 * 3368
    # on reset, frames 0..1 are zero, frame 2 is current
    o = np.asarray(obs)
    assert (o[..., : 2 * 3368] == 0).all()
    env.step_dynamics(jnp.zeros((1, C.MAX_AGENTS), jnp.int32))
    o2 = np.asarray(env.get_obs())
    np.testing.assert_array_equal(o2[..., 3368 : 2 * 3368], o[..., 2 * 3368 :])


def test_swap_data_batch(env):
    names_before = env.get_env_filenames()
    env.swap_data_batch()
    names_after = env.get_env_filenames()
    assert names_before != names_after
    obs = env.get_obs()
    assert obs.shape == (2, C.MAX_AGENTS, 3368)


def test_expert_actions_shapes(env):
    acts, pos, vel, yaw, valids = env.get_expert_actions()
    assert np.asarray(acts).shape == (2, C.MAX_AGENTS, 91, 10)
    a = np.asarray(acts)
    assert (a[..., 0] >= -6 - 1e-6).all() and (a[..., 0] <= 6 + 1e-6).all()


def test_partner_and_road_masks(env):
    env.reset()
    pm = np.asarray(env.get_partner_mask())
    rm = np.asarray(env.get_road_mask())
    assert pm.shape == (2, C.MAX_AGENTS, C.MAX_AGENTS - 1)
    assert rm.shape == (2, C.MAX_AGENTS, C.MAX_AGENT_MAP_OBS)
    assert set(np.unique(pm)).issubset({0, 1, 2})
