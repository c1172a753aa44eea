"""Tests for the SB3-style VecEnv adapter and the MARL dict-per-agent
wrapper, plus reward-conditioning presets."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gpudrive_lab_tpu.env.config import EnvConfig
from gpudrive_lab_tpu.env.dataset import SceneDataLoader
from gpudrive_lab_tpu.env.env_jax import GPUDriveTPUEnv
from gpudrive_lab_tpu.env.wrappers.marl_wrapper import GPUDriveMARLEnv
from gpudrive_lab_tpu.env.wrappers.sb3_wrapper import SB3MultiAgentEnv


def test_sb3_wrapper(example_scene_paths):
    loader = SceneDataLoader(
        root=os.path.dirname(example_scene_paths[0]),
        batch_size=2, dataset_size=4,
    )
    env = SB3MultiAgentEnv(
        EnvConfig(num_worlds=2, reward_type="weighted_combination",
                  collision_weight=-0.75, off_road_weight=-0.75),
        loader,
    )
    obs = env.reset()
    assert obs.shape == (env.num_envs, env.obs_dim)
    rng = np.random.default_rng(0)
    for _ in range(3):
        obs, rew, dones, infos = env.step(
            rng.integers(0, env.action_space.n, env.num_envs)
        )
    assert rew.shape == (env.num_envs,)
    assert len(infos) == env.num_envs
    env.resample_scenario_batch()
    assert env.reset().shape[1] == env.obs_dim


def test_marl_wrapper(reference_scene_path):
    base = GPUDriveTPUEnv(
        EnvConfig(num_worlds=1, max_controlled_agents=3),
        scene_paths=[reference_scene_path],
    )
    env = GPUDriveMARLEnv(base.scene, base.params, base.action_keys)
    assert env.num_agents >= 1
    obs, state = env.reset()
    assert set(obs) == set(env.agents)
    acts = {n: jnp.int32(0) for n in env.agents}
    obs2, state, rewards, dones, infos = env.step_env(None, state, acts)
    assert set(rewards) == set(env.agents)
    assert "__all__" in dones
    assert obs2[env.agents[0]].shape == (env.observation_space_dim(),)


def test_reward_conditioned_presets(example_scene_paths):
    env = GPUDriveTPUEnv(
        EnvConfig(num_worlds=1, reward_type="reward_conditioned"),
        scene_paths=example_scene_paths[:1],
    )
    obs = env.reset(condition_mode="preset", agent_type="cautious")
    # ego features gain the 3 weight columns
    assert obs.shape[-1] == 9 + 127 * 6 + 200 * 13
    w = np.asarray(env.reward_weights)
    cfg = env.config
    np.testing.assert_allclose(w[..., 0], cfg.collision_weight_lb * 0.9)
    np.testing.assert_allclose(w[..., 1], cfg.goal_achieved_weight_ub * 0.7)
    env.reset(condition_mode="fixed", agent_type=[-1.0, 2.0, -0.5])
    np.testing.assert_allclose(
        np.asarray(env.reward_weights)[..., 1], 2.0
    )
    env.reset(condition_mode="random")
    w = np.asarray(env.reward_weights)
    assert (w[..., 0] >= cfg.collision_weight_lb - 1e-6).all()
    assert (w[..., 0] <= cfg.collision_weight_ub + 1e-6).all()


def test_sb3_info_dict_at_episode_end(example_scene_paths):
    """info_dict fills with the reference's episode-end counters when a world
    completes (reference: sb3_wrapper.py:288-318)."""
    loader = SceneDataLoader(
        root=os.path.dirname(example_scene_paths[0]),
        batch_size=2, dataset_size=4,
    )
    env = SB3MultiAgentEnv(
        EnvConfig(num_worlds=2, reward_type="weighted_combination",
                  collision_weight=-0.75, off_road_weight=-0.75),
        loader,
    )
    env.reset()
    for i in range(91):  # time-limit truncation ends every world
        _, _, _, infos = env.step(np.zeros(env.num_envs, np.int64))
        if env.num_episodes:
            break
    assert env.num_episodes >= 1
    keys = {"off_road", "veh_collisions", "non_veh_collision",
            "goal_achieved", "num_controlled_agents", "truncated"}
    assert keys <= set(env.info_dict)
    n = env.info_dict["num_controlled_agents"]
    assert n >= 1
    # terminal-event counts and survivors are bounded by the agent count
    assert 0 <= env.info_dict["goal_achieved"] <= n
    assert 0 <= env.info_dict["truncated"] <= n
    if i == 90 and env.num_episodes == env.num_worlds:
        # every world ran the full episode, so every controlled agent that
        # was still alive before the final step is a truncation (the
        # reference's "done without reward" counter) — the exact count, not
        # just a bound.  Regression for world_time_steps freezing below the
        # limit, which pinned this counter at 0.
        survivors = sum(not d["dead"] for d in infos)
        assert env.info_dict["truncated"] == survivors > 0


def test_sb3_render_videos(example_scene_paths, tmp_path):
    """render=True accumulates frames and flushes a video per finished world
    (reference: sb3_wrapper.py render_env / log_video_to_wandb)."""
    loader = SceneDataLoader(
        root=os.path.dirname(example_scene_paths[0]),
        batch_size=2, dataset_size=4,
    )
    env = SB3MultiAgentEnv(
        EnvConfig(num_worlds=2, reward_type="weighted_combination"),
        loader, render=True, render_k_scenarios=1,
        video_dir=str(tmp_path),
    )
    env.reset()
    for _ in range(3):
        env.step(np.zeros(env.num_envs, np.int64))
    assert len(env._frames[0]) == 3
    env._flush_videos(np.array([0]))
    gifs = list(tmp_path.glob("*.gif"))
    assert len(gifs) == 1 and gifs[0].stat().st_size > 0
    assert 0 not in env._frames
