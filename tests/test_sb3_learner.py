"""Masked-rollout-buffer IPPO stack: NaN-GAE semantics, valid-sample
filtering, dead-agent obs nan-padding, and an end-to-end learn() smoke run
(reference: gpudrive/integrations/sb3/{ppo,rollout_buffer}.py)."""

import os

import numpy as np
import pytest

from gpudrive_lab_tpu.env.config import EnvConfig
from gpudrive_lab_tpu.env.dataset import SceneDataLoader
from gpudrive_lab_tpu.env.wrappers.sb3_learner import (
    IPPO,
    IPPOConfig,
    MaskedRolloutBuffer,
)
from gpudrive_lab_tpu.env.wrappers.sb3_wrapper import SB3MultiAgentEnv


def test_masked_gae_matches_reference_nan_semantics():
    """NaN rewards/values contribute zero, NaN dones/episode-starts count as
    terminal — the reference's EDIT_1..EDIT_4 (rollout_buffer.py:126-178)."""
    T, N = 4, 2
    buf = MaskedRolloutBuffer(T, N, obs_dim=3, gamma=0.9, gae_lambda=0.8)
    rng = np.random.default_rng(0)
    rewards = rng.normal(size=(T, N)).astype(np.float32)
    values = rng.normal(size=(T, N)).astype(np.float32)
    # env 1 dies at t=2: rewards/values NaN from then on
    rewards[2:, 1] = np.nan
    values[2:, 1] = np.nan
    starts = np.zeros((T, N), np.float32)
    for t in range(T):
        buf.add(np.zeros((N, 3)), np.zeros(N, np.int64), rewards[t],
                starts[t], values[t], np.zeros(N))
    last_values = np.array([0.5, np.nan], np.float32)
    buf.compute_returns_and_advantage(last_values, np.zeros(N, np.float32))

    # manual reference recurrence with nan_to_num patches
    adv_ref = np.zeros((T, N))
    last_gae = 0.0
    for step in reversed(range(T)):
        if step == T - 1:
            nnt = 1.0 - np.nan_to_num(np.zeros(N), nan=1.0)
            nv = last_values
        else:
            nnt = 1.0 - np.nan_to_num(starts[step + 1], nan=1.0)
            nv = values[step + 1]
        delta = (
            np.nan_to_num(rewards[step], nan=0.0)
            + np.nan_to_num(0.9 * nv * nnt, nan=0.0)
            - np.nan_to_num(values[step], nan=0.0)
        )
        last_gae = delta + 0.9 * 0.8 * nnt * last_gae
        adv_ref[step] = last_gae
    np.testing.assert_allclose(buf.advantages, adv_ref, rtol=1e-6)
    assert np.isfinite(buf.advantages).all()


def test_masked_buffer_filters_invalid_samples():
    T, N = 3, 4
    buf = MaskedRolloutBuffer(T, N, obs_dim=2)
    for t in range(T):
        r = np.full(N, 1.0, np.float32)
        r[t % N] = np.nan  # one dead agent per step
        obs = np.full((N, 2), float(t), np.float32)
        obs[t % N] = np.nan
        buf.add(obs, np.arange(N), r, np.zeros(N), np.zeros(N), np.zeros(N))
    buf.compute_returns_and_advantage(np.zeros(N, np.float32),
                                      np.zeros(N, np.float32))
    assert buf.num_valid_samples == T * N - T
    batches = list(buf.get(batch_size=None))
    assert sum(len(b["obs"]) for b in batches) == T * N - T
    for b in batches:
        assert np.isfinite(b["obs"]).all()
        assert np.isfinite(b["ret"]).all()


@pytest.fixture(scope="module")
def sb3_env(example_scene_paths):
    loader = SceneDataLoader(
        root=os.path.dirname(example_scene_paths[0]), batch_size=2,
        dataset_size=4,
    )
    cfg = EnvConfig(
        num_worlds=2, collision_behavior="ignore",
        reward_type="sparse_on_goal_achieved",
    )
    return SB3MultiAgentEnv(cfg, data_loader=loader)


def test_dead_agent_obs_nan_padded(sb3_env):
    obs = sb3_env.reset()
    assert np.isfinite(obs).all()
    sb3_env.dead_agent_mask[0] = True
    obs2 = sb3_env._obs()
    assert np.isnan(obs2[0]).all()
    assert np.isfinite(obs2[~sb3_env.dead_agent_mask]).all()


def test_ippo_learn_smoke(sb3_env):
    import jax

    learner = IPPO(
        sb3_env,
        IPPOConfig(n_steps=6, batch_size=32, n_epochs=1, ent_coef=1e-3),
    )
    before = np.array(jax.tree.leaves(learner.variables)[0]).copy()
    history = learner.learn(total_timesteps=2 * 6 * sb3_env.num_envs)
    assert len(history) >= 1
    for m in history:
        for k in ("pg_loss", "v_loss", "entropy", "approx_kl"):
            assert np.isfinite(m[k]), (k, m)
        assert m["valid_samples"] > 0
    after = np.array(jax.tree.leaves(learner.variables)[0])
    assert not np.allclose(before, after), "params did not update"
