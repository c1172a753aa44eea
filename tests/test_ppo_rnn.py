"""Recurrent PPO tests: LSTM policy carry semantics + BPTT train step."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gpudrive_lab_tpu import constants as C
from gpudrive_lab_tpu.core import step as stepmod
from gpudrive_lab_tpu.env.config import EnvConfig
from gpudrive_lab_tpu.env.env_jax import GPUDriveTPUEnv, ObsSpec
from gpudrive_lab_tpu.networks.late_fusion import (
    LateFusionLSTMPolicy,
    PolicyConfig,
)
from gpudrive_lab_tpu.ppo.ppo import PPOConfig
from gpudrive_lab_tpu.ppo.ppo_rnn import RnnCarry, make_rnn_ppo_funcs


def test_lstm_policy_carry_reset():
    cfg = PolicyConfig(action_dim=91)
    policy = LateFusionLSTMPolicy(cfg, lstm_hidden=32)
    obs = jnp.ones((4, cfg.obs_dim))
    carry0 = policy.initialize_carry((4,))
    variables = policy.init(
        jax.random.PRNGKey(0), obs, carry0, jnp.zeros(4)
    )
    carry1, logits, value = policy.apply(
        variables, obs, carry0, jnp.zeros(4)
    )
    assert logits.shape == (4, 91) and value.shape == (4,)
    # a second step carries memory: output differs from the first
    carry2, logits2, _ = policy.apply(variables, obs, carry1, jnp.zeros(4))
    assert not np.allclose(np.asarray(logits), np.asarray(logits2))
    # done=1 resets the carry: same output as from a fresh carry
    _, logits_reset, _ = policy.apply(variables, obs, carry1, jnp.ones(4))
    np.testing.assert_allclose(
        np.asarray(logits_reset), np.asarray(logits), atol=1e-5
    )


def test_rnn_train_step(example_scene_paths):
    env = GPUDriveTPUEnv(
        EnvConfig(
            num_worlds=2, reward_type="weighted_combination",
            collision_weight=-0.75, off_road_weight=-0.75,
            dynamics_model="classic", collision_behavior="ignore",
        ),
        scene_paths=example_scene_paths[:2],
    )
    policy = LateFusionLSTMPolicy(
        PolicyConfig(action_dim=env.action_space_n), lstm_hidden=32
    )
    ppo_cfg = PPOConfig(rollout_len=4, num_minibatches=2, update_epochs=1)
    init_fn, train_step = make_rnn_ppo_funcs(
        policy, env.params, env.spec, env.action_keys,
        env.config.reward_type, ppo_cfg,
    )
    obs_example = jnp.zeros((3, PolicyConfig().obs_dim))
    variables, opt_state, lstm = init_fn(
        jax.random.PRNGKey(0), env.num_worlds, obs_example
    )
    fresh = jax.jit(stepmod.reset, static_argnames="params")(
        env.scene, None, env.params
    )
    carry = RnnCarry(
        state=jax.tree.map(jnp.copy, fresh), lstm=lstm,
        world_time_steps=jnp.zeros(env.num_worlds, jnp.int32),
        rng=jax.random.PRNGKey(1),
        just_reset=jnp.zeros(env.num_worlds, bool),
    )
    train_fn = jax.jit(train_step)
    before = np.asarray(jax.tree.leaves(variables)[0]).copy()
    for _ in range(2):
        variables, opt_state, carry, metrics = train_fn(
            env.scene, variables, opt_state, carry, fresh, env.reward_weights
        )
    m = {k: float(np.asarray(v)) for k, v in metrics.items()}
    assert np.isfinite(list(m.values())).all()
    assert m["samples"] > 0
    assert not np.allclose(before, np.asarray(jax.tree.leaves(variables)[0]))


def test_rnn_train_step_flat_compact(example_scene_paths):
    """Flat cross-world compaction on the recurrent learner: LSTM state,
    obs store (bf16) and BPTT replay all live on the flat controlled-agent
    axis; the learner trains with finite losses and moves parameters."""
    env = GPUDriveTPUEnv(
        EnvConfig(
            num_worlds=2, reward_type="weighted_combination",
            collision_weight=-0.75, off_road_weight=-0.75,
            dynamics_model="classic", collision_behavior="ignore",
        ),
        scene_paths=example_scene_paths[:2],
    )
    policy = LateFusionLSTMPolicy(
        PolicyConfig(action_dim=env.action_space_n), lstm_hidden=32
    )
    ppo_cfg = PPOConfig(
        rollout_len=4, num_minibatches=2, update_epochs=1,
        compact=32, compact_mode="flat", obs_store_dtype="bfloat16",
    )
    init_fn, train_step = make_rnn_ppo_funcs(
        policy, env.params, env.spec, env.action_keys,
        env.config.reward_type, ppo_cfg,
    )
    obs_example = jnp.zeros((3, PolicyConfig().obs_dim))
    variables, opt_state, lstm = init_fn(
        jax.random.PRNGKey(0), env.num_worlds, obs_example
    )
    assert lstm[0].shape == (32, 32)  # [compact, hidden] flat LSTM state
    fresh = jax.jit(stepmod.reset, static_argnames="params")(
        env.scene, None, env.params
    )
    carry = RnnCarry(
        state=jax.tree.map(jnp.copy, fresh), lstm=lstm,
        world_time_steps=jnp.zeros(env.num_worlds, jnp.int32),
        rng=jax.random.PRNGKey(1),
        just_reset=jnp.zeros(env.num_worlds, bool),
    )
    train_fn = jax.jit(train_step)
    before = np.asarray(jax.tree.leaves(variables)[0]).copy()
    for _ in range(2):
        variables, opt_state, carry, metrics = train_fn(
            env.scene, variables, opt_state, carry, fresh, env.reward_weights
        )
    m = {k: float(np.asarray(v)) for k, v in metrics.items()}
    assert np.isfinite(list(m.values())).all()
    # samples = controlled & alive rows only (no padding in the flat batch)
    n_ctrl = int(np.asarray(env.cont_agent_mask).sum())
    assert 0 < m["samples"] <= 4 * 32
    assert m["samples"] >= 4 * min(n_ctrl, 32) * 0.5
    assert not np.allclose(before, np.asarray(jax.tree.leaves(variables)[0]))


def test_rnn_flat_unroll_matches_scan(example_scene_paths):
    """unroll=True traces the same math as the scanned program."""
    env = GPUDriveTPUEnv(
        EnvConfig(
            num_worlds=2, reward_type="weighted_combination",
            collision_weight=-0.75, off_road_weight=-0.75,
            dynamics_model="classic", collision_behavior="ignore",
        ),
        scene_paths=example_scene_paths[:2],
    )
    policy = LateFusionLSTMPolicy(
        PolicyConfig(action_dim=env.action_space_n), lstm_hidden=16
    )
    outs = []
    for unroll in (False, True):
        ppo_cfg = PPOConfig(
            rollout_len=4, num_minibatches=2, update_epochs=1,
            compact=32, compact_mode="flat", unroll=unroll,
        )
        init_fn, train_step = make_rnn_ppo_funcs(
            policy, env.params, env.spec, env.action_keys,
            env.config.reward_type, ppo_cfg,
        )
        variables, opt_state, lstm = init_fn(
            jax.random.PRNGKey(0), env.num_worlds,
            jnp.zeros((3, PolicyConfig().obs_dim)),
        )
        fresh = jax.jit(stepmod.reset, static_argnames="params")(
            env.scene, None, env.params
        )
        carry = RnnCarry(
            state=jax.tree.map(jnp.copy, fresh), lstm=lstm,
            world_time_steps=jnp.zeros(env.num_worlds, jnp.int32),
            rng=jax.random.PRNGKey(1),
            just_reset=jnp.zeros(env.num_worlds, bool),
        )
        variables, _, _, metrics = jax.jit(train_step)(
            env.scene, variables, opt_state, carry, fresh, env.reward_weights
        )
        outs.append({k: float(np.asarray(v)) for k, v in metrics.items()})
    for k in outs[0]:
        assert abs(outs[0][k] - outs[1][k]) <= 1e-4 + 1e-4 * abs(outs[0][k]), (
            k, outs[0][k], outs[1][k],
        )
