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
