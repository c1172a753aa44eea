"""Masked-rollout-buffer IPPO learner over the SB3 VecEnv adapter.

Torch-free re-implementation of the reference's second training stack
(reference: gpudrive/integrations/sb3/ppo.py:40-251 IPPO and
rollout_buffer.py:23-249 MaskedRolloutBuffer): a fixed-width vector env
where dead/invalid agents carry NaN rewards and observations, a rollout
buffer whose GAE maps NaNs to safe values exactly like the reference's
EDIT_1..EDIT_4 patches, sample filtering by ``~isnan(reward)`` before
minibatching (EDIT_5/EDIT_6), and a clipped-objective PPO update.

SB3 itself is not a dependency: the policy is the flax LateFusionPolicy and
the update is optax, but the learner drives the same VecEnv duck-type
(reset/step_async/step_wait) the reference's IPPO drives, so behavior maps
one-to-one.  The primary on-device learner (ppo/ppo.py) remains the fast
path; this stack exists for parity with the reference's SB3 pipeline.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Dict, Iterator, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gpudrive_lab_tpu.networks.late_fusion import (
    LateFusionPolicy,
    PolicyConfig,
    sample_logits,
)


class MaskedRolloutBuffer:
    """[T, n_envs] rollout storage with NaN-tolerant GAE and valid-sample
    filtering (reference: rollout_buffer.py:23-249)."""

    def __init__(self, buffer_size: int, n_envs: int, obs_dim: int,
                 gamma: float = 0.99, gae_lambda: float = 0.95):
        self.buffer_size = buffer_size
        self.n_envs = n_envs
        self.obs_dim = obs_dim
        self.gamma = gamma
        self.gae_lambda = gae_lambda
        self.reset()

    def reset(self) -> None:
        T, N = self.buffer_size, self.n_envs
        self.observations = np.zeros((T, N, self.obs_dim), np.float32)
        self.actions = np.zeros((T, N), np.int64)
        self.rewards = np.zeros((T, N), np.float32)
        self.episode_starts = np.zeros((T, N), np.float32)
        self.values = np.zeros((T, N), np.float32)
        self.log_probs = np.zeros((T, N), np.float32)
        self.advantages = np.zeros((T, N), np.float32)
        self.returns = np.zeros((T, N), np.float32)
        self.pos = 0
        self.full = False

    def add(self, obs, action, reward, episode_start, value, log_prob):
        t = self.pos
        self.observations[t] = obs
        self.actions[t] = action
        self.rewards[t] = reward
        self.episode_starts[t] = episode_start
        self.values[t] = value
        self.log_probs[t] = log_prob
        self.pos += 1
        self.full = self.pos == self.buffer_size

    def compute_returns_and_advantage(self, last_values, dones) -> None:
        """GAE with the reference's NaN patches (rollout_buffer.py:126-178):
        NaN dones/episode-starts count as episode boundaries, NaN rewards/
        values contribute zero."""
        last_gae = 0.0
        for step in reversed(range(self.buffer_size)):
            if step == self.buffer_size - 1:
                next_non_terminal = 1.0 - np.nan_to_num(dones, nan=1.0)
                next_values = last_values
            else:
                next_non_terminal = 1.0 - np.nan_to_num(
                    self.episode_starts[step + 1], nan=1.0
                )
                next_values = self.values[step + 1]
            delta = (
                np.nan_to_num(self.rewards[step], nan=0.0)
                + np.nan_to_num(
                    self.gamma * next_values * next_non_terminal, nan=0.0
                )
                - np.nan_to_num(self.values[step], nan=0.0)
            )
            last_gae = (
                delta
                + self.gamma * self.gae_lambda * next_non_terminal * last_gae
            )
            self.advantages[step] = last_gae
        self.returns = self.advantages + np.nan_to_num(self.values, nan=0.0)
        assert not np.isnan(self.advantages).any(), (
            "Advantages contain NaN: check GAE computation"
        )

    def get(self, batch_size: Optional[int] = None,
            rng: Optional[np.random.Generator] = None
            ) -> Iterator[Dict[str, np.ndarray]]:
        """Yield shuffled minibatches over VALID samples only — validity is
        ``~isnan(reward)`` exactly as the reference's EDIT_5
        (rollout_buffer.py:181-230)."""
        assert self.full
        valid = ~np.isnan(self.rewards.reshape(-1))
        flat = lambda x: x.reshape((-1,) + x.shape[2:])[valid]
        obs = np.nan_to_num(flat(self.observations), nan=0.0)
        data = {
            "obs": obs,
            "action": flat(self.actions),
            "value": flat(self.values),
            "logprob": flat(self.log_probs),
            "adv": flat(self.advantages),
            "ret": flat(self.returns),
        }
        for v in data.values():
            assert not np.isnan(v).any(), "NaN leaked into valid samples"
        n = int(valid.sum())
        rng = rng or np.random.default_rng(0)
        order = rng.permutation(n)
        batch_size = batch_size or n
        for i in range(0, n, batch_size):
            ids = order[i : i + batch_size]
            yield {k: v[ids] for k, v in data.items()}

    @property
    def num_valid_samples(self) -> int:
        return int((~np.isnan(self.rewards)).sum())


@dataclasses.dataclass
class IPPOConfig:
    """reference: sb3/ppo.py defaults + ppo_base_sb3 yaml."""

    n_steps: int = 91
    batch_size: int = 512
    n_epochs: int = 5
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_range: float = 0.2
    ent_coef: float = 1e-3
    vf_coef: float = 0.5
    max_grad_norm: float = 0.5
    lr: float = 3e-4
    resample_freq: int = 0  # >0: resample scene batch every N global steps


class IPPO:
    """The reference's IPPO learn loop (sb3/ppo.py:65-251) over the VecEnv
    adapter: collect_rollouts with dead-agent NaN masking -> masked GAE ->
    clipped PPO train epochs."""

    def __init__(self, env, config: IPPOConfig | None = None,
                 policy_config: PolicyConfig | None = None, seed: int = 0):
        self.env = env
        self.config = config or IPPOConfig()
        self.policy_config = policy_config or PolicyConfig(
            action_dim=int(env.action_space.n)
        )
        self.policy = LateFusionPolicy(self.policy_config)
        self.rng = jax.random.PRNGKey(seed)
        self.np_rng = np.random.default_rng(seed)
        example = jnp.zeros((1, self.policy_config.obs_dim), jnp.float32)
        self.rng, k = jax.random.split(self.rng)
        self.variables = self.policy.init(k, example)
        self.tx = optax.chain(
            optax.clip_by_global_norm(self.config.max_grad_norm),
            optax.adam(self.config.lr),
        )
        self.opt_state = self.tx.init(self.variables)
        self.buffer = MaskedRolloutBuffer(
            self.config.n_steps, env.num_envs, env.obs_dim,
            self.config.gamma, self.config.gae_lambda,
        )
        self.num_timesteps = 0
        self.resample_counter = 0
        self._last_obs = None
        self._last_episode_starts = None
        self._build_jit_fns()

    def _build_jit_fns(self):
        cfg = self.config
        policy = self.policy

        @jax.jit
        def act(variables, obs, key):
            logits, value = policy.apply(variables, obs)
            action, logp, _ = sample_logits(key, logits)
            return action, logp, value

        def loss_fn(variables, mb, key):
            logits, value = policy.apply(variables, mb["obs"])
            _, newlogp, entropy = sample_logits(
                key, logits, action=mb["action"]
            )
            logratio = newlogp - mb["logprob"]
            ratio = jnp.exp(logratio)
            adv = mb["adv"]
            adv = (adv - adv.mean()) / (adv.std() + 1e-8)
            pg1 = -adv * ratio
            pg2 = -adv * jnp.clip(
                ratio, 1.0 - cfg.clip_range, 1.0 + cfg.clip_range
            )
            pg_loss = jnp.maximum(pg1, pg2).mean()
            v_loss = 0.5 * jnp.square(value - mb["ret"]).mean()
            ent = entropy.mean()
            loss = pg_loss + cfg.vf_coef * v_loss - cfg.ent_coef * ent
            approx_kl = ((ratio - 1.0) - logratio).mean()
            return loss, {
                "pg_loss": pg_loss, "v_loss": v_loss, "entropy": ent,
                "approx_kl": approx_kl,
            }

        @jax.jit
        def update(variables, opt_state, mb, key):
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                variables, mb, key
            )
            updates, opt_state = self.tx.update(grads, opt_state, variables)
            variables = optax.apply_updates(variables, updates)
            return variables, opt_state, aux

        self._act = act
        self._update = update

    def collect_rollouts(self) -> None:
        """reference: sb3/ppo.py:65-180 — NaN dummy outputs for dead agents,
        real policy outputs for live ones, plus optional scene resampling."""
        cfg = self.config
        if cfg.resample_freq > 0 and self.resample_counter >= cfg.resample_freq:
            self.env.resample_scenario_batch()
            self.resample_counter = 0
            self.buffer = MaskedRolloutBuffer(
                cfg.n_steps, self.env.num_envs, self.env.obs_dim,
                cfg.gamma, cfg.gae_lambda,
            )
            self._last_obs = self.env.reset()
            self._last_episode_starts = np.ones(self.env.num_envs, np.float32)

        if self._last_obs is None:
            self._last_obs = self.env.reset()
            self._last_episode_starts = np.ones(self.env.num_envs, np.float32)

        self.buffer.reset()
        for _ in range(cfg.n_steps):
            obs = self._last_obs
            dead = np.isnan(obs).any(axis=-1) | self.env.dead_agent_mask
            self.rng, k = jax.random.split(self.rng)
            action, logp, value = self._act(
                self.variables, jnp.asarray(np.nan_to_num(obs, nan=0.0)), k
            )
            action = np.array(action)
            logp = np.array(logp, np.float32)
            value = np.array(value, np.float32)
            # dead agents get NaN bookkeeping so their samples filter out
            logp[dead] = np.nan
            value[dead] = np.nan

            new_obs, rewards, dones, _ = self.env.step(action)
            self.buffer.add(
                obs, action, rewards, self._last_episode_starts, value, logp
            )
            self._last_obs = new_obs
            self._last_episode_starts = dones.astype(np.float32)
            n_live = int((~dead).sum())
            self.num_timesteps += n_live
            self.resample_counter += n_live

        dead = np.isnan(self._last_obs).any(axis=-1)
        _, _, last_value = self._act(
            self.variables,
            jnp.asarray(np.nan_to_num(self._last_obs, nan=0.0)),
            jax.random.PRNGKey(0),
        )
        last_value = np.array(last_value, np.float32)
        last_value[dead] = np.nan
        self.buffer.compute_returns_and_advantage(
            last_value, self._last_episode_starts
        )

    def train(self) -> Dict[str, float]:
        """reference: stable-baselines PPO.train over the masked buffer."""
        metrics = []
        for _ in range(self.config.n_epochs):
            for mb in self.buffer.get(self.config.batch_size, self.np_rng):
                jb = {k: jnp.asarray(v) for k, v in mb.items()}
                self.rng, k = jax.random.split(self.rng)
                self.variables, self.opt_state, aux = self._update(
                    self.variables, self.opt_state, jb, k
                )
                metrics.append({k2: float(v) for k2, v in aux.items()})
        # a window where every sample is masked (all rewards nan) yields no
        # minibatches — report it instead of crashing on metrics[0]
        out = {
            k2: float(np.mean([m[k2] for m in metrics]))
            for k2 in (metrics[0] if metrics else ())
        }
        out["valid_samples"] = self.buffer.num_valid_samples
        return out

    def learn(self, total_timesteps: int,
              log_fn=None) -> List[Dict[str, float]]:
        history = []
        t0 = time.time()
        while self.num_timesteps < total_timesteps:
            self.collect_rollouts()
            m = self.train()
            m["global_step"] = self.num_timesteps
            m["sps"] = self.num_timesteps / max(time.time() - t0, 1e-9)
            history.append(m)
            if log_fn:
                log_fn(m)
        return history
