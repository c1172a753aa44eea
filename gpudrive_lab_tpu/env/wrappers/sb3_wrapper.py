"""Stable-Baselines3-style VecEnv adapter.

Mirror of the reference's SB3 wrapper
(reference: gpudrive/env/wrappers/sb3_wrapper.py:23-407 SB3MultiAgentEnv):
casts the multi-agent sim as a fixed-width vector env over the maximal
controlled-agent count with nan-padded buffers, dead-agent masking and
per-world auto-reset.  Duck-typed to SB3's VecEnv interface
(reset/step_async/step_wait/num_envs/observation_space/action_space) so it
plugs into SB3's `IPPO` with the MaskedRolloutBuffer pattern; SB3 itself is
an optional dependency (only gymnasium spaces are imported)."""

from __future__ import annotations

from typing import List, Optional

import gymnasium
import jax.numpy as jnp
import numpy as np

from gpudrive_lab_tpu.env.config import EnvConfig
from gpudrive_lab_tpu.env.dataset import SceneDataLoader
from gpudrive_lab_tpu.env.env_jax import GPUDriveTPUEnv


class SB3MultiAgentEnv:
    def __init__(
        self,
        config: EnvConfig,
        data_loader: SceneDataLoader,
        max_cont_agents: int | None = None,
    ):
        self.env = GPUDriveTPUEnv(config, data_loader=data_loader)
        self.num_worlds = self.env.num_worlds
        self.max_agent_count = self.env.max_agent_count
        self.obs_dim = self.env.observation_dim
        self._refresh_mask()
        self.num_envs = int(self.controlled_mask.sum())
        self.observation_space = gymnasium.spaces.Box(
            -np.inf, np.inf, (self.obs_dim,), np.float32
        )
        self.action_space = gymnasium.spaces.Discrete(self.env.action_space_n)
        self._actions = None
        self.info_dict: dict = {}

    def _refresh_mask(self):
        self.controlled_mask = np.asarray(self.env.cont_agent_mask)
        self.flat_ids = np.nonzero(self.controlled_mask.reshape(-1))[0]

    def _obs(self) -> np.ndarray:
        """[num_envs, obs_dim] buffer with dead agents' rows nan-padded so
        downstream consumers can't silently train on stale observations
        (reference: sb3_wrapper.py:116-150)."""
        o = np.array(np.asarray(self.env.get_obs()).reshape(-1, self.obs_dim))
        o = o[self.flat_ids]
        o[self.dead_agent_mask] = np.nan
        return o

    def reset(self, seed=None):
        self.env.reset()
        self.dead_agent_mask = np.zeros(len(self.flat_ids), bool)
        return self._obs()

    def step_async(self, actions: np.ndarray):
        self._actions = np.asarray(actions)

    def step_wait(self):
        full = np.zeros(self.num_worlds * self.max_agent_count, np.int64)
        full[self.flat_ids] = self._actions.reshape(-1)
        self.env.step_dynamics(
            jnp.asarray(full.reshape(self.num_worlds, self.max_agent_count))
        )
        rewards = np.asarray(self.env.get_rewards()).reshape(-1)[self.flat_ids]
        dones = (
            np.asarray(self.env.get_dones()).reshape(-1)[self.flat_ids] > 0
        )
        # nan-out already-dead agents so the rollout buffer drops them
        # (reference: MaskedRolloutBuffer, sb3 rollout_buffer.py:23-249)
        rewards = np.where(self.dead_agent_mask, np.nan, rewards)
        infos = [
            {"dead": bool(d)} for d in self.dead_agent_mask
        ]
        self.dead_agent_mask |= dones

        world_done = (
            (np.asarray(self.env.get_dones()) > 0)
            | ~self.controlled_mask
        ).all(axis=1)
        if world_done.any():
            self.env.reset(env_idx_list=np.nonzero(world_done)[0].tolist())
            flat_done = np.repeat(world_done, self.max_agent_count)[
                self.flat_ids
            ]
            self.dead_agent_mask[flat_done] = False
        return self._obs(), rewards, dones, infos

    def step(self, actions):
        self.step_async(actions)
        return self.step_wait()

    def close(self):
        pass

    def resample_scenario_batch(self):
        self.env.swap_data_batch()
        self._refresh_mask()
        self.num_envs = int(self.controlled_mask.sum())
        self.dead_agent_mask = np.zeros(len(self.flat_ids), bool)
