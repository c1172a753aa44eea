"""Vectorized flat-agent environment wrapper.

Mirror of the reference's PufferLib wrapper
(reference: gpudrive/env/env_puffer.py:29-514) without the pufferlib
dependency: exposes the multi-agent sim as a flat vector env over the
*controlled* agent slots — obs [N, D], actions [N] — with per-world
auto-reset, episode statistics (goal/collision/off-road/truncation rates),
scene resampling, and data-coverage accounting.
"""

from __future__ import annotations

from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from gpudrive_lab_tpu.env.config import EnvConfig
from gpudrive_lab_tpu.env.dataset import SceneDataLoader
from gpudrive_lab_tpu.env.env_jax import GPUDriveTPUEnv


class VecGPUDriveEnv:
    def __init__(
        self,
        config: EnvConfig,
        data_loader: SceneDataLoader,
        resample_interval: Optional[int] = None,
    ):
        self.env = GPUDriveTPUEnv(config, data_loader=data_loader)
        self.config = config
        self.resample_interval = resample_interval
        self.global_step = 0
        self._steps_since_resample = 0
        self.num_worlds = self.env.num_worlds
        self.max_agents = self.env.max_agent_count
        self._refresh_masks()
        self.episode_returns = np.zeros(self.num_worlds, np.float64)
        self.episode_lengths = np.zeros(self.num_worlds, np.int64)
        self.stats_buffer: List[dict] = []
        self.data_coverage: set = set()

    # -- mask bookkeeping -------------------------------------------------

    def _refresh_masks(self):
        self.controlled_mask = np.asarray(self.env.cont_agent_mask)
        self.flat_ids = np.nonzero(self.controlled_mask.reshape(-1))[0]
        self.num_agents = len(self.flat_ids)
        self.data_coverage_add()

    def data_coverage_add(self):
        """Track unique scenes seen (reference: env_puffer.py:485-514)."""
        self.data_coverage = getattr(self, "data_coverage", set())
        self.data_coverage.update(self.env.scene_paths)

    # -- vec API ----------------------------------------------------------

    @property
    def single_observation_dim(self) -> int:
        return self.env.observation_dim

    @property
    def single_action_space_n(self) -> int:
        return self.env.action_space_n

    def _flat(self, arr) -> np.ndarray:
        a = np.asarray(arr)
        return a.reshape(self.num_worlds * self.max_agents, *a.shape[2:])[
            self.flat_ids
        ]

    def reset(self):
        obs = self.env.reset()
        self.episode_returns[:] = 0
        self.episode_lengths[:] = 0
        return self._flat(obs)

    def step(self, actions: np.ndarray):
        """actions: [N] discrete indices for controlled agents.  Returns
        (obs [N, D], rewards [N], terminals [N], truncations [N], infos)
        (reference: env_puffer.py:235-403)."""
        full = np.zeros((self.num_worlds * self.max_agents), np.int64)
        full[self.flat_ids] = np.asarray(actions).reshape(-1)
        self.env.step_dynamics(
            jnp.asarray(full.reshape(self.num_worlds, self.max_agents))
        )

        rewards_full = np.asarray(self.env.get_rewards())
        dones_full = np.asarray(self.env.get_dones()) > 0
        infos = self.env.get_infos()

        ctrl = self.controlled_mask
        n_ctrl = np.maximum(ctrl.sum(axis=1), 1)
        self.episode_returns += (rewards_full * ctrl).sum(axis=1) / n_ctrl
        self.episode_lengths += 1

        # world finished when every controlled agent is done
        world_done = (dones_full | ~ctrl).all(axis=1)

        episode_stats = []
        if world_done.any():
            goal = np.asarray(infos["goal_achieved"])
            coll = np.asarray(infos["collided"])
            off = np.asarray(infos["off_road"])
            for w in np.nonzero(world_done)[0]:
                m = ctrl[w]
                n = max(m.sum(), 1)
                truncated = (
                    (goal[w][m].astype(bool) | coll[w][m].astype(bool)
                     | off[w][m].astype(bool)) == 0
                )
                episode_stats.append(
                    dict(
                        world=int(w),
                        episode_return=float(self.episode_returns[w]),
                        episode_length=int(self.episode_lengths[w]),
                        perc_goal_achieved=float(goal[w][m].sum() / n),
                        perc_veh_collisions=float(coll[w][m].clip(0, 1).sum() / n),
                        perc_off_road=float(off[w][m].clip(0, 1).sum() / n),
                        perc_truncated=float(truncated.sum() / n),
                    )
                )
            self.env.reset(env_idx_list=np.nonzero(world_done)[0].tolist())
            self.episode_returns[world_done] = 0
            self.episode_lengths[world_done] = 0
        self.stats_buffer.extend(episode_stats)

        self.global_step += self.num_agents
        self._steps_since_resample += self.num_agents

        # Flatten THIS step's outputs with the current scene's agent slots
        # before any resample changes the mask.
        rewards = self._flat(rewards_full)
        terminals = self._flat(dones_full)
        truncations = np.zeros_like(terminals)

        if (
            self.resample_interval
            and self._steps_since_resample >= self.resample_interval
        ):
            # NB: after a resample the agent count (and thus obs length) can
            # change — callers must re-derive their buffers, exactly as with
            # the reference's resample_scenario_batch.
            self.resample_scenario_batch()

        obs = self._flat(self.env.get_obs())
        return obs, rewards, terminals, truncations, {
            "episode_stats": episode_stats
        }

    def resample_scenario_batch(self):
        """reference: env_puffer.py:438-454."""
        self.env.swap_data_batch()
        self._refresh_masks()
        self._steps_since_resample = 0
        self.episode_returns[:] = 0
        self.episode_lengths[:] = 0

    def pop_stats(self) -> List[dict]:
        out, self.stats_buffer = self.stats_buffer, []
        return out
