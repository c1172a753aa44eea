"""Random actor (reference: gpudrive/agents/random_actor.py:4-55)."""

from __future__ import annotations

import numpy as np

from gpudrive_lab_tpu.agents.sim_agent import SimAgentActor


class RandomActor(SimAgentActor):
    def __init__(self, is_controlled_func, action_space_n: int, seed: int = 0,
                 valid_agent_mask=None):
        super().__init__(is_controlled_func, valid_agent_mask)
        self.action_space_n = action_space_n
        self.rng = np.random.default_rng(seed)

    def select_action(self, obs):
        n = obs.shape[0]
        return self.rng.integers(0, self.action_space_n, n)
