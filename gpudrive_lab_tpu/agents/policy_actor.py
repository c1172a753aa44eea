"""Policy-driven actor (reference: gpudrive/agents/policy_actor.py:6-103):
rolls out a trained late-fusion policy for its masked agents."""

from __future__ import annotations

import pickle

import jax
import jax.numpy as jnp

from gpudrive_lab_tpu.agents.sim_agent import SimAgentActor
from gpudrive_lab_tpu.networks.late_fusion import (
    LateFusionPolicy,
    PolicyConfig,
    sample_logits,
)


class PolicyActor(SimAgentActor):
    def __init__(
        self,
        is_controlled_func,
        variables=None,
        checkpoint_path: str | None = None,
        policy_config: PolicyConfig | None = None,
        deterministic: bool = False,
        seed: int = 0,
        valid_agent_mask=None,
    ):
        super().__init__(is_controlled_func, valid_agent_mask)
        self.policy_config = policy_config or PolicyConfig()
        self.policy = LateFusionPolicy(self.policy_config)
        if variables is None:
            assert checkpoint_path, "need variables or checkpoint_path"
            with open(checkpoint_path, "rb") as f:
                ckpt = pickle.load(f)
            variables = ckpt["variables"] if "variables" in ckpt else ckpt
        self.variables = variables
        self.deterministic = deterministic
        self._rng = jax.random.PRNGKey(seed)
        self._apply = jax.jit(self.policy.apply)

    def select_action(self, obs):
        self._rng, k = jax.random.split(self._rng)
        logits, _ = self._apply(self.variables, jnp.asarray(obs))
        action, _, _ = sample_logits(
            k, logits, deterministic=self.deterministic
        )
        return action
