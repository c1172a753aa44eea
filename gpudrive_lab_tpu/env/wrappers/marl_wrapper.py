"""JaxMARL-style dict-per-agent wrapper.

Mirror of the reference's JaxMARL adapter
(reference: gpudrive/env/wrappers/jaxmarl_wrapper.py:25-178
GPUDriveToJaxMARL): exposes one world of the batched sim through the
MultiAgentEnv API — reset/step_env keyed by agent name, pure-functional over
the SimState so it composes with jit/vmap like native JaxMARL envs."""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from gpudrive_lab_tpu import constants as C
from gpudrive_lab_tpu.core import step as stepmod
from gpudrive_lab_tpu.core.types import Params, Scene, SimState
from gpudrive_lab_tpu.env.env_jax import ObsSpec, flat_observation


class GPUDriveMARLEnv:
    """Single-world (W=1) functional MARL view."""

    def __init__(self, scene: Scene, params: Params, action_table: jnp.ndarray):
        assert scene.num_worlds == 1, "MARL wrapper exposes one world"
        self.scene = scene
        self.params = params
        self.table = action_table
        self.spec = ObsSpec()
        import numpy as np

        ctrl = np.asarray(scene.agents.controlled)[0]
        self.agent_ids = [int(i) for i in np.nonzero(ctrl)[0]]
        self.agents = [f"agent_{i}" for i in self.agent_ids]
        self.num_agents = len(self.agents)
        self._weights = jnp.zeros((1, C.MAX_AGENTS, 3))
        self._reset = jax.jit(stepmod.reset, static_argnames="params")
        self._step = jax.jit(stepmod.step, static_argnames="params")
        self._obs = jax.jit(
            flat_observation, static_argnames=("params", "spec")
        )

    def _obs_dict(self, state: SimState) -> Dict[str, jnp.ndarray]:
        obs, _, _ = self._obs(
            self.scene, state, self.params, self.spec, self._weights
        )
        return {
            name: obs[0, i] for name, i in zip(self.agents, self.agent_ids)
        }

    def reset(self, key=None) -> Tuple[Dict, SimState]:
        state = self._reset(self.scene, None, self.params)
        return self._obs_dict(state), state

    def step_env(
        self, key, state: SimState, actions: Dict[str, jnp.ndarray]
    ) -> Tuple[Dict, SimState, Dict, Dict, Dict]:
        """(obs, state, rewards, dones, infos) keyed per agent
        (reference: jaxmarl_wrapper.py:96-160)."""
        act = jnp.zeros((1, C.MAX_AGENTS, C.ACTION_DIM))
        for name, i in zip(self.agents, self.agent_ids):
            idx = jnp.asarray(actions[name], jnp.int32)
            act = act.at[0, i, :3].set(self.table[idx])
        state = self._step(
            self.scene, jax.lax.stop_gradient(state), act, self.params
        )
        obs = self._obs_dict(state)
        rewards = {
            n: state.reward[0, i]
            for n, i in zip(self.agents, self.agent_ids)
        }
        dones = {
            n: state.done[0, i] != 0
            for n, i in zip(self.agents, self.agent_ids)
        }
        dones["__all__"] = jnp.all(
            jnp.asarray([state.done[0, i] != 0 for i in self.agent_ids])
        )
        infos = {n: {} for n in self.agents}
        return obs, state, rewards, dones, infos

    def observation_space_dim(self) -> int:
        return ObsSpec().obs_dim

    def action_space_n(self) -> int:
        return int(self.table.shape[0])
