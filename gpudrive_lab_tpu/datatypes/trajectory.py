"""Expert-trajectory view (reference: gpudrive/datatypes/trajectory.py).

The reference slices the exported 1456-float blob; here the scene pytree
already holds the structured arrays, so ``LogTrajectory`` can be built either
from the Scene or from a packed blob (for ABI parity)."""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from gpudrive_lab_tpu import constants as C
from gpudrive_lab_tpu.core.types import Scene

T = C.TRAJECTORY_LEN


@dataclasses.dataclass
class LogTrajectory:
    pos_xy: jnp.ndarray  # [W, A, T, 2]
    vel_xy: jnp.ndarray  # [W, A, T, 2]
    yaw: jnp.ndarray  # [W, A, T, 1]
    valids: jnp.ndarray  # [W, A, T, 1]
    inferred_actions: jnp.ndarray  # [W, A, T, 10]

    @classmethod
    def from_scene(cls, scene: Scene) -> "LogTrajectory":
        ag = scene.agents
        return cls(
            pos_xy=ag.traj_pos,
            vel_xy=ag.traj_vel,
            yaw=ag.traj_yaw[..., None],
            valids=ag.traj_valid[..., None],
            inferred_actions=ag.traj_inv_actions,
        )

    @classmethod
    def from_blob(cls, blob, num_worlds: int, max_agents: int):
        """Slice the packed 1456-float export layout
        (reference: datatypes/trajectory.py:21-66; src/types.hpp:348-371)."""
        b = blob.reshape(num_worlds, max_agents, -1)
        return cls(
            pos_xy=b[..., : 2 * T].reshape(num_worlds, max_agents, T, 2),
            vel_xy=b[..., 2 * T : 4 * T].reshape(num_worlds, max_agents, T, 2),
            yaw=b[..., 4 * T : 5 * T].reshape(num_worlds, max_agents, T, 1),
            valids=b[..., 5 * T : 6 * T].reshape(num_worlds, max_agents, T, 1),
            inferred_actions=b[..., 6 * T : 16 * T].reshape(
                num_worlds, max_agents, T, 10
            ),
        )

    def pack(self) -> jnp.ndarray:
        """Inverse of from_blob: produce the [W, A, 1456] export blob."""
        W, A = self.pos_xy.shape[:2]
        return jnp.concatenate(
            [
                self.pos_xy.reshape(W, A, -1),
                self.vel_xy.reshape(W, A, -1),
                self.yaw.reshape(W, A, -1),
                self.valids.reshape(W, A, -1),
                self.inferred_actions.reshape(W, A, -1),
            ],
            axis=-1,
        )
