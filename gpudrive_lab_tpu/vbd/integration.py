"""Versatile Behavior Diffusion (VBD) integration surface.

The reference embeds a pretrained diffusion sim-agent model whose predicted
trajectories feed (a) a reward term penalizing deviation from them and (b) an
egocentric 91x5 trajectory block appended to the policy observation
(reference: gpudrive/integrations/vbd/ and env_torch.py:132-245, 947-1170,
1386-1443).

This module provides the full integration surface with a pluggable
*trajectory source*: anything producing [W, A, T, 5] global-frame
(x, y, yaw, vel_x, vel_y) predictions.  ``LogReplaySource`` (the logged
trajectories) is the built-in source — functionally what VBD is trained to
imitate — and a flax denoiser can drop in behind the same protocol (model
port tracked in the roadmap).
"""

from __future__ import annotations

from typing import Protocol

import jax
import jax.numpy as jnp

from gpudrive_lab_tpu import constants as C
from gpudrive_lab_tpu.core.types import Scene, SimState

VBD_FEATURES = 5  # x, y, yaw, vel_x, vel_y
VBD_OBS_DIM = C.TRAJECTORY_LEN * VBD_FEATURES  # 455


class TrajectorySource(Protocol):
    def __call__(self, scene: Scene, state: SimState) -> jnp.ndarray:
        """Returns [W, A, T, 5] predicted global trajectories."""


def log_replay_trajectories(scene: Scene, state: SimState) -> jnp.ndarray:
    """The logged trajectories as (x, y, yaw, vx, vy) — the reference's
    `distance_to_logs` trajectory source expressed in VBD layout."""
    ag = scene.agents
    return jnp.concatenate(
        [ag.traj_pos, ag.traj_yaw[..., None], ag.traj_vel], axis=-1
    )


class LogReplaySource:
    def __call__(self, scene: Scene, state: SimState) -> jnp.ndarray:
        return log_replay_trajectories(scene, state)


@jax.jit
def egocentric_vbd_obs(state: SimState, vbd_trajectories: jnp.ndarray):
    """Transform global [W, A, T, 5] predictions into each agent's frame and
    flatten to the 455-float obs block (reference: env_torch.py:947-1170
    _get_vbd_obs, vectorized instead of the reference's per-agent loops)."""
    pos = state.pos[:, :, None, :]  # [W, A, 1, 2]
    yaw = state.yaw[:, :, None]
    c = jnp.cos(yaw)
    s = jnp.sin(yaw)
    rel = vbd_trajectories[..., 0:2] - pos
    x = c * rel[..., 0] + s * rel[..., 1]
    y = -s * rel[..., 0] + c * rel[..., 1]
    rel_yaw = vbd_trajectories[..., 2] - yaw
    rel_yaw = jnp.arctan2(jnp.sin(rel_yaw), jnp.cos(rel_yaw))
    vx = c * vbd_trajectories[..., 3] + s * vbd_trajectories[..., 4]
    vy = -s * vbd_trajectories[..., 3] + c * vbd_trajectories[..., 4]
    ego = jnp.stack([x, y, rel_yaw, vx, vy], axis=-1)
    return ego.reshape(ego.shape[0], ego.shape[1], -1)


@jax.jit
def vbd_distance_reward(
    state: SimState,
    vbd_trajectories: jnp.ndarray,
    world_time_steps: jnp.ndarray,
    weight: float = 0.01,
):
    """exp(-distance to the predicted trajectory at the current step) bonus
    (reference: env_torch.py get_rewards, distance_to_vdb_trajs branch)."""
    t = jnp.clip(world_time_steps, 0, vbd_trajectories.shape[2] - 1)
    traj_t = jnp.take_along_axis(
        vbd_trajectories[..., 0:2], t[:, None, None, None], axis=2
    )[:, :, 0]
    dist = jnp.linalg.norm(traj_t - state.pos, axis=-1)
    return weight * jnp.exp(-dist)
