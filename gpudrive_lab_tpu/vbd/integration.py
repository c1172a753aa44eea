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


class VBDTrajectorySource:
    """Drive the TrajectorySource protocol with the flax VBD denoiser
    (vbd/model.py): build the sample batch from the sim state, run reverse
    diffusion, scatter the denoised trajectories back to sim agent slots
    (reference: env_torch.py:1386-1443 _generate_vbd_trajectories)."""

    def __init__(self, model, variables, scheduler, config, seed: int = 0):
        import jax as _jax

        self.model = model
        self.variables = variables
        self.scheduler = scheduler
        self.config = config
        self._rng = _jax.random.PRNGKey(seed)

    def __call__(self, scene: Scene, state: SimState) -> jnp.ndarray:
        import jax as _jax
        import numpy as np

        from gpudrive_lab_tpu.vbd.data_utils import (
            VBDSampleConfig,
            process_scenario_data,
        )
        from gpudrive_lab_tpu.vbd.model import sample_denoiser

        cfg = self.config
        batch_np = process_scenario_data(
            scene, state, current_step=0,
            config=VBDSampleConfig(max_agents=cfg.agents_len),
        )
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        self._rng, k = _jax.random.split(self._rng)
        out = sample_denoiser(
            self.model, self.variables, self.scheduler, batch, k, cfg
        )
        trajs = np.asarray(out["denoised_trajs"])  # [W, N, F, 5]
        W, A = state.pos.shape[:2]
        T = C.TRAJECTORY_LEN
        full = np.zeros((W, A, T, VBD_FEATURES), np.float32)
        ids = batch_np["agents_id"]
        F = min(cfg.future_len, T)
        for w in range(W):
            for k_, a in enumerate(ids[w]):
                if a >= 0:
                    full[w, a, :F] = trajs[w, k_, :F]
                    full[w, a, F:] = trajs[w, k_, F - 1]
        return jnp.asarray(full)


class OfficialVBDSource:
    """TrajectorySource backed by a RELEASED VBD checkpoint: load with
    vbd.convert.load_vbd_checkpoint, then drop into
    env.set_vbd_trajectories (reference: sim_agent/sim_actor.py — the
    VBDTest actor pipeline)."""

    def __init__(self, model, variables, config=None, seed: int = 0,
                 scheduler=None):
        from gpudrive_lab_tpu.vbd.model import DDPMScheduler

        self.model = model
        self.variables = variables
        self.config = config or model.config
        self.scheduler = scheduler or DDPMScheduler(
            steps=self.config.diffusion_steps
        )
        self._rng = jax.random.PRNGKey(seed)

    @classmethod
    def from_checkpoint(cls, path: str, seed: int = 0):
        from gpudrive_lab_tpu.vbd.convert import load_vbd_checkpoint

        model, variables, config = load_vbd_checkpoint(path)
        return cls(model, variables, config, seed=seed)

    def __call__(self, scene: Scene, state: SimState) -> jnp.ndarray:
        import numpy as np

        from gpudrive_lab_tpu.vbd.data_utils import (
            VBDSampleConfig,
            official_inputs,
            process_scenario_data,
        )
        from gpudrive_lab_tpu.vbd.model_official import sample_official

        cfg = self.config
        batch_np = process_scenario_data(
            scene, state, current_step=0,
            config=VBDSampleConfig(max_agents=cfg.agents_len),
        )
        inputs = {
            k: jnp.asarray(v)
            for k, v in official_inputs(batch_np).items()
        }
        self._rng, k = jax.random.split(self._rng)
        out = sample_official(
            self.model, self.variables, self.scheduler, inputs, k, cfg
        )
        trajs = np.asarray(out["denoised_trajs"])  # [W, N, F, 5]
        W, A = state.pos.shape[:2]
        T = C.TRAJECTORY_LEN
        full = np.zeros((W, A, T, VBD_FEATURES), np.float32)
        ids = batch_np["agents_id"]
        F = min(cfg.future_len, T)
        for w in range(W):
            for k_, a in enumerate(ids[w][: cfg.agents_len]):
                if a >= 0:
                    full[w, a, :F] = trajs[w, k_, :F]
                    full[w, a, F:] = trajs[w, k_, F - 1]
        return jnp.asarray(full)


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
