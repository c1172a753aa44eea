"""Imitation-learning data generation.

Mirror of the reference's expert rollout recorder
(reference: baselines/il/imitation_data_generation.py:41-278
generate_state_action_pairs): replay logged experts through the simulator,
collect flattened observations, continuous expert actions and their
discretized grid indices, plus alive/partner/road masks, and save npz shards.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from gpudrive_lab_tpu import constants as C
from gpudrive_lab_tpu.env.env_jax import GPUDriveTPUEnv, _slice_t


def map_to_closest_discrete_value(values: np.ndarray, grid: np.ndarray):
    """Snap continuous actions onto the action grid
    (reference: imitation_data_generation.py:27-38)."""
    idx = np.abs(values[..., None] - grid[None]).argmin(axis=-1)
    return grid[idx], idx


def generate_state_action_pairs(
    env: GPUDriveTPUEnv,
    save_path: str | None = None,
    discretize: bool = True,
    use_action_indices: bool = True,
):
    """Roll out all-expert episodes and record (obs, expert_actions, masks).

    Returns dict of numpy arrays:
      obs          [T, W, A, obs_dim]
      actions      [T, W, A, 3]   (continuous expert actions)
      action_idx   [T, W, A]      (discretized grid index, if requested)
      dead_mask    [T, W, A]      True once an agent is done/invalid
      partner_mask [T, W, A, A-1]
      road_mask    [T, W, A, K]
    """
    expert_actions, _, _, _, _ = env.get_expert_actions()  # [W, A, T, 10]
    obs = env.reset()

    T = C.EPISODE_LEN
    W, A, K = env.num_worlds, C.MAX_AGENTS, C.MAX_AGENT_MAP_OBS
    # disabled modalities yield None masks (lidar-only mode); store zeros
    pm_default = np.zeros((W, A, A - 1), np.int32)
    rm_default = np.zeros((W, A, K), bool)
    obs_l, act_l, dead_l, pmask_l, rmask_l = [], [], [], [], []
    pos_l, yaw_l = [], []
    for t in range(T):
        obs_l.append(np.asarray(obs))
        dead_l.append(np.asarray(env.get_dones()) > 0)
        pm = env.get_partner_mask()
        rm = env.get_road_mask()
        pmask_l.append(pm_default if pm is None else np.asarray(pm))
        rmask_l.append(rm_default if rm is None else np.asarray(rm))
        pos_l.append(np.asarray(env.state.pos))
        yaw_l.append(np.asarray(env.state.yaw))
        act_t = _slice_t(expert_actions, t)
        act_l.append(np.asarray(act_t)[..., :3])
        env.step_dynamics(act_t)
        obs = env.get_obs()

    out = {
        "obs": np.stack(obs_l),
        "actions": np.stack(act_l),
        "dead_mask": np.stack(dead_l),
        "partner_mask": np.stack(pmask_l),
        "road_mask": np.stack(rmask_l),
        # world-frame state history for the position probes / intervention
        # analysis (il.analysis.probe_labels_from_positions)
        "positions": np.stack(pos_l),
        "yaw": np.stack(yaw_l),
        "controlled_mask": np.asarray(env.cont_agent_mask),
        "valid_mask": np.asarray(env.scene.agents.valid),
    }

    if discretize and env.action_keys is not None:
        # snap per-dimension onto the config grids then look up the
        # cartesian-product index (reference: :27-38, :150-190)
        cfg = env.config
        if cfg.dynamics_model in ("classic", "bicycle"):
            grids = (cfg.accel_actions, cfg.steer_actions, cfg.head_tilt_actions)
        else:
            grids = (cfg.dx, cfg.dy, cfg.dyaw)
        idx = []
        for d, g in enumerate(grids):
            _, i = map_to_closest_discrete_value(out["actions"][..., d], g)
            idx.append(i)
        n1, n2 = len(grids[1]), len(grids[2])
        out["action_idx"] = (idx[0] * n1 + idx[1]) * n2 + idx[2]

    if save_path:
        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
        np.savez_compressed(save_path, **out)
    return out
