"""Multi-policy rollouts: run several policies with disjoint agent masks in
the same worlds and report per-policy goal/collision/off-road metrics
(reference: gpudrive/utils/multi_policy_rollout.py:6-195 — the fork's
mixed-population evaluation utility)."""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from gpudrive_lab_tpu.agents.core import merge_actions


def multi_policy_rollout(
    env,
    policies: Dict[str, object],
    masks: Dict[str, np.ndarray],
    deterministic: bool = False,
    render_sim_state: bool = False,
    zoom_radius: float = 50.0,
    max_steps: Optional[int] = None,
    render_worlds=(0,),
):
    """policies: {name: actor with .select_action(obs)};
    masks: {name: [W, A] bool} — must be disjoint subsets of the controlled
    mask.  Returns {name: {goal_achieved, collided, off_road}} fractions plus
    optional frames.

    render_sim_state=True renders ``render_worlds`` each step (frames is a
    list of per-step lists) and requires ``env.vis`` — raising immediately
    beats silently collecting a video of Nones."""
    if render_sim_state and not hasattr(env, "vis"):
        raise ValueError(
            "render_sim_state=True needs an env with a .vis visualizer "
            "(GPUDriveTPUEnv(render_config=...) attaches one)"
        )
    obs = env.reset()
    W, A = env.num_worlds, env.max_agent_count
    frames = []
    steps = max_steps or env.episode_len

    flat_masks = {k: np.asarray(m).reshape(-1) for k, m in masks.items()}
    ids = {k: np.nonzero(m)[0] for k, m in flat_masks.items()}

    for _ in range(steps):
        obs_np = np.asarray(obs).reshape(W * A, -1)
        actions = {
            name: np.asarray(
                policies[name].select_action(obs_np[ids[name]])
            )
            for name in policies
        }
        merged = merge_actions(actions, ids, np.zeros((W, A)))
        env.step_dynamics(merged)
        obs = env.get_obs()
        if render_sim_state:
            frames.append(
                env.vis.plot_simulator_state(
                    env.state, list(render_worlds), zoom_radius=zoom_radius
                )
            )
        if np.asarray(env.get_dones()).all():
            break

    infos = env.get_infos()
    metrics = {}
    for name, m in masks.items():
        m = np.asarray(m)
        n = max(m.sum(), 1)
        metrics[name] = {
            "goal_achieved": float(
                (np.asarray(infos["goal_achieved"]) * m).sum() / n
            ),
            "collided": float((np.asarray(infos["collided"]) * m).sum() / n),
            "off_road": float((np.asarray(infos["off_road"]) * m).sum() / n),
        }
    return (metrics, frames) if render_sim_state else metrics
