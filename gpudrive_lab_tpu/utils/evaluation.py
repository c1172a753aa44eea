"""Policy evaluation rollouts.

Mirror of the reference's experimental eval utilities
(reference: examples/experimental/eval_utils.py rollout + evaluate_policy):
roll a policy (or expert replay) across the env's scene batches and report
per-scene and aggregate goal/collision/off-road rates.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gpudrive_lab_tpu.env.env_jax import GPUDriveTPUEnv, _slice_t


def rollout(
    env: GPUDriveTPUEnv,
    select_actions: Optional[Callable] = None,
    max_steps: Optional[int] = None,
) -> dict:
    """One episode on the current scene batch.

    select_actions(obs [W, A, D]) -> [W, A] action indices; None replays
    experts.  Returns per-world metrics."""
    obs = env.reset()
    expert_actions = None
    if select_actions is None:
        expert_actions, _, _, _, _ = env.get_expert_actions()
    for t in range(max_steps or env.episode_len):
        if select_actions is None:
            env.step_dynamics(_slice_t(expert_actions, t))
        else:
            env.step_dynamics(select_actions(obs))
        obs = env.get_obs()
        if np.asarray(env.get_dones()).all():
            break

    infos = env.get_infos()
    ctrl = np.asarray(env.cont_agent_mask)
    valid = np.asarray(env.scene.agents.valid)
    mask = ctrl if ctrl.any() else valid
    n = np.maximum(mask.sum(axis=1), 1)
    goal = (np.asarray(infos["goal_achieved"]) * mask).sum(axis=1) / n
    coll = (np.clip(np.asarray(infos["collided"]), 0, 1) * mask).sum(axis=1) / n
    off = (np.clip(np.asarray(infos["off_road"]), 0, 1) * mask).sum(axis=1) / n
    names = env.get_env_filenames()
    return {
        "per_scene": [
            dict(scene=names[w], goal_achieved=float(goal[w]),
                 collided=float(coll[w]), off_road=float(off[w]))
            for w in range(env.num_worlds)
        ],
        "goal_achieved": float(goal.mean()),
        "collided": float(coll.mean()),
        "off_road": float(off.mean()),
    }


def evaluate_policy(
    env: GPUDriveTPUEnv,
    policy,
    variables,
    num_batches: int = 1,
    deterministic: bool = True,
    seed: int = 0,
) -> dict:
    """Evaluate a late-fusion policy over ``num_batches`` scene batches
    (reference: eval_utils.evaluate_policy)."""
    from gpudrive_lab_tpu.networks.late_fusion import sample_logits

    apply = jax.jit(policy.apply)
    rng = jax.random.PRNGKey(seed)

    def select(obs):
        nonlocal rng
        rng, k = jax.random.split(rng)
        logits, _ = apply(variables, obs)
        a, _, _ = sample_logits(k, logits, deterministic=deterministic)
        return a

    results = []
    for b in range(num_batches):
        results.append(rollout(env, select))
        if b + 1 < num_batches:
            env.swap_data_batch()
    agg = {
        k: float(np.mean([r[k] for r in results]))
        for k in ("goal_achieved", "collided", "off_road")
    }
    agg["per_scene"] = [s for r in results for s in r["per_scene"]]
    return agg
