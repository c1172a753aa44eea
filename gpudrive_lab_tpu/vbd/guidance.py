"""Sampling-time guidance for the VBD denoiser.

Counterpart of the reference's guidance metrics
(reference: gpudrive/integrations/vbd/guidance_metrics/ — CTG-style losses
steering the reverse diffusion toward goals / away from collisions,
consumed by VBDTest.sample_denoiser in sim_agent/sim_actor.py:12-654).

Each guidance term is a differentiable cost over the trajectories implied by
the (unnormalized) action samples; during each reverse-diffusion step the
cost gradient w.r.t. the noised actions nudges the sample
(classifier-guidance style).  Costs compose additively.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from gpudrive_lab_tpu.vbd.model import (
    DDPMScheduler,
    VBDConfig,
    roll_out,
    unnormalize_actions,
)

# A guidance cost: (trajs [B, A, T, 5], batch) -> scalar cost.
GuidanceCost = Callable[[jnp.ndarray, dict], jnp.ndarray]


def goal_guidance(goals: jnp.ndarray, weight: float = 1.0) -> GuidanceCost:
    """Pull trajectory endpoints toward per-agent goals [B, A, 2]
    (reference: guidance_metrics goal cost)."""

    def cost(trajs, batch):
        end = trajs[..., -1, 0:2]
        m = (batch["agents_interested"] > 0).astype(jnp.float32)
        return weight * (jnp.linalg.norm(end - goals, axis=-1) * m).sum()

    return cost


def collision_guidance(radius: float = 3.0, weight: float = 1.0) -> GuidanceCost:
    """Penalize agent pairs closer than ``radius`` at any step
    (reference: guidance_metrics collision cost)."""

    def cost(trajs, batch):
        pos = trajs[..., 0:2]  # [B, A, T, 2]
        diff = pos[:, :, None, :, :] - pos[:, None, :, :, :]
        # safe norm: sqrt at exactly 0 (the i==i diagonal) has a NaN
        # gradient that would poison the whole guidance step even though the
        # diagonal is masked afterwards
        d = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-9)  # [B, A, A, T]
        A = d.shape[1]
        eye = jnp.eye(A, dtype=bool)[None, :, :, None]
        m = (batch["agents_interested"] > 0).astype(jnp.float32)
        pair_m = m[:, :, None, None] * m[:, None, :, None] * (~eye)
        pen = jnp.maximum(radius - d, 0.0) * pair_m
        return weight * pen.sum()

    return cost


def comfort_guidance(max_accel: float = 4.0, weight: float = 0.1) -> GuidanceCost:
    """Penalize harsh accelerations (reference: guidance_metrics comfort)."""

    def cost(trajs, batch):
        v = jnp.hypot(trajs[..., 3], trajs[..., 4])
        a = jnp.diff(v, axis=-1) / 0.1
        m = (batch["agents_interested"] > 0).astype(jnp.float32)[..., None]
        return weight * (jnp.maximum(jnp.abs(a) - max_accel, 0.0) * m).sum()

    return cost


def sample_denoiser_guided(
    model,
    variables,
    scheduler: DDPMScheduler,
    batch: dict,
    rng,
    config: VBDConfig,
    guidance: Sequence[GuidanceCost] = (),
    guidance_scale: float = 0.05,
    rewards: Sequence = (),
    guidance_iter: int = 5,
    guidance_start: int = 99,
    guidance_end: int = 1,
    scale_grad_by_std: bool = True,
) -> Dict[str, jnp.ndarray]:
    """Reverse diffusion with CTG guidance (reference: sim_actor.py
    ctg_guidance, :98-190): for every diffusion step t in
    [guidance_end, guidance_start], run ``guidance_iter`` Adam steps on the
    posterior mean mu of q(x_{t-1} | x_t, x0_pred) maximizing the summed
    rewards (equivalently minimizing the summed costs), with the Adam
    learning rate optionally scaled by the posterior std, then sample
    x_{t-1} = mu + std * noise.

    ``guidance``: legacy scalar costs ``(trajs, batch) -> cost``.
    ``rewards``: reference-style metrics ``(traj_pred, action_pred, batch)
    -> reward array`` (vbd/guidance_metrics.py); summed and ascended.
    """
    import optax

    B = batch["agents_history"].shape[0]
    A = config.agents_len
    current = batch["agents_history"][:, :A, -1]
    current_states = jnp.concatenate(
        [current[..., 0:3], current[..., 3:5]], axis=-1
    )

    def total_cost(x_norm):
        actions = unnormalize_actions(x_norm, config)
        trajs = roll_out(
            current_states, actions, action_len=config.action_len,
            global_frame=True,
        )
        cost = sum((g(trajs, batch) for g in guidance), jnp.float32(0.0))
        for r in rewards:
            cost = cost - r(trajs, actions, batch).sum()
        return cost

    guided = bool(guidance) or bool(rewards)
    cost_grad = jax.grad(total_cost) if guided else None

    rng, k0 = jax.random.split(rng)
    x_t = jax.random.normal(k0, (B, A, config.action_blocks, 2))
    for step in reversed(range(scheduler.steps)):
        t = jnp.full((B, A), step, jnp.int32)
        denoised, _, _ = model.apply(variables, batch, x_t, t)
        rng, k = jax.random.split(rng)
        if guided and guidance_end <= step <= guidance_start:
            mu, std = scheduler.posterior_mean_std(denoised, x_t, t)
            # scalar posterior std for this t (same for every element)
            std_scalar = jnp.sqrt(
                scheduler.betas[step]
                * (1.0 - (scheduler.alpha_bars[step - 1] if step > 0 else 1.0))
                / (1.0 - scheduler.alpha_bars[step])
            ) if step > 0 else jnp.float32(0.0)
            lr = guidance_scale * (
                std_scalar if (scale_grad_by_std and step > 0) else 1.0
            )
            opt = optax.adam(lr)
            opt_state = opt.init(mu)
            for _ in range(guidance_iter):
                g = cost_grad(mu)
                updates, opt_state = opt.update(g, opt_state)
                mu = optax.apply_updates(mu, updates)
            noise = jax.random.normal(k, x_t.shape)
            x_t = jnp.where(step > 0, mu + std * noise, mu)
        else:
            x_t = scheduler.step(denoised, x_t, t, k)
    actions = unnormalize_actions(x_t, config)
    trajs = roll_out(
        current_states, actions, action_len=config.action_len,
        global_frame=True,
    )
    return {"denoised_actions": actions, "denoised_trajs": trajs}


def _current_states(batch: dict, config: VBDConfig) -> jnp.ndarray:
    current = batch["agents_history"][:, : config.agents_len, -1]
    return jnp.concatenate([current[..., 0:3], current[..., 3:5]], axis=-1)


def _posterior_std_scalar(scheduler: DDPMScheduler, step: int) -> jnp.ndarray:
    """Scalar posterior std of q(x_{t-1} | x_t, x0) at diffusion step t
    (same for every element; reference: noise_scheduler.q_variance)."""
    if step <= 0:
        return jnp.float32(0.0)
    return jnp.sqrt(
        scheduler.betas[step]
        * (1.0 - scheduler.alpha_bars[step - 1])
        / (1.0 - scheduler.alpha_bars[step])
    )


def sample_denoiser_waymo(
    model,
    variables,
    scheduler: DDPMScheduler,
    batch: dict,
    rng,
    config: VBDConfig,
    rewards: Sequence = (),
    gradient_scale: float = 1.0,
    guidance_iter: int = 5,
    guidance_start: int = 99,
    guidance_end: int = 1,
    scale_grad_by_std: bool = True,
) -> Dict[str, jnp.ndarray]:
    """Reverse diffusion with MotionDiffuser-style guidance (reference:
    sim_actor.py waymo_guidance, :192-289): at every guided step the
    posterior mean mu of q(x_{t-1} | x_t, x0_pred) is refined by
    ``guidance_iter`` gradient-ASCENT steps on the summed rewards evaluated
    on the trajectories the DENOISER predicts from mu at step t-1 — i.e.
    the reward gradient flows THROUGH the denoiser (unlike CTG, which rolls
    out mu directly).  Gradients are optionally scaled by the posterior std
    and applied with ``gradient_scale``; then x_{t-1} = mu + std * noise.

    Returns the sample dict plus ``reward_history`` [n_guided_steps,
    guidance_iter] (reference keeps the analogous ``guide_history``)."""
    B = batch["agents_history"].shape[0]
    A = config.agents_len
    current_states = _current_states(batch, config)

    def reward_through_denoiser(mu, t_prev):
        denoised, _, _ = model.apply(variables, batch, mu, t_prev)
        actions = unnormalize_actions(denoised, config)
        trajs = roll_out(
            current_states, actions, action_len=config.action_len,
            global_frame=True,
        )
        total = jnp.float32(0.0)
        for r in rewards:
            total = total + r(trajs, actions, batch).sum()
        return total

    reward_grad = jax.value_and_grad(reward_through_denoiser)
    reward_history = []

    rng, k0 = jax.random.split(rng)
    x_t = jax.random.normal(k0, (B, A, config.action_blocks, 2))
    for step in reversed(range(scheduler.steps)):
        t = jnp.full((B, A), step, jnp.int32)
        denoised, _, _ = model.apply(variables, batch, x_t, t)
        rng, k = jax.random.split(rng)
        if rewards and guidance_end <= step <= guidance_start:
            mu, std = scheduler.posterior_mean_std(denoised, x_t, t)
            std_scalar = _posterior_std_scalar(scheduler, step)
            t_prev = jnp.full((B, A), max(step - 1, 0), jnp.int32)
            step_rewards = []
            for _ in range(guidance_iter):
                r, g = reward_grad(mu, t_prev)
                if scale_grad_by_std and step > 0:
                    g = g * std_scalar
                mu = mu + g * gradient_scale
                step_rewards.append(r)
            reward_history.append(jnp.stack(step_rewards))
            noise = jax.random.normal(k, x_t.shape)
            x_t = jnp.where(step > 0, mu + std * noise, mu)
        else:
            x_t = scheduler.step(denoised, x_t, t, k)
    actions = unnormalize_actions(x_t, config)
    trajs = roll_out(
        current_states, actions, action_len=config.action_len,
        global_frame=True,
    )
    return {
        "denoised_actions": actions,
        "denoised_trajs": trajs,
        "reward_history": (
            jnp.stack(reward_history) if reward_history else jnp.zeros((0,))
        ),
    }


def sample_denoiser_ibr(
    model,
    variables,
    scheduler: DDPMScheduler,
    batch: dict,
    rng,
    config: VBDConfig,
    ego_idx: int,
    adv_idx: int,
    other_idx: Optional[Sequence[int]] = None,
    ego_iter: int = 5,
    adv_iter: int = 5,
    t_react: int = 81,
    adv_use_ctg: bool = False,
    ego_use_ctg: bool = False,
    gradient_scale: float = 0.1,
    guidance_iter: int = 5,
    guidance_start: int = 99,
    guidance_end: int = 1,
    scale_grad_by_std: bool = True,
    overlap_clip: float = 5.0,
) -> Dict[str, jnp.ndarray]:
    """Reverse diffusion with Iterative-Best-Response guidance (reference:
    sim_actor.py ibr_guidance, :290-517): at every guided diffusion step,
    alternate ``adv_iter`` ADVERSARY ascent steps (the adversary is pulled
    toward the ego — negated overlap signed distance, max over time — plus
    an on-road term; only the adversary's action blocks before ``t_react``
    receive gradient) with ``ego_iter`` EGO ascent steps (every agent
    maximizes its minimum saturated evasion distance over time x partners,
    with the adversary's pre-``t_react`` rows pinned so the ego must react;
    reward = onroad + 15 * min-evasion).  Trajectories per inner step come
    from the denoiser at t-1 ("waymo" method) or a direct rollout of mu
    ("ctg" method, 0.1x gradient scale) per ``adv_use_ctg``/``ego_use_ctg``.
    mu is clamped to the scheduler's action clamp after every ascent step.

    Returns the sample dict plus pursue/evasion reward histories."""
    from gpudrive_lab_tpu.vbd.guidance_metrics import (
        onroad_reward,
        overlap_reward,
    )

    B = batch["agents_history"].shape[0]
    A = config.agents_len
    current_states = _current_states(batch, config)

    if other_idx is None:
        ego_aoi = None
        ego_i, adv_i = ego_idx, adv_idx
    else:
        ego_aoi = [adv_idx, ego_idx] + list(other_idx)
        ego_i, adv_i = 1, 0

    # reward factories (reference: sim_actor.py:385-476)
    pursue_overlap = overlap_reward(
        clip=overlap_clip, weight=1.0, aoi=[adv_idx, ego_idx], saturate=False
    )
    adv_onroad = onroad_reward(weight=2.0, aoi=[adv_idx])
    evasion_overlap = overlap_reward(
        clip=overlap_clip, weight=1.0, aoi=ego_aoi, offset=0.5, saturate=True
    )
    ego_onroad = onroad_reward(weight=0.1, aoi=ego_aoi)

    # t_react indexes action blocks in the gradient masks but trajectory
    # steps in the evasion pin (the reference applies the same scalar to
    # both axes); clamp to each axis' length
    n_react = min(t_react, config.action_blocks)
    n_react_traj = min(t_react, config.future_len)

    def trajs_from(mu, t_prev, use_ctg):
        if use_ctg:
            actions = unnormalize_actions(mu, config)
        else:
            denoised, _, _ = model.apply(variables, batch, mu, t_prev)
            actions = unnormalize_actions(denoised, config)
        trajs = roll_out(
            current_states, actions, action_len=config.action_len,
            global_frame=True,
        )
        return trajs, actions

    def adv_reward(mu, t_prev, use_ctg):
        trajs, actions = trajs_from(mu, t_prev, use_ctg)
        sd = pursue_overlap(trajs, actions, batch)  # [B, 2, T, 2]
        pursue = jnp.max(-sd[:, 0, :, 1], axis=-1)  # [B] adv chases ego
        onroad = adv_onroad(trajs, actions, batch).mean(axis=-1)  # [B, 1]
        return pursue.sum() + onroad.sum()

    def ego_reward(mu, t_prev, use_ctg):
        trajs, actions = trajs_from(mu, t_prev, use_ctg)
        ev = evasion_overlap(trajs, actions, batch)  # [B, A', T, A']
        # adversary ignores collisions before t_react (sim_actor.py:449-451)
        ev = ev.at[:, adv_i, :n_react_traj, :].set(100.0)
        ev_min = ev.reshape(ev.shape[0], ev.shape[1], -1).min(axis=-1)
        onroad = ego_onroad(trajs, actions, batch).mean(axis=-1)  # [B, A']
        return (onroad + ev_min * 15.0).sum()

    adv_grad = jax.value_and_grad(adv_reward)
    ego_grad = jax.value_and_grad(ego_reward)

    clamp = scheduler.clamp_val
    pursue_history, evasion_history = [], []

    rng, k0 = jax.random.split(rng)
    x_t = jax.random.normal(k0, (B, A, config.action_blocks, 2))
    for step in reversed(range(scheduler.steps)):
        t = jnp.full((B, A), step, jnp.int32)
        denoised, _, _ = model.apply(variables, batch, x_t, t)
        rng, k = jax.random.split(rng)
        if guidance_end <= step <= guidance_start:
            mu, std = scheduler.posterior_mean_std(denoised, x_t, t)
            std_scalar = _posterior_std_scalar(scheduler, step)
            t_prev = jnp.full((B, A), max(step - 1, 0), jnp.int32)
            adv_mask = jnp.zeros_like(mu).at[:, adv_idx, :n_react, :].set(1.0)
            ego_mask = jnp.ones_like(mu).at[:, adv_idx, :n_react, :].set(0.0)
            for _ in range(guidance_iter):
                for it in range(adv_iter + ego_iter):
                    is_adv = it < adv_iter
                    use_ctg = adv_use_ctg if is_adv else ego_use_ctg
                    # ctg method applies a 0.1x scale (sim_actor.py:375)
                    scale = gradient_scale * (0.1 if use_ctg else 1.0)
                    fn = adv_grad if is_adv else ego_grad
                    r, g = fn(mu, t_prev, use_ctg)
                    g = g * (adv_mask if is_adv else ego_mask)
                    if scale_grad_by_std and step > 0:
                        g = g * std_scalar
                    mu = jnp.clip(mu + g * scale, -clamp, clamp)
                    (pursue_history if is_adv else evasion_history).append(r)
            noise = jax.random.normal(k, x_t.shape)
            x_t = jnp.where(step > 0, mu + std * noise, mu)
        else:
            x_t = scheduler.step(denoised, x_t, t, k)
    actions = unnormalize_actions(x_t, config)
    trajs = roll_out(
        current_states, actions, action_len=config.action_len,
        global_frame=True,
    )
    return {
        "denoised_actions": actions,
        "denoised_trajs": trajs,
        "pursue_history": (
            jnp.stack(pursue_history) if pursue_history else jnp.zeros((0,))
        ),
        "evasion_history": (
            jnp.stack(evasion_history) if evasion_history else jnp.zeros((0,))
        ),
    }


#: Guidance-mode registry (reference: sim_actor.py:54-57 guide_mode
#: dispatch — "ctg" / "waymo"; "ibr" is invoked explicitly there, exposed
#: uniformly here).
GUIDANCE_MODES = {
    "ctg": sample_denoiser_guided,
    "waymo": sample_denoiser_waymo,
    "ibr": sample_denoiser_ibr,
}
