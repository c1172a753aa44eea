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
