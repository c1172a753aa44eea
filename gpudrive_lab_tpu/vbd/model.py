"""Versatile Behavior Diffusion — flax implementation.

TPU-native port of the reference's VBD model family
(reference: gpudrive/integrations/vbd/model/VBD.py:16-694,
modules.py:15-360, model_utils.py roll_out / DDPM sampler in utils.py):

  * ``Encoder``: GRU agent-history encoder + PointNet-style map polyline
    encoder fused by a relation-aware transformer (relative-position Fourier
    biases standing in for the reference's query-centric QCMHA).
  * ``Denoiser``: agent queries over noised normalized action sequences +
    sinusoidal diffusion-step embedding, cross-attending to the scene tokens;
    predicts the DENOISED action sequence (x0-parametrization, as the
    reference's q_x0 path).
  * ``GoalPredictor``: per-anchor scores + action proposals.
  * ``DDPMScheduler``: cosine-beta schedule, add_noise / posterior step.
  * ``roll_out``: accel/yaw-rate unicycle integration of action blocks
    (action_len steps each) into (x, y, yaw, vx, vy) trajectories.

No pretrained checkpoint ships with this repo; the model trains from scratch
with ``denoise_loss`` and plugs into the simulator through
``VBDTrajectorySource`` (vbd/integration.py protocol).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class VBDConfig:
    future_len: int = 80
    agents_len: int = 32
    action_len: int = 5
    diffusion_steps: int = 10
    encoder_layers: int = 2
    hidden_dim: int = 256
    num_heads: int = 8
    action_mean: tuple = (0.0, 0.0)
    action_std: tuple = (1.0, 0.15)
    dtype: Any = jnp.float32

    @property
    def action_blocks(self) -> int:
        return self.future_len // self.action_len


# ---------------------------------------------------------------------------
# dynamics (reference: model_utils.py roll_out)
# ---------------------------------------------------------------------------


def roll_out(current_states, actions, dt=0.1, action_len=5,
             global_frame=True, rng=None):
    """current_states [..., 5] (x, y, theta, vx, vy); actions
    [..., T_blocks, 2] (accel, yaw_rate) -> trajs [..., T, 5]."""
    x = current_states[..., 0]
    y = current_states[..., 1]
    theta = current_states[..., 2]
    v = jnp.hypot(current_states[..., 3], current_states[..., 4])

    a = jnp.repeat(actions[..., 0], action_len, axis=-1)
    yaw_rate = jnp.repeat(actions[..., 1], action_len, axis=-1)
    if rng is not None:  # training-time jitter (reference adds N(0, .1)/N(0,.01))
        k1, k2 = jax.random.split(rng)
        v_noise = jax.random.normal(k1, a.shape) * 0.1
        y_noise = jax.random.normal(k2, a.shape) * 0.01
    else:
        v_noise = 0.0
        y_noise = 0.0

    v_t = v[..., None] + jnp.cumsum(a * dt, axis=-1) + v_noise
    v_t = jnp.maximum(v_t, 0.0)
    yaw_rate = yaw_rate + y_noise
    if global_frame:
        theta_t = theta[..., None] + jnp.cumsum(yaw_rate * dt, axis=-1)
    else:
        theta_t = jnp.cumsum(yaw_rate * dt, axis=-1)
    vx = v_t * jnp.cos(theta_t)
    vy = v_t * jnp.sin(theta_t)
    if global_frame:
        xs = x[..., None] + jnp.cumsum(vx * dt, axis=-1)
        ys = y[..., None] + jnp.cumsum(vy * dt, axis=-1)
    else:
        xs = jnp.cumsum(vx * dt, axis=-1)
        ys = jnp.cumsum(vy * dt, axis=-1)
    return jnp.stack([xs, ys, theta_t, vx, vy], axis=-1)


def inverse_roll_out(trajs, current_states, dt=0.1, action_len=5):
    """Trajectories -> mean accel / yaw-rate per action block (the inverse
    used to diffuse ground-truth futures)."""
    theta = jnp.concatenate(
        [current_states[..., 2:3], trajs[..., 2]], axis=-1
    )
    v = jnp.concatenate(
        [
            jnp.hypot(current_states[..., 3], current_states[..., 4])[..., None],
            jnp.hypot(trajs[..., 3], trajs[..., 4]),
        ],
        axis=-1,
    )
    a = jnp.diff(v, axis=-1) / dt
    yr = jnp.diff(theta, axis=-1) / dt
    B = a.shape[:-1]
    blocks = a.shape[-1] // action_len
    a = a.reshape(B + (blocks, action_len)).mean(-1)
    yr = yr.reshape(B + (blocks, action_len)).mean(-1)
    return jnp.stack([a, yr], axis=-1)


# ---------------------------------------------------------------------------
# diffusion schedule (reference: utils.py DDPM_Sampler, cosine schedule)
# ---------------------------------------------------------------------------


class DDPMScheduler:
    def __init__(self, steps: int = 10, clamp_val: float = 5.0):
        self.steps = steps
        s = 0.008
        t = np.linspace(0, steps, steps + 1) / steps
        alpha_bar = np.cos((t + s) / (1 + s) * np.pi / 2) ** 2
        betas = np.clip(1 - alpha_bar[1:] / alpha_bar[:-1], 0, 0.999)
        self.betas = jnp.asarray(betas, jnp.float32)
        self.alphas = 1.0 - self.betas
        self.alpha_bars = jnp.asarray(
            np.cumprod(1 - betas), jnp.float32
        )
        self.clamp_val = clamp_val

    def add_noise(self, x0, noise, t):
        """q(x_t | x_0); t broadcastable int array."""
        ab = self.alpha_bars[t]
        while ab.ndim < x0.ndim:
            ab = ab[..., None]
        return jnp.sqrt(ab) * x0 + jnp.sqrt(1.0 - ab) * noise

    def posterior_mean_std(self, x0_pred, x_t, t):
        """Mean and std of q(x_{t-1} | x_t, x0) (the reference scheduler's
        q_mean / q_variance, integrations/vbd/model/utils.py DDPM_Sampler,
        used by CTG guidance in sim_actor.py:125-140)."""
        x0_pred = jnp.clip(x0_pred, -self.clamp_val, self.clamp_val)
        ab_t = self.alpha_bars[t]
        ab_prev = jnp.where(t > 0, self.alpha_bars[jnp.maximum(t - 1, 0)], 1.0)
        beta_t = self.betas[t]
        for _ in range(x_t.ndim - jnp.ndim(ab_t)):
            ab_t = ab_t[..., None]
            ab_prev = ab_prev[..., None]
            beta_t = beta_t[..., None]
        coef_x0 = jnp.sqrt(ab_prev) * beta_t / (1.0 - ab_t)
        coef_xt = (
            jnp.sqrt(1.0 - beta_t) * (1.0 - ab_prev) / (1.0 - ab_t)
        )
        mean = coef_x0 * x0_pred + coef_xt * x_t
        var = beta_t * (1.0 - ab_prev) / (1.0 - ab_t)
        return mean, jnp.sqrt(var)

    def step(self, x0_pred, x_t, t, rng):
        """One reverse step using the predicted x0 (posterior q(x_{t-1} |
        x_t, x0))."""
        mean, std = self.posterior_mean_std(x0_pred, x_t, t)
        noise = jax.random.normal(rng, x_t.shape)
        t_b = t
        while jnp.ndim(t_b) < x_t.ndim:
            t_b = jnp.asarray(t_b)[..., None]
        return jnp.where(t_b > 0, mean + std * noise, mean)


# ---------------------------------------------------------------------------
# modules
# ---------------------------------------------------------------------------


class FourierEmbedding(nn.Module):
    """reference: modules.py:21 FourierEmbedding(input_dim=3)."""

    out_dim: int
    num_bands: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        freqs = self.param(
            "freqs", nn.initializers.normal(1.0), (x.shape[-1], self.num_bands)
        )
        ang = 2 * jnp.pi * x[..., None] * freqs
        feats = jnp.concatenate(
            [jnp.sin(ang), jnp.cos(ang)], axis=-1
        ).reshape(x.shape[:-1] + (-1,))
        feats = jnp.concatenate([feats, x], axis=-1)
        return nn.Dense(self.out_dim, dtype=self.dtype)(feats)


class AgentEncoder(nn.Module):
    """GRU over per-agent history (reference: modules.py:216-229)."""

    hidden: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, history):
        # history: [B, N, H, 8]
        B, N, H, F = history.shape
        x = history.reshape(B * N, H, F)
        outs = nn.RNN(nn.GRUCell(self.hidden, dtype=self.dtype))(x)
        return outs[:, -1].reshape(B, N, self.hidden)


class MapEncoder(nn.Module):
    """Point MLP + max-pool per polyline (reference: modules.py:231-252)."""

    hidden: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, polylines):
        # polylines: [B, P, K, 5] — use (x, y, heading) like the reference's
        # 3-feature point MLP plus a type embedding.
        pts = polylines[..., :3]
        h = nn.Dense(128, dtype=self.dtype)(pts)
        h = nn.relu(h)
        h = nn.Dense(self.hidden, dtype=self.dtype)(h)
        pooled = jnp.max(h, axis=-2)
        ptype = polylines[..., 0, 4].astype(jnp.int32)
        emb = nn.Embed(32, self.hidden, dtype=self.dtype)(
            jnp.clip(ptype, 0, 31)
        )
        return pooled + emb


class RelationAttentionLayer(nn.Module):
    """Self-attention with additive relative-position bias — the flax stand-in
    for the reference's QCMHA (modules.py:268-360)."""

    hidden: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens, rel_emb, pad_mask):
        # tokens [B, T, D]; rel_emb [B, T, T, heads];
        # pad_mask [B, T] (True = PADDING, masked out of the keys)
        D, Hd = self.hidden, self.heads
        x = nn.LayerNorm(dtype=self.dtype)(tokens)
        qkv = nn.Dense(3 * D, dtype=self.dtype)(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        split = lambda z: z.reshape(z.shape[0], z.shape[1], Hd, D // Hd)
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", split(q), split(k),
            preferred_element_type=jnp.float32,
        ) / np.sqrt(D // Hd)
        logits = logits + jnp.transpose(rel_emb, (0, 3, 1, 2))
        logits = jnp.where(pad_mask[:, None, None, :], -1e9, logits)
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum(
            "bhqk,bkhd->bqhd", attn, split(v),
            preferred_element_type=jnp.float32,
        ).reshape(tokens.shape)
        tokens = tokens + nn.Dense(D, dtype=self.dtype)(out)
        h = nn.LayerNorm(dtype=self.dtype)(tokens)
        h = nn.Dense(4 * D, dtype=self.dtype)(h)
        h = nn.gelu(h)
        tokens = tokens + nn.Dense(D, dtype=self.dtype)(h)
        return tokens


class Encoder(nn.Module):
    """Scene encoder (reference: modules.py:15-78)."""

    config: VBDConfig

    @nn.compact
    def __call__(self, agents_history, polylines, agents_valid, maps_valid):
        """``agents_valid``/``maps_valid``: True = real token.  Internally the
        pad mask (True = padding) drives the attention layers; the returned
        ``valid_mask`` keeps the True = real convention for consumers."""
        cfg = self.config
        D = cfg.hidden_dim
        a_tok = AgentEncoder(D, cfg.dtype)(agents_history)
        m_tok = MapEncoder(D, cfg.dtype)(polylines)
        tokens = jnp.concatenate([a_tok, m_tok], axis=1)
        valid_mask = jnp.concatenate([agents_valid, maps_valid], axis=1)
        pad_mask = ~valid_mask

        # relative positions between token anchor points
        a_pos = agents_history[:, :, -1, 0:2]
        a_yaw = agents_history[:, :, -1, 2:3]
        m_pos = polylines[:, :, 0, 0:2]
        m_yaw = polylines[:, :, 0, 2:3]
        pos = jnp.concatenate([a_pos, m_pos], axis=1)
        yaw = jnp.concatenate([a_yaw, m_yaw], axis=1)
        rel = jnp.concatenate(
            [
                pos[:, None, :, :] - pos[:, :, None, :],
                yaw[:, None, :, :] - yaw[:, :, None, :],
            ],
            axis=-1,
        )
        rel_emb = FourierEmbedding(cfg.num_heads, dtype=cfg.dtype)(
            rel / 100.0
        )
        for _ in range(cfg.encoder_layers):
            tokens = RelationAttentionLayer(D, cfg.num_heads, cfg.dtype)(
                tokens, rel_emb, pad_mask
            )
        return tokens, valid_mask


def diffusion_step_embedding(t, dim):
    half = dim // 2
    freqs = jnp.exp(
        -np.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half
    )
    ang = t[..., None].astype(jnp.float32) * freqs
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


class Denoiser(nn.Module):
    """reference: modules.py:156-214."""

    config: VBDConfig

    @nn.compact
    def __call__(self, scene_tokens, scene_valid, noisy_actions, diffusion_step):
        """``scene_valid``: True = real token (flax MHA convention:
        mask True = attend)."""
        cfg = self.config
        D = cfg.hidden_dim
        B, A = noisy_actions.shape[:2]
        act = noisy_actions.reshape(B, A, -1)
        h = nn.Dense(D, dtype=cfg.dtype)(act)
        step_emb = diffusion_step_embedding(diffusion_step, D)  # [B, A, D]
        h = h + nn.Dense(D, dtype=cfg.dtype)(step_emb)
        # agent self-attention
        agent_valid = scene_valid[:, :A]
        for _ in range(2):
            x = nn.LayerNorm(dtype=cfg.dtype)(h)
            attn = nn.MultiHeadDotProductAttention(
                cfg.num_heads, dtype=cfg.dtype
            )(x, x, mask=agent_valid[:, None, None, :])
            h = h + attn
            # cross-attention over the full scene
            x = nn.LayerNorm(dtype=cfg.dtype)(h)
            attn = nn.MultiHeadDotProductAttention(
                cfg.num_heads, dtype=cfg.dtype
            )(x, scene_tokens, mask=scene_valid[:, None, None, :])
            h = h + attn
            x = nn.LayerNorm(dtype=cfg.dtype)(h)
            x = nn.Dense(4 * D, dtype=cfg.dtype)(x)
            h = h + nn.Dense(D, dtype=cfg.dtype)(nn.gelu(x))
        out = nn.Dense(
            cfg.action_blocks * 2, dtype=cfg.dtype
        )(nn.LayerNorm(dtype=cfg.dtype)(h))
        return out.reshape(B, A, cfg.action_blocks, 2).astype(jnp.float32)


class GoalPredictor(nn.Module):
    """reference: modules.py:80-154."""

    config: VBDConfig

    @nn.compact
    def __call__(self, scene_tokens, scene_valid, anchors):
        cfg = self.config
        D = cfg.hidden_dim
        B, A, Q, _ = anchors.shape
        a_emb = nn.Dense(128, dtype=cfg.dtype)(anchors)
        a_emb = nn.relu(a_emb)
        a_emb = nn.Dense(D, dtype=cfg.dtype)(a_emb)
        agent_tok = scene_tokens[:, :A][:, :, None, :]
        h = a_emb + agent_tok
        x = nn.LayerNorm(dtype=cfg.dtype)(h.reshape(B, A * Q, D))
        attn = nn.MultiHeadDotProductAttention(cfg.num_heads, dtype=cfg.dtype)(
            x, scene_tokens, mask=scene_valid[:, None, None, :]
        )
        h = (h.reshape(B, A * Q, D) + attn).reshape(B, A, Q, D)
        actions = nn.Dense(cfg.action_blocks * 2, dtype=cfg.dtype)(h)
        scores = nn.Dense(1, dtype=cfg.dtype)(nn.elu(h))[..., 0]
        return (
            actions.reshape(B, A, Q, cfg.action_blocks, 2).astype(jnp.float32),
            scores.astype(jnp.float32),
        )


class VBDModel(nn.Module):
    """Encoder + denoiser + goal predictor (reference: VBD.py:16-130)."""

    config: VBDConfig

    def setup(self):
        self.encoder = Encoder(self.config)
        self.denoiser = Denoiser(self.config)
        self.predictor = GoalPredictor(self.config)

    def encode(self, batch):
        agents_valid = batch["agents_id"] >= 0
        maps_valid = jnp.any(batch["polylines"][..., 4] > 0, axis=-1)
        return self.encoder(
            batch["agents_history"], batch["polylines"], agents_valid,
            maps_valid,
        )

    def __call__(self, batch, noised_actions_normalized, diffusion_step):
        tokens, mask = self.encode(batch)
        denoised = self.denoiser(
            tokens, mask, noised_actions_normalized, diffusion_step
        )
        anchors = batch.get("anchors")
        if anchors is not None:
            goal_actions, goal_scores = self.predictor(tokens, mask, anchors)
        else:
            goal_actions = goal_scores = None
        return denoised, goal_actions, goal_scores


# ---------------------------------------------------------------------------
# training / sampling drivers
# ---------------------------------------------------------------------------


def normalize_actions(actions, config: VBDConfig):
    mean = jnp.asarray(config.action_mean)
    std = jnp.asarray(config.action_std)
    return (actions - mean) / std


def unnormalize_actions(actions, config: VBDConfig):
    mean = jnp.asarray(config.action_mean)
    std = jnp.asarray(config.action_std)
    return actions * std + mean


def denoise_loss(model, variables, scheduler, batch, gt_actions, rng,
                 config: VBDConfig):
    """Sample a diffusion step per agent, noise the normalized GT actions,
    predict x0, smooth-L1 on actions (reference: VBD.py:434-482)."""
    k_t, k_n = jax.random.split(rng)
    B, A = gt_actions.shape[:2]
    t = jax.random.randint(k_t, (B, A), 0, scheduler.steps)
    x0 = normalize_actions(gt_actions, config)
    noise = jax.random.normal(k_n, x0.shape)
    x_t = scheduler.add_noise(x0, noise, t)
    denoised, _, _ = model.apply(variables, batch, x_t, t)
    diff = jnp.abs(denoised - x0)
    loss = jnp.where(diff < 1.0, 0.5 * diff * diff, diff - 0.5)
    m = (batch["agents_interested"] > 0).astype(jnp.float32)[..., None, None]
    return (loss * m).sum() / jnp.maximum(m.sum() * loss.shape[-1] * loss.shape[-2], 1.0)


def sample_denoiser(model, variables, scheduler, batch, rng,
                    config: VBDConfig):
    """Reverse diffusion from pure noise; returns dict with denoised_trajs
    [B, A, future_len, 5] (reference: sim_agent/sim_actor.py sample_denoiser)."""
    B = batch["agents_history"].shape[0]
    A = config.agents_len
    rng, k0 = jax.random.split(rng)
    x_t = jax.random.normal(k0, (B, A, config.action_blocks, 2))
    for step in reversed(range(scheduler.steps)):
        t = jnp.full((B, A), step, jnp.int32)
        denoised, _, _ = model.apply(variables, batch, x_t, t)
        rng, k = jax.random.split(rng)
        x_t = scheduler.step(denoised, x_t, t, k)
    actions = unnormalize_actions(x_t, config)
    current = batch["agents_history"][:, :A, -1]
    current_states = jnp.concatenate(
        [current[..., 0:3], current[..., 3:5]], axis=-1
    )
    trajs = roll_out(
        current_states, actions, action_len=config.action_len,
        global_frame=True,
    )
    return {"denoised_actions": actions, "denoised_trajs": trajs}
