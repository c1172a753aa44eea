"""Attention primitives and the BC policy networks.

Flax re-implementation of the fork's IL model stack
(reference: gpudrive/integrations/il/model/networks.py — rotary multi-head
attention :132-289, self/cross perceiver blocks :584-805, GMM head :807-871 —
and model.py:10-163 EarlyFusionAttnBCNet).

Token layout: per-modality MLP embeddings of frame-stacked features, masked
self-attention within road-object and road-graph token sets, ego-query cross
attention over each, concatenated into the action context for a GMM head
(n_components diagonal Gaussians over the action space).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from gpudrive_lab_tpu import constants as C


@dataclasses.dataclass(frozen=True)
class BCConfig:
    """reference: baselines/il/config (network_dim etc.)."""

    network_dim: int = 128
    num_head: int = 4
    num_fusion_layers: int = 2
    num_modal_layers: int = 1
    gmm_components: int = 6
    action_dim: int = 3
    num_stack: int = 5
    # Theory-of-mind auxiliary task: predict partner action classes from
    # their fused tokens (reference: model.py:25-31 aux_head via use_tom,
    # il.yaml:44-46)
    use_tom: bool = False
    tom_classes: int = 64
    ego_feat: int = C.EGO_FEAT_DIM
    ro_feat: int = C.PARTNER_FEAT_DIM
    rg_feat: int = C.ROAD_GRAPH_FEAT_DIM
    ro_max: int = C.MAX_AGENTS - 1
    rg_max: int = C.MAX_AGENT_MAP_OBS
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @property
    def frame_dim(self) -> int:
        return (
            self.ego_feat
            + self.ro_max * self.ro_feat
            + self.rg_max * self.rg_feat
        )

    @property
    def obs_dim(self) -> int:
        return self.num_stack * self.frame_dim


def rotary_embedding(x: jnp.ndarray) -> jnp.ndarray:
    """Rotary position encoding over the token axis
    (reference: networks.py:132-190 RotaryEmbedding)."""
    B, N, D = x.shape
    half = D // 2
    freqs = 1.0 / (10000 ** (jnp.arange(0, half, dtype=jnp.float32) / half))
    pos = jnp.arange(N, dtype=jnp.float32)
    angles = pos[:, None] * freqs[None, :]  # [N, half]
    cos = jnp.cos(angles)[None]
    sin = jnp.sin(angles)[None]
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate(
        [x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1
    )


class MultiHeadAttention(nn.Module):
    """MHA with optional rotary embeddings and key-padding mask
    (reference: networks.py:132-289)."""

    num_heads: int
    qk_channels: int
    v_channels: int
    out_channels: int
    rotary: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q_in, kv_in, mask: Optional[jnp.ndarray] = None):
        """q_in: [B, Nq, Dq]; kv_in: [B, Nk, Dk]; mask: [B, Nk] bool of
        PADDED (invalid) keys."""
        H = self.num_heads
        q = nn.Dense(self.qk_channels, dtype=self.dtype)(q_in)
        k = nn.Dense(self.qk_channels, dtype=self.dtype)(kv_in)
        v = nn.Dense(self.v_channels, dtype=self.dtype)(kv_in)
        if self.rotary:
            q = rotary_embedding(q)
            k = rotary_embedding(k)
        split = lambda x, c: x.reshape(x.shape[0], x.shape[1], H, c // H)
        q = split(q, self.qk_channels)
        k = split(k, self.qk_channels)
        v = split(v, self.v_channels)
        scale = (self.qk_channels // H) ** -0.5
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * scale
        if mask is not None:
            logits = jnp.where(mask[:, None, None, :], -1e9, logits)
        attn = jax.nn.softmax(logits, axis=-1)
        # Recorded for the fork's importance-weight analysis (reference:
        # baselines/il/test/importance_weight.py:69 reads the ego->partner
        # attention as the per-head importance over partners).  Retrieved via
        # mutable=["intermediates"]; free when not requested.
        self.sow("intermediates", "attn_weights", attn)
        out = jnp.einsum(
            "bhqk,bkhd->bqhd", attn, v, preferred_element_type=jnp.float32
        )
        out = out.reshape(out.shape[0], out.shape[1], self.v_channels)
        return nn.Dense(self.out_channels, dtype=self.dtype)(out)


class SelfAttentionBlock(nn.Module):
    """Pre-norm transformer self-attention stack
    (reference: networks.py:584-700 SelfAttentionBlock)."""

    num_layers: int
    num_heads: int
    num_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None):
        D = self.num_channels
        for _ in range(self.num_layers):
            h = nn.LayerNorm(dtype=self.dtype)(x)
            h = MultiHeadAttention(
                self.num_heads, D, D, D, dtype=self.dtype
            )(h, h, mask)
            x = x + h
            h = nn.LayerNorm(dtype=self.dtype)(x)
            h = nn.Dense(4 * D, dtype=self.dtype)(h)
            h = nn.gelu(h)
            h = nn.Dense(D, dtype=self.dtype)(h)
            x = x + h
        return x


class CrossAttentionLayer(nn.Module):
    """Perceiver-style query cross-attention
    (reference: networks.py:700-805 CrossAttentionLayer)."""

    num_heads: int
    num_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q, kv, mask: Optional[jnp.ndarray] = None):
        D = self.num_channels
        h = MultiHeadAttention(self.num_heads, D, D, D, dtype=self.dtype)(
            nn.LayerNorm(dtype=self.dtype)(q),
            nn.LayerNorm(dtype=self.dtype)(kv),
            mask,
        )
        x = q + h
        h = nn.LayerNorm(dtype=self.dtype)(x)
        h = nn.Dense(4 * D, dtype=self.dtype)(h)
        h = nn.gelu(h)
        h = nn.Dense(D, dtype=self.dtype)(h)
        return x + h


class GMMHead(nn.Module):
    """Diagonal-covariance Gaussian-mixture action head
    (reference: networks.py:807-871 GMM, n_components=6)."""

    config: BCConfig

    @nn.compact
    def __call__(self, context):
        cfg = self.config
        K, D = cfg.gmm_components, cfg.action_dim
        h = nn.Dense(cfg.network_dim, dtype=cfg.dtype)(context)
        h = nn.relu(h)
        means = nn.Dense(K * D, dtype=cfg.dtype)(h).reshape(
            context.shape[:-1] + (K, D)
        )
        log_std = nn.Dense(K * D, dtype=cfg.dtype)(h).reshape(
            context.shape[:-1] + (K, D)
        )
        log_std = jnp.clip(log_std, -5.0, 2.0)
        logits = nn.Dense(K, dtype=cfg.dtype)(h)
        weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return (
            means.astype(jnp.float32),
            jnp.exp(2.0 * log_std).astype(jnp.float32),  # variances
            weights,
        )


class EarlyFusionAttnBCNet(nn.Module):
    """reference: integrations/il/model/model.py:10-163."""

    config: BCConfig

    def unpack_obs(self, obs_flat):
        """Split stacked flat obs into per-modality token stacks
        (reference: model.py:80-110 _unpack_obs): frame stacking moves into
        the feature dim per token."""
        cfg = self.config
        ns = cfg.num_stack
        ego_size = cfg.ego_feat
        ro_size = cfg.ro_feat * cfg.ro_max
        rg_size = cfg.rg_feat * cfg.rg_max
        B = obs_flat.shape[0]
        frames = obs_flat.reshape(B, ns, ego_size + ro_size + rg_size)
        ego = frames[..., :ego_size].reshape(B, ns * ego_size)
        ro = (
            frames[..., ego_size : ego_size + ro_size]
            .reshape(B, ns, cfg.ro_max, cfg.ro_feat)
            .transpose(0, 2, 1, 3)
            .reshape(B, cfg.ro_max, ns * cfg.ro_feat)
        )
        rg = (
            frames[..., ego_size + ro_size :]
            .reshape(B, ns, cfg.rg_max, cfg.rg_feat)
            .transpose(0, 2, 1, 3)
            .reshape(B, cfg.rg_max, ns * cfg.rg_feat)
        )
        return ego, ro, rg

    @nn.compact
    def __call__(self, obs_flat, ro_mask=None, rg_mask=None):
        """obs_flat: [B, num_stack * frame_dim]; ro_mask: [B, ro_max] bool of
        masked-out partners; rg_mask: [B, rg_max].  Returns the fused context
        [B, 3*network_dim] and GMM params."""
        cfg = self.config
        D = cfg.dtype
        ego, ro, rg = self.unpack_obs(obs_flat)

        def embed(x, dim):
            h = nn.Dense(cfg.network_dim, dtype=D)(x)
            h = nn.LayerNorm(dtype=D)(h)
            h = nn.gelu(h)
            return nn.Dense(cfg.network_dim, dtype=D)(h)

        ego_e = embed(ego, cfg.network_dim)[:, None, :]  # [B, 1, D]
        ro_e = embed(ro, cfg.network_dim)
        rg_e = embed(rg, cfg.network_dim)

        ro_e = SelfAttentionBlock(
            cfg.num_modal_layers, cfg.num_head, cfg.network_dim, dtype=D
        )(ro_e, ro_mask)
        rg_e = SelfAttentionBlock(
            cfg.num_modal_layers, cfg.num_head, cfg.network_dim, dtype=D
        )(rg_e, rg_mask)

        fused = SelfAttentionBlock(
            cfg.num_fusion_layers, cfg.num_head, cfg.network_dim, dtype=D
        )(
            jnp.concatenate([ego_e, ro_e, rg_e], axis=1),
            None
            if ro_mask is None
            else jnp.concatenate(
                [
                    jnp.zeros((obs_flat.shape[0], 1), bool),
                    ro_mask,
                    rg_mask,
                ],
                axis=1,
            ),
        )
        ego_f = fused[:, :1]
        ro_f = fused[:, 1 : 1 + cfg.ro_max]
        rg_f = fused[:, 1 + cfg.ro_max :]

        ego_ro = CrossAttentionLayer(
            cfg.num_head, cfg.network_dim, dtype=D, name="ego_ro_cross"
        )(ego_f, ro_f, ro_mask)[:, 0]
        ego_rg = CrossAttentionLayer(
            cfg.num_head, cfg.network_dim, dtype=D, name="ego_rg_cross"
        )(ego_f, rg_f, rg_mask)[:, 0]
        context = jnp.concatenate([ego_f[:, 0], ego_ro, ego_rg], axis=-1)
        # Fused per-modality tokens for linear probing / intervention
        # analysis (reference: intervention.py:101 hooks ro_attn layers).
        self.sow("intermediates", "ego_token", ego_f[:, 0])
        self.sow("intermediates", "ro_tokens", ro_f)

        means, variances, weights = GMMHead(cfg)(context)
        if cfg.use_tom:
            h = nn.Dense(cfg.network_dim, dtype=D)(ro_f)
            h = nn.relu(h)
            tom_logits = nn.Dense(cfg.tom_classes, dtype=D)(h)
            self.sow("intermediates", "tom_logits", tom_logits)
        return context, (means, variances, weights)


def tom_aux_loss(tom_logits, partner_action_labels, partner_mask):
    """Cross-entropy over non-masked partners' action classes
    (reference: loss.py:7-30 aux_loss, unweighted variant)."""
    import optax

    per = optax.softmax_cross_entropy_with_integer_labels(
        tom_logits, partner_action_labels
    )
    keep = (~partner_mask).astype(jnp.float32)
    return (per * keep).sum() / jnp.maximum(keep.sum(), 1.0)


def gmm_log_prob(actions, means, variances, weights):
    """Mixture log-likelihood with diagonal covariance
    (reference: loss.py:32-50 gmm_loss)."""
    diff = actions[..., None, :] - means  # [..., K, D]
    inv = 1.0 / variances
    log_det = jnp.sum(jnp.log(variances), axis=-1)
    d = means.shape[-1]
    log_probs = -0.5 * (
        jnp.sum(diff * diff * inv, axis=-1)
        + log_det
        + d * jnp.log(2.0 * jnp.pi)
    )
    weighted = log_probs + jnp.log(weights + 1e-8)
    return jax.nn.logsumexp(weighted, axis=-1)


def gmm_sample(rng, means, variances, weights, deterministic=False):
    """Sample (or take the dominant mean) from the mixture
    (reference: GMM head get_action)."""
    if deterministic:
        k = jnp.argmax(weights, axis=-1)
        return jnp.take_along_axis(
            means, k[..., None, None], axis=-2
        )[..., 0, :]
    k_rng, g_rng = jax.random.split(rng)
    k = jax.random.categorical(k_rng, jnp.log(weights + 1e-8), axis=-1)
    mean = jnp.take_along_axis(means, k[..., None, None], axis=-2)[..., 0, :]
    var = jnp.take_along_axis(variances, k[..., None, None], axis=-2)[..., 0, :]
    return mean + jnp.sqrt(var) * jax.random.normal(g_rng, mean.shape)
