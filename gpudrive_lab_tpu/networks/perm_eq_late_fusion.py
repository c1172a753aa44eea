"""Permutation-equivariant late-fusion actor-critic with separate towers.

Mirror of the reference's SB3 policy network
(reference: gpudrive/networks/perm_eq_late_fusion.py:19-259
LateFusionNet/LateFusionPolicy): per-modality embeddings whose entity sets
are processed permutation-equivariantly (shared weights + max pool), with
SEPARATE actor and value towers (unlike networks/late_fusion.py's shared
head)."""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from gpudrive_lab_tpu import constants as C


@dataclasses.dataclass(frozen=True)
class PermEqConfig:
    action_dim: int = 91
    ego_feat_dim: int = C.EGO_FEAT_DIM
    max_agents: int = C.MAX_AGENTS
    top_k_roads: int = C.MAX_AGENT_MAP_OBS
    embed_dim: int = 64
    tower_layers: Sequence[int] = (128, 64)
    act_func: str = "tanh"
    dtype: Any = jnp.float32

    @property
    def obs_dim(self) -> int:
        return (
            self.ego_feat_dim
            + (self.max_agents - 1) * C.PARTNER_FEAT_DIM
            + self.top_k_roads * C.ROAD_GRAPH_FEAT_DIM
        )


class _Tower(nn.Module):
    layers: Sequence[int]
    act: str
    dtype: Any

    @nn.compact
    def __call__(self, x):
        for h in self.layers:
            x = nn.Dense(h, dtype=self.dtype)(x)
            x = nn.LayerNorm(dtype=self.dtype)(x)
            x = nn.tanh(x) if self.act == "tanh" else nn.gelu(x)
        return x


class LateFusionNet(nn.Module):
    """Feature extractor: ego MLP + permutation-equivariant partner/road
    encoders (shared per-entity Dense, max pool over the set)."""

    config: PermEqConfig = PermEqConfig()

    @nn.compact
    def __call__(self, obs_flat):
        cfg = self.config
        e = cfg.ego_feat_dim
        p = (cfg.max_agents - 1) * C.PARTNER_FEAT_DIM
        ego = obs_flat[..., :e]
        partner = obs_flat[..., e : e + p].reshape(
            obs_flat.shape[:-1] + (cfg.max_agents - 1, C.PARTNER_FEAT_DIM)
        )
        road = obs_flat[..., e + p :].reshape(
            obs_flat.shape[:-1] + (cfg.top_k_roads, C.ROAD_GRAPH_FEAT_DIM)
        )
        embed = lambda x: nn.tanh(
            nn.Dense(cfg.embed_dim, dtype=cfg.dtype)(x)
        )
        ego_e = embed(ego)
        partner_e = embed(partner).max(axis=-2)
        road_e = embed(road).max(axis=-2)
        return jnp.concatenate([ego_e, partner_e, road_e], axis=-1)


class LateFusionPolicy(nn.Module):
    """Separate actor/value towers over the shared extractor
    (reference: perm_eq_late_fusion.py LateFusionPolicy)."""

    config: PermEqConfig = PermEqConfig()

    @nn.compact
    def __call__(self, obs_flat):
        cfg = self.config
        feats = LateFusionNet(cfg)(obs_flat)
        pi = _Tower(cfg.tower_layers, cfg.act_func, cfg.dtype)(feats)
        vf = _Tower(cfg.tower_layers, cfg.act_func, cfg.dtype)(feats)
        logits = nn.Dense(
            cfg.action_dim, dtype=cfg.dtype,
            kernel_init=nn.initializers.orthogonal(0.01),
        )(pi)
        value = nn.Dense(
            1, dtype=cfg.dtype, kernel_init=nn.initializers.orthogonal(1.0)
        )(vf)
        return logits.astype(jnp.float32), value[..., 0].astype(jnp.float32)
