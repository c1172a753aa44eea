"""Flat feed-forward actor-critic baseline.

Mirror of the reference's FFN/FeedForwardPolicy
(reference: gpudrive/networks/basic_ffn.py:10-112): an MLP over the full
flattened observation, no per-modality structure."""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class FFNConfig:
    action_dim: int = 91
    hidden_layers: Sequence[int] = (256, 128)
    act_func: str = "tanh"
    dtype: Any = jnp.float32


class FFNPolicy(nn.Module):
    config: FFNConfig = FFNConfig()

    @nn.compact
    def __call__(self, obs_flat: jnp.ndarray):
        cfg = self.config
        x = obs_flat
        for h in cfg.hidden_layers:
            x = nn.Dense(h, dtype=cfg.dtype)(x)
            x = nn.tanh(x) if cfg.act_func == "tanh" else nn.gelu(x)
        logits = nn.Dense(
            cfg.action_dim, dtype=cfg.dtype,
            kernel_init=nn.initializers.orthogonal(0.01),
        )(x)
        value = nn.Dense(
            1, dtype=cfg.dtype, kernel_init=nn.initializers.orthogonal(1.0)
        )(x)
        return logits.astype(jnp.float32), value[..., 0].astype(jnp.float32)
