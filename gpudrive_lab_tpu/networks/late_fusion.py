"""Late-fusion actor-critic policy.

Flax re-implementation of the reference's PufferLib policy
(reference: gpudrive/networks/late_fusion.py:69-248): per-modality MLP
embeddings (ego 6(+3)->64, partner 6->64, road 13->64), max-pool over
entities, shared head 192->128, actor 128->action_dim logits + critic scalar.

TPU notes: all matmuls carry ``preferred_element_type`` float32 and the
module supports bfloat16 compute (params stay f32) — the embedding GEMMs are
the MXU work in the rollout hot path.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from gpudrive_lab_tpu import constants as C


@dataclasses.dataclass(frozen=True)
class PolicyConfig:
    action_dim: int = 91  # 7 accel x 13 steer (reference default)
    input_dim: int = 64
    hidden_dim: int = 128
    act_func: str = "tanh"
    ego_feat_dim: int = C.EGO_FEAT_DIM  # +3 when reward_conditioned
    max_agents: int = C.MAX_AGENTS
    top_k_roads: int = C.MAX_AGENT_MAP_OBS
    dtype: Any = jnp.float32
    # Rematerialize the partner/road embed+pool blocks in the backward pass:
    # the [B, E, 64] embedding activations (road alone is ~210 MB/minibatch
    # at the production 8192x200 tile) are never stored for bwd — they are
    # recomputed from the ~40 MB inputs.  FLOPs are free here (the GEMMs are
    # ~0.5 ms against multi-ms of activation HBM traffic); exactness is
    # unaffected (bitwise-identical gradients).
    embed_remat: bool = False
    # Route the partner/road embed+pool through the Pallas fused kernel
    # (networks/fused_embed.py): one HBM read of the obs, one [B, 64]
    # write; fwd AND bwd never materialize [B, E, 64].  Same param tree.
    # NOTE: d/d(obs) of the fused op is zero by design — only enable where
    # the obs input is data (the PPO/IL update paths), never under a
    # gradient w.r.t. observations.
    fused_embed: bool = False

    @property
    def obs_dim(self) -> int:
        return (
            self.ego_feat_dim
            + (self.max_agents - 1) * C.PARTNER_FEAT_DIM
            + self.top_k_roads * C.ROAD_GRAPH_FEAT_DIM
        )


class _Embed(nn.Module):
    """Linear -> LayerNorm -> act -> Linear (reference embeds,
    late_fusion.py:117-144).  ``pool=True`` max-pools the entity axis
    INSIDE the module so an nn.remat boundary saves only the [B, dim]
    pooled row, not the [B, E, dim] lattice.

    ``fused=True`` (requires pool) routes through the Pallas
    fused-embed-pool kernel (networks/fused_embed.py): the [B, E, dim]
    activations never touch HBM.  The flax Dense/LayerNorm modules are
    still declared (on a 1-row probe) so parameter names/shapes — and
    therefore checkpoints — are identical across the flag."""

    dim: int
    act: str
    dtype: Any
    pool: bool = False
    fused: bool = False

    @nn.compact
    def __call__(self, x):
        d1 = nn.Dense(self.dim, dtype=self.dtype)
        ln = nn.LayerNorm(dtype=self.dtype)
        d2 = nn.Dense(self.dim, dtype=self.dtype)
        if self.fused and self.pool and x.ndim >= 3:
            from gpudrive_lab_tpu.networks.fused_embed import (
                fused_embed_pool,
            )

            # Declare params at the exact unfused paths via a 1-row probe
            # through the real modules (DCE'd at apply time: its output is
            # unused).
            probe = x.reshape((-1, x.shape[-1]))[:1]
            p = d2(nn.tanh(ln(d1(probe))) if self.act == "tanh"
                   else nn.gelu(ln(d1(probe))))
            del p
            params = self.variables["params"]
            lead = x.shape[:-2]
            x3 = x.reshape((-1,) + x.shape[-2:])
            pooled = fused_embed_pool(
                x3,
                params["Dense_0"]["kernel"], params["Dense_0"]["bias"],
                params["LayerNorm_0"]["scale"],
                params["LayerNorm_0"]["bias"],
                params["Dense_1"]["kernel"], params["Dense_1"]["bias"],
                (self.act, jnp.dtype(self.dtype).name),
            )
            return pooled.reshape(lead + (self.dim,)).astype(self.dtype)
        x = d1(x)
        x = ln(x)
        x = nn.tanh(x) if self.act == "tanh" else nn.gelu(x)
        x = d2(x)
        return x.max(axis=-2) if self.pool else x


class LateFusionPolicy(nn.Module):
    config: PolicyConfig = PolicyConfig()

    @nn.compact
    def __call__(self, obs_flat: jnp.ndarray):
        """obs_flat: [..., obs_dim] -> (logits [..., action_dim],
        value [...]).  Also accepts a pre-split (ego, partner, road)
        tuple — same modules in the same order, so parameters are
        interchangeable with the flat form (skips the unpack slicing)."""
        cfg = self.config
        if isinstance(obs_flat, tuple):
            ego, partner, road = obs_flat
        else:
            e = cfg.ego_feat_dim
            p = (cfg.max_agents - 1) * C.PARTNER_FEAT_DIM
            ego = obs_flat[..., :e]
            partner = obs_flat[..., e : e + p].reshape(
                obs_flat.shape[:-1] + (cfg.max_agents - 1, C.PARTNER_FEAT_DIM)
            )
            road = obs_flat[..., e + p :].reshape(
                obs_flat.shape[:-1] + (cfg.top_k_roads, C.ROAD_GRAPH_FEAT_DIM)
            )

        # Explicit names keep parameters at the historical auto-name paths
        # ("_Embed_k") whether or not the module is remat-lifted, so
        # embed_remat on/off and existing checkpoints stay interchangeable
        # (tested: test_policy_embed_remat).
        Emb = nn.remat(_Embed) if cfg.embed_remat else _Embed
        ego_embed = _Embed(cfg.input_dim, cfg.act_func, cfg.dtype,
                           name="_Embed_0")(ego)
        partner_embed = Emb(cfg.input_dim, cfg.act_func, cfg.dtype,
                            pool=True, fused=cfg.fused_embed,
                            name="_Embed_1")(partner)
        road_embed = Emb(cfg.input_dim, cfg.act_func, cfg.dtype,
                         pool=True, fused=cfg.fused_embed,
                         name="_Embed_2")(road)

        hidden = nn.Dense(cfg.hidden_dim, dtype=cfg.dtype)(
            jnp.concatenate([ego_embed, partner_embed, road_embed], axis=-1)
        )
        logits = nn.Dense(
            cfg.action_dim,
            dtype=cfg.dtype,
            kernel_init=nn.initializers.orthogonal(0.01),
        )(hidden)
        value = nn.Dense(
            1, dtype=cfg.dtype, kernel_init=nn.initializers.orthogonal(1.0)
        )(hidden)
        return logits.astype(jnp.float32), value[..., 0].astype(jnp.float32)


class LateFusionLSTMPolicy(nn.Module):
    """Recurrent variant: late-fusion encoder -> LSTM -> actor/critic
    (reference: the optional use_rnn/LSTM path of the puffer policy,
    integrations/puffer/ppo.py:59-73,156-163)."""

    config: PolicyConfig = PolicyConfig()
    lstm_hidden: int = 128

    def initialize_carry(self, batch_shape):
        h = jnp.zeros(batch_shape + (self.lstm_hidden,), jnp.float32)
        return (h, h)

    @nn.compact
    def __call__(self, obs_flat: jnp.ndarray, carry, done=None):
        """obs_flat: [..., obs_dim]; carry: ((..., H), (..., H)); done resets
        the carry for finished episodes before the cell update.
        Returns (new_carry, logits, value)."""
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
        feats = jnp.concatenate(
            [
                _Embed(cfg.input_dim, cfg.act_func, cfg.dtype)(ego),
                _Embed(cfg.input_dim, cfg.act_func, cfg.dtype)(partner).max(
                    axis=-2
                ),
                _Embed(cfg.input_dim, cfg.act_func, cfg.dtype)(road).max(
                    axis=-2
                ),
            ],
            axis=-1,
        )
        if done is not None:
            m = (1.0 - done)[..., None]
            carry = (carry[0] * m, carry[1] * m)
        cell = nn.OptimizedLSTMCell(self.lstm_hidden, dtype=cfg.dtype)
        carry, hidden = cell(carry, feats)
        logits = nn.Dense(
            cfg.action_dim, dtype=cfg.dtype,
            kernel_init=nn.initializers.orthogonal(0.01),
        )(hidden)
        value = nn.Dense(
            1, dtype=cfg.dtype, kernel_init=nn.initializers.orthogonal(1.0)
        )(hidden)
        return carry, logits.astype(jnp.float32), value[..., 0].astype(
            jnp.float32
        )


def sample_logits(rng, logits, action=None, deterministic=False):
    """Categorical sample + logprob + entropy
    (reference: late_fusion.py sample_logits via pufferlib)."""
    log_probs = jax.nn.log_softmax(logits)
    if action is None:
        if deterministic:
            action = jnp.argmax(logits, axis=-1)
        else:
            action = jax.random.categorical(rng, logits, axis=-1)
    logprob = jnp.take_along_axis(
        log_probs, action[..., None].astype(jnp.int32), axis=-1
    )[..., 0]
    probs = jnp.exp(log_probs)
    entropy = -jnp.sum(probs * log_probs, axis=-1)
    return action, logprob, entropy
