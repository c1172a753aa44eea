"""Exact flax mirror of the official VBD checkpoint architecture.

The repo's production VBD (`vbd/model.py`) is a TPU-first re-design; this
module instead reproduces the official torch architecture LAYER FOR LAYER so
that released VBD checkpoints load and produce matching activations
(verified to ~1e-4 against the reference torch modules in
tests/test_vbd_convert.py).  Reference:
/root/reference/gpudrive/integrations/vbd/model/modules.py (Encoder :15-78,
GoalPredictor :80-150, Denoiser :155-214, QCMHA :268-360, SelfTransformer
:363-388, FourierEmbedding :390-428, TransformerEncoder :430-466,
CrossTransformer :467-505, TransformerDecoder :506-614) and VBD.py:16-130.

Faithfully reproduced quirks:
  * the transformer-encoder "mask" subtracts 1e9 along the QUERY axis, which
    is softmax-shift-invariant — i.e. the self-attention is effectively
    unmasked (modules.py:455-460);
  * QCMHA packs the in-projection per head as [q|k|v] triples of head_dim,
    not as [Q|K|V] blocks (modules.py:316-321);
  * CrossTransformer applies norm_1 WITHOUT a residual from the query
    (modules.py:497-501);
  * zero input rows stay exactly zero through the local-frame transforms
    (model_utils.py:44,76).

Weight conversion from a torch state_dict lives in vbd/convert.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from gpudrive_lab_tpu.vbd.model import roll_out


@dataclasses.dataclass(frozen=True)
class OfficialVBDConfig:
    """Mirror of the checkpoint cfg (VBD.py:34-46 + released config)."""

    future_len: int = 80
    agents_len: int = 32
    action_len: int = 5
    diffusion_steps: int = 50
    encoder_layers: int = 6
    hidden_dim: int = 256
    num_heads: int = 8
    action_mean: tuple = (0.0, 0.0)
    action_std: tuple = (1.0, 0.15)

    @property
    def seq_len(self) -> int:
        return self.future_len // self.action_len


def wrap_angle(a):
    return (a + jnp.pi) % (2 * jnp.pi) - jnp.pi


def trajs_to_local_frame(trajs, ref_idx=-1):
    """model_utils.py batch_transform_trajs_to_local_frame."""
    x, y, th = trajs[..., 0], trajs[..., 1], trajs[..., 2]
    vx, vy = trajs[..., 3], trajs[..., 4]
    c = jnp.cos(th[:, :, ref_idx, None])
    s = jnp.sin(th[:, :, ref_idx, None])
    dx = x - x[:, :, ref_idx, None]
    dy = y - y[:, :, ref_idx, None]
    local = jnp.stack(
        [
            dx * c + dy * s,
            -dx * s + dy * c,
            wrap_angle(th - th[:, :, ref_idx, None]),
            vx * c + vy * s,
            -vx * s + vy * c,
        ],
        axis=-1,
    )
    local = jnp.where(trajs[..., :5] == 0, 0.0, local)
    if trajs.shape[-1] > 5:
        return jnp.concatenate([local, trajs[..., 5:]], axis=-1)
    return local


def polylines_to_local_frame(polylines):
    """model_utils.py batch_transform_polylines_to_local_frame."""
    x, y, th = polylines[..., 0], polylines[..., 1], polylines[..., 2]
    c = jnp.cos(th[:, :, 0, None])
    s = jnp.sin(th[:, :, 0, None])
    dx = x - x[:, :, 0, None]
    dy = y - y[:, :, 0, None]
    local = jnp.stack(
        [dx * c + dy * s, -dx * s + dy * c, wrap_angle(th - th[:, :, 0, None])],
        axis=-1,
    )
    local = jnp.where(polylines[..., :3] == 0, 0.0, local)
    return jnp.concatenate([local, polylines[..., 3:]], axis=-1)


class TorchGRUCell(nn.Module):
    """One torch-GRU layer step (the torch gate equations exactly):
      r = sigmoid(W_ir x + b_ir+b_hr + W_hr h)
      z = sigmoid(W_iz x + b_iz+b_hz + W_hz h)
      n = tanh(W_in x + b_in + r * (W_hn h + b_hn))
      h' = (1 - z) n + z h
    The input/hidden r,z biases are merged into the input Denses (they add
    pre-activation); the n hidden bias stays separate (inside the reset
    product).  vbd/convert.py maps the torch weight rows onto these names."""

    hidden: int

    @nn.compact
    def __call__(self, h, x):
        r = jax.nn.sigmoid(
            nn.Dense(self.hidden, name="ir")(x)
            + nn.Dense(self.hidden, use_bias=False, name="hr")(h)
        )
        z = jax.nn.sigmoid(
            nn.Dense(self.hidden, name="iz")(x)
            + nn.Dense(self.hidden, use_bias=False, name="hz")(h)
        )
        n = jnp.tanh(
            nn.Dense(self.hidden, name="in")(x)
            + r * nn.Dense(self.hidden, name="hn")(h)
        )
        h = (1.0 - z) * n + z * h
        return h, h


class TorchGRU(nn.Module):
    """Multi-layer torch nn.GRU (batch_first), h0 = 0."""

    hidden: int
    layers: int

    @nn.compact
    def __call__(self, x):  # [B, T, F] -> [B, T, hidden]
        scan_cell = nn.scan(
            TorchGRUCell,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
        )
        for i in range(self.layers):
            h0 = jnp.zeros((x.shape[0], self.hidden), x.dtype)
            _, x = scan_cell(self.hidden, name=f"l{i}")(h0, x)
        return x


class AgentEncoder(nn.Module):
    """modules.py:216-229 (GRU(8, 256, 2) + type embedding, padding_idx=0)."""

    @nn.compact
    def __call__(self, history, atype):
        # history [B, N, T, 8]; atype [B, N] int
        B, N, T, F = history.shape
        out = TorchGRU(256, 2, name="motion")(history.reshape(B * N, T, F))
        out = out[:, -1].reshape(B, N, 256)
        type_embed = nn.Embed(4, 256, name="type_embed")(
            jnp.clip(atype, 0, 3)
        )
        # padding_idx=0: embedding row 0 is frozen at zero in torch
        return out + type_embed


class MapEncoder(nn.Module):
    """modules.py:231-252."""

    @nn.compact
    def __call__(self, polylines):
        h = nn.Dense(128, name="point_0")(polylines[..., :3])
        h = nn.relu(h)
        h = nn.Dense(256, name="point_2")(h)
        pooled = jnp.max(h, axis=-2)
        tl = nn.Embed(8, 256, name="traffic_light_embed")(
            jnp.clip(polylines[:, :, 0, 3].astype(jnp.int32), 0, 7)
        )
        ty = nn.Embed(21, 256, name="type_embed")(
            jnp.clip(polylines[:, :, 0, 4].astype(jnp.int32), 0, 20)
        )
        return pooled + tl + ty


class TrafficLightEncoder(nn.Module):
    """modules.py:254-266."""

    @nn.compact
    def __call__(self, tl_points):  # [B, TL, 3]
        return nn.Embed(8, 256, name="type_embed")(
            jnp.clip(tl_points[:, :, 2].astype(jnp.int32), 0, 7)
        )


class FourierEmbedding(nn.Module):
    """modules.py:390-428 (per-dimension MLPs summed)."""

    input_dim: int = 3
    hidden: int = 256
    bands: int = 64

    @nn.compact
    def __call__(self, x):  # [..., input_dim]
        freqs = self.param(
            "freqs", nn.initializers.normal(1.0), (self.input_dim, self.bands)
        )
        ang = x[..., None] * freqs * 2 * jnp.pi  # [..., input_dim, bands]
        feats = jnp.concatenate(
            [jnp.cos(ang), jnp.sin(ang), x[..., None]], axis=-1
        )  # [..., input_dim, 2*bands + 1]
        out = 0.0
        for i in range(self.input_dim):
            h = nn.Dense(self.hidden, name=f"mlp{i}_0")(feats[..., i, :])
            h = nn.LayerNorm(epsilon=1e-5, name=f"mlp{i}_1")(h)
            h = nn.relu(h)
            h = nn.Dense(self.hidden, name=f"mlp{i}_3")(h)
            out = out + h
        out = nn.LayerNorm(epsilon=1e-5, name="to_out_0")(out)
        out = nn.relu(out)
        return nn.Dense(self.hidden, name="to_out_2")(out)


class QCMHA(nn.Module):
    """modules.py:268-360 — per-head [q|k|v] packing + relative pos terms."""

    hidden: int = 256
    heads: int = 8

    @nn.compact
    def __call__(self, query, rel_pos, query_pad_mask=None):
        D, H = self.hidden, self.heads
        hd = D // H
        b, t, _ = query.shape
        packed = nn.Dense(3 * D, name="in_proj")(query)
        packed = packed.reshape(b, t, H, 3 * hd)
        q, k, v = jnp.split(packed, 3, axis=-1)  # each [b, t, H, hd]

        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        )
        if rel_pos is not None:
            rel = rel_pos.reshape(b, t, t, H, hd)
            logits = logits + jnp.einsum(
                "bqhd,bqkhd->bhqk", q, rel,
                preferred_element_type=jnp.float32,
            )
        logits = logits / np.sqrt(hd)
        if query_pad_mask is not None:
            # the reference subtracts 1e9 along the QUERY axis — a softmax
            # no-op, reproduced bit-for-bit (modules.py:455-460, 341-343)
            logits = logits - query_pad_mask[:, None, :, None].astype(
                jnp.float32
            ) * 1e9
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum(
            "bhqk,bkhd->bqhd", attn, v, preferred_element_type=jnp.float32
        )
        if rel_pos is not None:
            out = out + jnp.einsum(
                "bhqk,bqkhd->bqhd", attn, rel,
                preferred_element_type=jnp.float32,
            )
        return nn.Dense(D, name="out_proj")(out.reshape(b, t, D))


class SelfTransformer(nn.Module):
    """modules.py:363-388 (post-norm)."""

    @nn.compact
    def __call__(self, x, relations, query_pad_mask=None):
        a = QCMHA(name="qc_attention")(x, relations, query_pad_mask)
        a = nn.LayerNorm(epsilon=1e-5, name="norm_1")(a + x)
        h = nn.Dense(1024, name="ffn_0")(a)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(256, name="ffn_3")(h)
        return nn.LayerNorm(epsilon=1e-5, name="norm_2")(h + a)


class TorchMHA(nn.Module):
    """torch nn.MultiheadAttention (batch_first, eval) — used by
    CrossTransformer (modules.py:470-474)."""

    hidden: int = 256
    heads: int = 8

    @nn.compact
    def __call__(self, q, k, v, key_padding_mask=None, attn_mask=None):
        D, H = self.hidden, self.heads
        hd = D // H
        qp = nn.Dense(D, name="q_proj")(q)
        kp = nn.Dense(D, name="k_proj")(k)
        vp = nn.Dense(D, name="v_proj")(v)
        split = lambda z: z.reshape(z.shape[0], z.shape[1], H, hd)
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", split(qp), split(kp),
            preferred_element_type=jnp.float32,
        ) / np.sqrt(hd)
        if key_padding_mask is not None:  # True = pad
            logits = jnp.where(
                key_padding_mask[:, None, None, :], -jnp.inf, logits
            )
        if attn_mask is not None:  # bool True = disallowed, [.., Q, K]
            logits = jnp.where(attn_mask[:, None], -jnp.inf, logits)
        attn = jax.nn.softmax(logits, axis=-1)
        # fully-masked rows produce NaN in torch only if every key is
        # masked; the reference's masks always allow self-attention
        out = jnp.einsum(
            "bhqk,bkhd->bqhd", attn, split(vp),
            preferred_element_type=jnp.float32,
        ).reshape(q.shape[0], q.shape[1], D)
        return nn.Dense(D, name="out_proj")(out)


class CrossTransformer(nn.Module):
    """modules.py:467-505.  NOTE: norm_1 has NO residual from the query."""

    @nn.compact
    def __call__(self, query, key, relations, key_padding_mask=None,
                 attn_mask=None):
        k = key + relations
        a = TorchMHA(name="cross_attention")(
            query, k, k, key_padding_mask=key_padding_mask,
            attn_mask=attn_mask,
        )
        a = nn.LayerNorm(epsilon=1e-5, name="norm_1")(a)
        h = nn.Dense(1024, name="ffn_0")(a)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(256, name="ffn_3")(h)
        return nn.LayerNorm(epsilon=1e-5, name="norm_2")(h + a)


class Encoder(nn.Module):
    """modules.py:15-78."""

    layers: int = 6

    @nn.compact
    def __call__(self, inputs):
        agents = inputs["agents_history"]
        agents_local = trajs_to_local_frame(agents)
        a_tok = AgentEncoder(name="agent_encoder")(
            agents_local, inputs["agents_type"]
        )
        agents_mask = inputs["agents_interested"] == 0

        polylines_local = polylines_to_local_frame(inputs["polylines"])
        m_tok = MapEncoder(name="map_encoder")(polylines_local)
        maps_mask = ~inputs["polylines_valid"]

        tl = inputs["traffic_light_points"]
        t_tok = TrafficLightEncoder(name="traffic_light_encoder")(tl)
        tl_mask = jnp.sum(tl, axis=-1) == 0

        relations = FourierEmbedding(name="relation_encoder")(
            inputs["relations"]
        )

        tokens = jnp.concatenate([a_tok, m_tok, t_tok], axis=1)
        pad_mask = jnp.concatenate([agents_mask, maps_mask, tl_mask], axis=-1)
        for i in range(self.layers):
            tokens = SelfTransformer(name=f"layer{i}")(
                tokens, relations, pad_mask
            )
        return {
            "encodings": tokens,
            "relation_encodings": relations,
            "agents_mask": agents_mask,
            "maps_mask": maps_mask,
            "traffic_lights_mask": tl_mask,
            "agents": agents,
            "anchors": inputs.get("anchors"),
        }


class TransformerDecoder(nn.Module):
    """modules.py:506-614 — the reference's per-agent python loops are
    folded into the batch axis (weights are shared across agents, so the
    batched form is activation-identical)."""

    config: OfficialVBDConfig

    def causal_mask(self) -> np.ndarray:
        A, T = self.config.agents_len, self.config.seq_len
        mask = np.zeros((A, T, A * T), bool)
        for i in range(A):
            mask[i, :, i * T:(i + 1) * T] = True
            for j in range(A):
                if i != j:
                    for t in range(T):
                        mask[i, t, j * T:j * T + t + 1] = True
        return ~mask  # True = disallowed

    @nn.compact
    def __call__(self, noisy_trajs_local, noise_level, encodings, relations,
                 pad_mask):
        cfg = self.config
        A, T, D = cfg.agents_len, cfg.seq_len, 256
        B = noisy_trajs_local.shape[0]
        x = noisy_trajs_local.reshape(B, A, T, cfg.action_len, 5)
        h = nn.Dense(128, name="encoder_0")(x)
        h = nn.relu(h)
        h = nn.Dense(D, name="encoder_2")(h)
        future = jnp.max(h, axis=3)  # [B, A, T, D]
        time_emb = nn.Embed(T, D, name="time_embedding")(jnp.arange(T))
        query = future + time_emb[None, None] + noise_level[:, :, None, :]

        cmask = jnp.asarray(self.causal_mask())  # [A, T, A*T]
        rel_agents = jnp.repeat(
            relations[:, :A, :A], T, axis=2
        )  # [B, A, A*T, D]

        def fold(z):  # [B, A, ...] -> [B*A, ...]
            return z.reshape((B * A,) + z.shape[2:])

        def agent_layer(layer, q):
            # layer0/2: per-agent self attention over all agents' queries
            return layer(
                fold(q),
                jnp.broadcast_to(
                    query.reshape(B, 1, A * T, D), (B, A, A * T, D)
                ).reshape(B * A, A * T, D),
                fold(rel_agents),
                attn_mask=jnp.broadcast_to(
                    cmask[None], (B, A, T, A * T)
                ).reshape(B * A, T, A * T),
            ).reshape(B, A, T, D)

        def scene_layer(layer, q):
            S = encodings.shape[1]
            return layer(
                fold(q),
                jnp.broadcast_to(
                    encodings[:, None], (B, A, S, D)
                ).reshape(B * A, S, D),
                fold(relations[:, :A]),
                key_padding_mask=jnp.broadcast_to(
                    pad_mask[:, None], (B, A, S)
                ).reshape(B * A, S),
            ).reshape(B, A, T, D)

        l0 = CrossTransformer(name="attn0")
        l1 = CrossTransformer(name="attn1")
        l2 = CrossTransformer(name="attn2")
        l3 = CrossTransformer(name="attn3")

        qc = agent_layer(l0, query)
        qc = scene_layer(l1, qc)
        qc = qc + query
        # NB: layer2 keys/values come from the UPDATED stack (the reference
        # rebuilds `query_content_stack` before the second block)
        def agent_layer2(layer, q_all):
            return layer(
                fold(q_all),
                jnp.broadcast_to(
                    q_all.reshape(B, 1, A * T, D), (B, A, A * T, D)
                ).reshape(B * A, A * T, D),
                fold(rel_agents),
                attn_mask=jnp.broadcast_to(
                    cmask[None], (B, A, T, A * T)
                ).reshape(B * A, T, A * T),
            ).reshape(B, A, T, D)

        qc2 = agent_layer2(l2, qc)
        qc2 = scene_layer(l3, qc2)
        h = nn.Dense(128, name="decoder_0")(qc2)
        h = nn.elu(h)
        return nn.Dense(2, name="decoder_3")(h)


class Denoiser(nn.Module):
    """modules.py:155-214."""

    config: OfficialVBDConfig

    @nn.compact
    def __call__(self, encoder_outputs, noisy_actions, diffusion_step):
        cfg = self.config
        A = cfg.agents_len
        noisy_actions = noisy_actions[:, :A]
        current_states = encoder_outputs["agents"][:, :A, -1]
        noise_level = nn.Embed(
            cfg.diffusion_steps, 256, name="noise_level_embedding"
        )(diffusion_step[:, :A])
        noisy_states_local = roll_out(
            current_states[..., :5], noisy_actions,
            action_len=cfg.action_len, global_frame=False,
        )
        pad_mask = jnp.concatenate(
            [
                encoder_outputs["agents_mask"],
                encoder_outputs["maps_mask"],
                encoder_outputs["traffic_lights_mask"],
            ],
            axis=-1,
        )
        return TransformerDecoder(cfg, name="decoder")(
            noisy_states_local, noise_level, encoder_outputs["encodings"],
            encoder_outputs["relation_encodings"], pad_mask,
        )


class GoalPredictor(nn.Module):
    """modules.py:80-150."""

    config: OfficialVBDConfig

    @nn.compact
    def __call__(self, encoder_outputs):
        cfg = self.config
        A, D = cfg.agents_len, 256
        anchors_points = encoder_outputs["anchors"][:, :A]
        h = nn.Dense(128, name="anchor_0")(anchors_points)
        h = nn.relu(h)
        anchors = nn.Dense(D, name="anchor_2")(h)
        encodings = encoder_outputs["encodings"]
        query = encodings[:, :A, None] + anchors  # [B, A, Q, D]
        B, _, Q, _ = query.shape
        S = encodings.shape[1]
        pad_mask = jnp.concatenate(
            [
                encoder_outputs["agents_mask"],
                encoder_outputs["maps_mask"],
                encoder_outputs["traffic_lights_mask"],
            ],
            axis=-1,
        )
        relations = encoder_outputs["relation_encodings"]

        def fold(z):
            return z.reshape((B * A,) + z.shape[2:])

        def scene_layer(layer, q):
            return layer(
                fold(q),
                jnp.broadcast_to(
                    encodings[:, None], (B, A, S, D)
                ).reshape(B * A, S, D),
                fold(relations[:, :A]),
                key_padding_mask=jnp.broadcast_to(
                    pad_mask[:, None], (B, A, S)
                ).reshape(B * A, S),
            ).reshape(B, A, Q, D)

        qc = scene_layer(CrossTransformer(name="attn0"), query)
        qc = scene_layer(CrossTransformer(name="attn1"), qc)
        qc = qc + query
        qc = scene_layer(CrossTransformer(name="attn2"), qc)
        qc = scene_layer(CrossTransformer(name="attn3"), qc)

        h = nn.Dense(256, name="act_0")(qc)
        h = nn.elu(h)
        actions = nn.Dense(cfg.seq_len * 2, name="act_3")(h)
        actions = actions.reshape(B, A, Q, cfg.seq_len, 2)
        s = nn.Dense(128, name="score_0")(qc)
        s = nn.elu(s)
        scores = nn.Dense(1, name="score_3")(s)[..., 0]
        return actions, scores


def sample_official(
    model: "OfficialVBD",
    variables,
    scheduler,
    inputs,
    rng,
    config: "OfficialVBDConfig" = None,
):
    """Reverse diffusion with the official checkpoint weights
    (reference: sim_agent/sim_actor.py:100-160 inference loop: encode once,
    then denoiser -> scheduler.step over all diffusion steps; the denoiser
    predicts x0 in normalized action space).

    Returns dict(denoised_actions [B, A, T, 2] unnormalized,
    denoised_trajs [B, A, future_len, 5] global frame)."""
    cfg = config or model.config
    B = inputs["agents_history"].shape[0]
    A, T = cfg.agents_len, cfg.seq_len

    enc_fn = jax.jit(lambda v, i: model.apply(v, i, method="encode"))
    den_fn = jax.jit(
        lambda v, e, x, t: model.apply(v, e, x, t, method="denoise")
    )
    enc = enc_fn(variables, inputs)

    rng, k = jax.random.split(rng)
    x_t = jax.random.normal(k, (B, A, T, 2))
    for step in reversed(range(cfg.diffusion_steps)):
        t_arr = jnp.full((B, A), step, jnp.int32)
        x0 = den_fn(variables, enc, x_t, t_arr)
        rng, k = jax.random.split(rng)
        x_t = scheduler.step(x0, x_t, jnp.int32(step), k)

    mean = jnp.asarray(cfg.action_mean)
    std = jnp.asarray(cfg.action_std)
    actions = x_t * std + mean
    current = enc["agents"][:, :A, -1, :5]
    trajs = roll_out(current, actions, action_len=cfg.action_len,
                     global_frame=True)
    return {"denoised_actions": actions, "denoised_trajs": trajs}


class OfficialVBD(nn.Module):
    """Encoder + Denoiser (+ GoalPredictor): VBD.py:16-130."""

    config: OfficialVBDConfig
    with_predictor: bool = True

    def setup(self):
        self.encoder = Encoder(self.config.encoder_layers)
        self.denoiser = Denoiser(self.config)
        if self.with_predictor:
            self.predictor = GoalPredictor(self.config)

    def encode(self, inputs):
        return self.encoder(inputs)

    def denoise(self, encoder_outputs, noised_actions_normalized,
                diffusion_step):
        """forward_denoiser (VBD.py:158-205): unnormalize -> denoiser ->
        normalized prediction."""
        mean = jnp.asarray(self.config.action_mean)
        std = jnp.asarray(self.config.action_std)
        noised_actions = noised_actions_normalized * std + mean
        denoised_norm = self.denoiser(
            encoder_outputs, noised_actions, diffusion_step
        )
        return denoised_norm

    def denoise_raw(self, encoder_outputs, noised_actions, diffusion_step):
        """Denoiser on UNNORMALIZED actions (the torch Denoiser.forward
        contract) — used by the activation-parity tests."""
        return self.denoiser(encoder_outputs, noised_actions, diffusion_step)

    def predict_goal(self, encoder_outputs):
        return self.predictor(encoder_outputs)

    def __call__(self, inputs, noised_actions_normalized, diffusion_step):
        enc = self.encode(inputs)
        denoised = self.denoise(
            enc, noised_actions_normalized, diffusion_step
        )
        if self.with_predictor:
            actions, scores = self.predict_goal(enc)
        else:
            actions = scores = None
        return denoised, actions, scores
