"""Torch VBD checkpoint -> flax parameters.

Loads the official released VBD LightningModule checkpoint (reference:
gpudrive/integrations/vbd/sim_agent/sim_actor.py:12-60 loads it with
``VBDTest.load_from_checkpoint``) into the exact flax mirror
(vbd/model_official.py).  Activation parity against the reference torch
modules is verified in tests/test_vbd_convert.py.

Key mapping notes:
  * torch ``nn.Linear`` weight [out, in] -> flax kernel [in, out] (transpose);
  * torch ``nn.LayerNorm`` weight/bias -> flax scale/bias;
  * torch ``nn.Embedding`` weight -> flax embedding;
  * torch ``nn.GRU`` packs gates as [reset | update | new] rows; flax
    GRUCell splits them into ir/iz/in + hr/hz/hn Denses, with the r/z input
    and hidden biases merged (both add pre-activation) and the n-gate hidden
    bias kept separate (it sits inside the reset product);
  * torch ``nn.MultiheadAttention`` packs in_proj as [Q | K | V] blocks;
  * QCMHA's in_proj needs NO re-packing: both sides reshape the projection
    output to [b, t, heads, 3*head_dim] before splitting.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from gpudrive_lab_tpu.vbd.model_official import OfficialVBDConfig


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, np.float32)


def load_state_dict(path: str) -> Dict[str, Any]:
    """Read a .ckpt/.pt file into a flat state_dict (CPU, no Lightning)."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    return {k.removeprefix("model."): v for k, v in sd.items()}


def config_from_checkpoint(path: str) -> OfficialVBDConfig:
    """Pull the model hyperparameters out of a Lightning checkpoint."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    cfg = (blob.get("hyper_parameters") or {}).get("cfg", {})
    return OfficialVBDConfig(
        future_len=cfg.get("future_len", 80),
        agents_len=cfg.get("agents_len", 32),
        action_len=cfg.get("action_len", 5),
        diffusion_steps=cfg.get("diffusion_steps", 50),
        encoder_layers=cfg.get("encoder_layers", 6),
        action_mean=tuple(cfg.get("action_mean", (0.0, 0.0))),
        action_std=tuple(cfg.get("action_std", (1.0, 0.15))),
    )


def _linear(sd, key):
    return {
        "kernel": _np(sd[f"{key}.weight"]).T,
        "bias": _np(sd[f"{key}.bias"]),
    }


def _layernorm(sd, key):
    return {
        "scale": _np(sd[f"{key}.weight"]),
        "bias": _np(sd[f"{key}.bias"]),
    }


def _embed(sd, key):
    return {"embedding": _np(sd[f"{key}.weight"])}


def _gru_layer(sd, key, layer):
    w_ih = _np(sd[f"{key}.weight_ih_l{layer}"])
    w_hh = _np(sd[f"{key}.weight_hh_l{layer}"])
    b_ih = _np(sd[f"{key}.bias_ih_l{layer}"])
    b_hh = _np(sd[f"{key}.bias_hh_l{layer}"])
    H = w_hh.shape[1]
    r, z, n = slice(0, H), slice(H, 2 * H), slice(2 * H, 3 * H)
    return {
        "ir": {"kernel": w_ih[r].T, "bias": b_ih[r] + b_hh[r]},
        "iz": {"kernel": w_ih[z].T, "bias": b_ih[z] + b_hh[z]},
        "in": {"kernel": w_ih[n].T, "bias": b_ih[n]},
        "hr": {"kernel": w_hh[r].T},
        "hz": {"kernel": w_hh[z].T},
        "hn": {"kernel": w_hh[n].T, "bias": b_hh[n]},
    }


def _torch_mha(sd, key):
    """nn.MultiheadAttention -> TorchMHA (q/k/v from in_proj slices)."""
    w = _np(sd[f"{key}.in_proj_weight"])
    b = _np(sd[f"{key}.in_proj_bias"])
    D = w.shape[1]
    out = {}
    for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
        out[name] = {
            "kernel": w[i * D:(i + 1) * D].T,
            "bias": b[i * D:(i + 1) * D],
        }
    out["out_proj"] = _linear(sd, f"{key}.out_proj")
    return out


def _cross_transformer(sd, key):
    return {
        "cross_attention": _torch_mha(sd, f"{key}.cross_attention"),
        "norm_1": _layernorm(sd, f"{key}.norm_1"),
        "norm_2": _layernorm(sd, f"{key}.norm_2"),
        "ffn_0": _linear(sd, f"{key}.ffn.0"),
        "ffn_3": _linear(sd, f"{key}.ffn.3"),
    }


def _self_transformer(sd, key):
    return {
        "qc_attention": {
            "in_proj": _linear(sd, f"{key}.qc_attention.in_proj"),
            "out_proj": _linear(sd, f"{key}.qc_attention.out_proj"),
        },
        "norm_1": _layernorm(sd, f"{key}.norm_1"),
        "norm_2": _layernorm(sd, f"{key}.norm_2"),
        "ffn_0": _linear(sd, f"{key}.ffn.0"),
        "ffn_3": _linear(sd, f"{key}.ffn.3"),
    }


def _fourier(sd, key, input_dim=3):
    out = {"freqs": _np(sd[f"{key}.freqs.weight"])}
    for i in range(input_dim):
        out[f"mlp{i}_0"] = _linear(sd, f"{key}.mlps.{i}.0")
        out[f"mlp{i}_1"] = _layernorm(sd, f"{key}.mlps.{i}.1")
        out[f"mlp{i}_3"] = _linear(sd, f"{key}.mlps.{i}.3")
    out["to_out_0"] = _layernorm(sd, f"{key}.to_out.0")
    out["to_out_2"] = _linear(sd, f"{key}.to_out.2")
    return out


def convert_state_dict(
    sd: Dict[str, Any], config: OfficialVBDConfig,
    with_predictor: bool | None = None,
) -> Dict[str, Any]:
    """Full state_dict -> flax ``{"params": ...}`` for OfficialVBD."""
    if with_predictor is None:
        with_predictor = any(k.startswith("predictor.") for k in sd)

    encoder = {
        "agent_encoder": {
            "motion": {
                f"l{k}": _gru_layer(sd, "encoder.agent_encoder.motion", k)
                for k in range(2)
            },
            "type_embed": _embed(sd, "encoder.agent_encoder.type_embed"),
        },
        "map_encoder": {
            "point_0": _linear(sd, "encoder.map_encoder.point.0"),
            "point_2": _linear(sd, "encoder.map_encoder.point.2"),
            "traffic_light_embed": _embed(
                sd, "encoder.map_encoder.traffic_light_embed"
            ),
            "type_embed": _embed(sd, "encoder.map_encoder.type_embed"),
        },
        "traffic_light_encoder": {
            "type_embed": _embed(
                sd, "encoder.traffic_light_encoder.type_embed"
            ),
        },
        "relation_encoder": _fourier(sd, "encoder.relation_encoder"),
    }
    for layer in range(config.encoder_layers):
        encoder[f"layer{layer}"] = _self_transformer(
            sd, f"encoder.transformer_encoder.layers.{layer}"
        )

    denoiser = {
        "noise_level_embedding": _embed(sd, "denoiser.noise_level_embedding"),
        "decoder": {
            "time_embedding": _embed(sd, "denoiser.decoder.time_embedding"),
            "encoder_0": _linear(sd, "denoiser.decoder.encoder.0"),
            "encoder_2": _linear(sd, "denoiser.decoder.encoder.2"),
            "decoder_0": _linear(sd, "denoiser.decoder.decoder.0"),
            "decoder_3": _linear(sd, "denoiser.decoder.decoder.3"),
            **{
                f"attn{i}": _cross_transformer(
                    sd, f"denoiser.decoder.attention_layers.{i}"
                )
                for i in range(4)
            },
        },
    }

    params = {"encoder": encoder, "denoiser": denoiser}
    if with_predictor:
        params["predictor"] = {
            "anchor_0": _linear(sd, "predictor.anchor_encoder.0"),
            "anchor_2": _linear(sd, "predictor.anchor_encoder.2"),
            "act_0": _linear(sd, "predictor.act_decoder.0"),
            "act_3": _linear(sd, "predictor.act_decoder.3"),
            "score_0": _linear(sd, "predictor.score_decoder.0"),
            "score_3": _linear(sd, "predictor.score_decoder.3"),
            **{
                f"attn{i}": _cross_transformer(
                    sd, f"predictor.attention_layers.{i}"
                )
                for i in range(4)
            },
        }
    return {"params": params}


def assert_tree_matches(converted, initialized) -> None:
    """Shape-check the converted tree against a model-initialized one."""
    import jax

    conv = jax.tree_util.tree_leaves_with_path(converted)
    init = dict(jax.tree_util.tree_leaves_with_path(initialized))
    conv_d = dict(conv)
    missing = set(init) - set(conv_d)
    extra = set(conv_d) - set(init)
    assert not missing and not extra, (
        f"param tree mismatch: missing={sorted(map(str, missing))[:5]} "
        f"extra={sorted(map(str, extra))[:5]}"
    )
    for path, leaf in conv:
        want = init[path].shape
        assert leaf.shape == want, (
            f"{jax.tree_util.keystr(path)}: {leaf.shape} != {want}"
        )


def load_vbd_checkpoint(path: str):
    """One-call loader: (OfficialVBD flax module, variables, config)."""
    from gpudrive_lab_tpu.vbd.model_official import OfficialVBD

    config = config_from_checkpoint(path)
    sd = load_state_dict(path)
    variables = convert_state_dict(sd, config)
    model = OfficialVBD(
        config, with_predictor="predictor" in variables["params"]
    )
    return model, variables, config
