"""Torch ``NeuralNet`` checkpoints -> flax ``LateFusionPolicy`` params.

The reference releases self-play policies on the HF hub and loads them with
``NeuralNet.from_pretrained("daphne-cornelisse/policy_S10_000_02_27")``
(reference: gpudrive/networks/late_fusion.py:69-75, README.md:207-231,
examples/experimental/eval_utils.py:15,56).  This module converts those
torch ``state_dict``s into parameters for the flax mirror so a policy
trained in the reference simulator can be evaluated closed-loop inside the
TPU sim — the cheapest end-to-end parity check of the whole
obs/dynamics/collision chain.

Key mapping (reference module -> flax path; see tests/test_policy_convert.py
for the activation-parity proof against the reference's own forward code):

    ego_embed.{0,1,4}       -> _Embed_0/{Dense_0, LayerNorm_0, Dense_1}
    partner_embed.{0,1,4}   -> _Embed_1/...
    road_map_embed.{0,1,4}  -> _Embed_2/...
    shared_embed.0          -> Dense_0        (Linear only; Dropout is a no-op)
    actor                   -> Dense_1
    critic                  -> Dense_2

torch ``nn.Linear`` weights are [out, in] and transpose into flax kernels
[in, out]; LayerNorm weight/bias map to scale/bias.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple

import numpy as np

from gpudrive_lab_tpu import constants as C
from gpudrive_lab_tpu.networks.late_fusion import (
    LateFusionPolicy,
    PolicyConfig,
)


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, np.float32)


def _linear(sd: Dict[str, Any], key: str) -> Dict[str, np.ndarray]:
    return {
        "kernel": _np(sd[f"{key}.weight"]).T,
        "bias": _np(sd[f"{key}.bias"]),
    }


def _layernorm(sd: Dict[str, Any], key: str) -> Dict[str, np.ndarray]:
    return {
        "scale": _np(sd[f"{key}.weight"]),
        "bias": _np(sd[f"{key}.bias"]),
    }


def _embed_block(sd: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    """One reference embed Sequential: Linear(0), LayerNorm(1), act(2),
    Dropout(3), Linear(4) (reference: late_fusion.py:117-145)."""
    return {
        "Dense_0": _linear(sd, f"{prefix}.0"),
        "LayerNorm_0": _layernorm(sd, f"{prefix}.1"),
        "Dense_1": _linear(sd, f"{prefix}.4"),
    }


def convert_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Map a torch ``NeuralNet`` state_dict onto LateFusionPolicy params."""
    params = {
        "_Embed_0": _embed_block(sd, "ego_embed"),
        "_Embed_1": _embed_block(sd, "partner_embed"),
        "_Embed_2": _embed_block(sd, "road_map_embed"),
        "Dense_0": _linear(sd, "shared_embed.0"),
        "Dense_1": _linear(sd, "actor"),
        "Dense_2": _linear(sd, "critic"),
    }
    if any(k.startswith("vbd_embed.") for k in sd):
        raise NotImplementedError(
            "vbd_in_obs policies are not supported by the flax "
            "LateFusionPolicy (the reference's vbd_embed branch, "
            "late_fusion.py:147-156)"
        )
    return {"params": params}


def config_from_state_dict(sd: Dict[str, Any]) -> PolicyConfig:
    """Infer the PolicyConfig from checkpoint tensor shapes."""
    ego_in = _np(sd["ego_embed.0.weight"]).shape[1]
    input_dim = _np(sd["ego_embed.0.weight"]).shape[0]
    hidden_dim = _np(sd["shared_embed.0.weight"]).shape[0]
    action_dim = _np(sd["actor.weight"]).shape[0]
    return PolicyConfig(
        action_dim=action_dim,
        input_dim=input_dim,
        hidden_dim=hidden_dim,
        ego_feat_dim=ego_in,
    )


def load_policy_state_dict(path: str) -> Dict[str, Any]:
    """Read a local checkpoint file (.pt/.bin torch blob or .safetensors)
    into a flat CPU state_dict."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict) and "state_dict" in blob:
        blob = blob["state_dict"]
    if hasattr(blob, "state_dict"):
        blob = blob.state_dict()
    return dict(blob)


def load_pretrained(
    repo_or_path: str, revision: str | None = None
) -> Tuple[LateFusionPolicy, Dict[str, Any], PolicyConfig]:
    """Load a released reference policy into the flax mirror.

    ``repo_or_path`` is a local file, a local directory containing
    ``model.safetensors`` (the PyTorchModelHubMixin layout), or an HF hub
    repo id such as ``daphne-cornelisse/policy_S10_000_02_27``
    (reference: README.md:228; requires network access).
    Returns (policy_module, variables, policy_config).
    """
    path = repo_or_path
    if os.path.isdir(path):
        for name in ("model.safetensors", "pytorch_model.bin", "model.pt"):
            cand = os.path.join(path, name)
            if os.path.exists(cand):
                path = cand
                break
    elif not os.path.exists(path):
        from huggingface_hub import hf_hub_download

        path = hf_hub_download(
            repo_id=repo_or_path, filename="model.safetensors",
            revision=revision,
        )
    sd = load_policy_state_dict(path)
    config = config_from_state_dict(sd)
    variables = convert_state_dict(sd)
    # Shape-check against a fresh init: any mismatch is a converter bug.
    import jax
    import jax.numpy as jnp

    policy = LateFusionPolicy(config)
    ref = jax.eval_shape(
        lambda: policy.init(
            jax.random.PRNGKey(0), jnp.zeros((1, config.obs_dim))
        )
    )
    flat_ref = jax.tree_util.tree_leaves_with_path(ref)
    flat_new = {
        jax.tree_util.keystr(k): v.shape
        for k, v in jax.tree_util.tree_leaves_with_path(variables)
    }
    for k, v in flat_ref:
        ks = jax.tree_util.keystr(k)
        if flat_new.get(ks) != v.shape:
            raise ValueError(
                f"converted param {ks} has shape {flat_new.get(ks)}, "
                f"expected {v.shape}"
            )
    variables = jax.tree.map(jnp.asarray, variables)
    return policy, variables, config
