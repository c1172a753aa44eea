"""Torch interoperability.

The reference exports every sim tensor as zero-copy torch views
(reference: src/bindings.cpp .to_torch()).  Here the state lives in JAX
arrays; these helpers hand them to torch users — zero-copy via dlpack when
both sides share the CPU, device->host copy otherwise (torch in this
environment is CPU-only)."""

from __future__ import annotations

import numpy as np


def to_torch(x):
    """jax.Array -> torch.Tensor (dlpack zero-copy on CPU; copies from TPU)."""
    import jax
    import torch

    if not isinstance(x, jax.Array):
        return torch.as_tensor(np.asarray(x))
    try:
        if x.device.platform == "cpu":
            return torch.from_dlpack(x)
    except Exception:
        pass
    return torch.as_tensor(np.asarray(x))


def from_torch(t):
    """torch.Tensor -> jax.Array (dlpack zero-copy on CPU)."""
    import jax.numpy as jnp

    try:
        import jax

        return jnp.from_dlpack(t)
    except Exception:
        return jnp.asarray(t.detach().cpu().numpy())


def tree_to_torch(tree):
    import jax

    return jax.tree.map(to_torch, tree)
