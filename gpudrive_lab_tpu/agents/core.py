"""Combine per-actor action outputs into the global action array
(reference: gpudrive/agents/core.py:4-39)."""

from __future__ import annotations

import numpy as np


def merge_actions(actor_actions_dict, actor_ids_dict, reference_action_tensor):
    """actor_actions_dict: {actor_name: [N] actions};
    actor_ids_dict: {actor_name: [N] flat agent indices into W*A};
    reference_action_tensor: [W, A]-shaped array providing shape/dtype.
    Returns [W, A] merged actions (numpy)."""
    out = np.zeros(np.asarray(reference_action_tensor).shape, np.int64)
    W, A = out.shape[:2]
    flat = out.reshape(-1)
    for name, actions in actor_actions_dict.items():
        ids = np.asarray(actor_ids_dict[name]).reshape(-1)
        flat[ids] = np.asarray(actions).reshape(-1)
    return flat.reshape(W, A)
