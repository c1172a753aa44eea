"""Checkpoint save/load and hub upload.

Mirror of the reference's checkpointing (reference:
gpudrive/integrations/puffer/ppo.py:695-737 save_checkpoint;
gpudrive/utils/push_checkpoint_to_huggingface.py; HF-hub mixin on the policy,
networks/late_fusion.py:69-75).  Uses orbax for the array tree plus a JSON
sidecar with architecture metadata so a policy can be rebuilt from the file
alone.  Sim state itself is never checkpointed — episodes are 91 steps and
deterministically regenerable from scene JSON + seed, as in the reference.
"""

from __future__ import annotations

import dataclasses
import json
import os
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np


def save_checkpoint(
    path: str,
    variables,
    opt_state=None,
    metadata: Optional[dict] = None,
) -> str:
    """Write {variables, opt_state} + metadata.json under ``path``."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    path.parent.mkdir(parents=True, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    payload = {"variables": variables}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    if path.exists():
        import shutil

        shutil.rmtree(path)
    ckptr.save(path, payload)
    ckptr.wait_until_finished()
    meta = dict(metadata or {})
    with open(str(path) + ".meta.json", "w") as f:
        json.dump(_jsonable(meta), f, indent=2)
    return str(path)


def load_checkpoint(path: str, example_payload) -> dict:
    """Restore against an example pytree (same structure/shapes)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(Path(path).absolute(), example_payload)


def load_metadata(path: str) -> dict:
    with open(str(Path(path).absolute()) + ".meta.json") as f:
        return json.load(f)


def _jsonable(obj: Any):
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return _jsonable(dataclasses.asdict(obj))
    if isinstance(obj, dict):
        return {k: _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, (np.integer, np.floating)):
        return obj.item()
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    return obj


def push_checkpoint_to_hub(
    path: str, repo_id: str, token: Optional[str] = None
):
    """Upload a checkpoint directory to the Hugging Face hub
    (reference: gpudrive/utils/push_checkpoint_to_huggingface.py:1-34).
    Gated on huggingface_hub being installed and network access."""
    try:
        from huggingface_hub import HfApi
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "huggingface_hub is not installed in this environment"
        ) from e
    api = HfApi(token=token)
    api.create_repo(repo_id, exist_ok=True)
    api.upload_folder(folder_path=path, repo_id=repo_id)
