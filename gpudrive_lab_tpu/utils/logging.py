"""Metrics logging.

The reference logs everything to wandb with a rich-console dashboard
(reference: gpudrive/integrations/puffer/logging.py:50-164).  Here the
primary sink is JSONL on disk (works offline / in CI); wandb is used when
installed and configured."""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Optional


class MetricsLogger:
    def __init__(
        self,
        log_dir: str = "runs",
        exp_id: str = "exp",
        use_wandb: bool = False,
        wandb_kwargs: Optional[dict] = None,
        echo: bool = True,
    ):
        self.path = Path(log_dir) / f"{exp_id}.metrics.jsonl"
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._f = open(self.path, "a")
        self.echo = echo
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb.init(**(wandb_kwargs or {}))
            except Exception:
                self._wandb = None

    def log(self, metrics: dict, step: Optional[int] = None):
        rec = {"_t": round(time.time(), 3)}
        if step is not None:
            rec["step"] = step
        rec.update(metrics)
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)
        if self.echo:
            print(json.dumps(rec), flush=True)

    def close(self):
        self._f.close()
        if self._wandb is not None:
            self._wandb.finish()
