"""Training telemetry.

Mirror of the reference's PPO profiling machinery
(reference: gpudrive/integrations/puffer/ppo.py — ``Profile`` per-phase
timers + controlled/padded SPS :426-515 and the ``Utilization`` psutil/device
monitor thread :669-692).  TPU additions: optional jax.profiler trace capture
around a phase.
"""

from __future__ import annotations

import contextlib
import threading
import time
from collections import defaultdict, deque


class Profile:
    """Per-phase wall-clock accounting with agent-SPS summaries."""

    PHASES = ("env", "eval_forward", "train_forward", "learn", "misc")

    def __init__(self):
        self.elapsed = defaultdict(float)
        self.start_t = time.time()
        self.controlled_agent_steps = 0
        self.padded_agent_steps = 0
        self._open = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            self.elapsed[name] += time.time() - t0

    def account(self, controlled_steps: int, padded_steps: int):
        self.controlled_agent_steps += controlled_steps
        self.padded_agent_steps += padded_steps

    @property
    def uptime(self) -> float:
        return time.time() - self.start_t

    def summary(self) -> dict:
        total = max(self.uptime, 1e-9)
        out = {f"time_{k}_s": round(v, 2) for k, v in self.elapsed.items()}
        out["uptime_s"] = round(total, 1)
        out["controlled_agent_sps"] = round(self.controlled_agent_steps / total)
        out["padded_agent_sps"] = round(self.padded_agent_steps / total)
        return out


class Utilization(threading.Thread):
    """Background sampler of host cpu/memory (reference: ppo.py:669-692).
    Device-side utilization is not exposed by the TPU runtime here; HBM use
    can be sampled via jax.local_devices()[0].memory_stats() when available."""

    def __init__(self, delay: float = 1.0, maxlen: int = 300):
        super().__init__(daemon=True)
        self.delay = delay
        self.cpu_util = deque(maxlen=maxlen)
        self.mem_util = deque(maxlen=maxlen)
        self.device_mem = deque(maxlen=maxlen)
        self.stopped = False

    def run(self):
        import psutil

        while not self.stopped:
            self.cpu_util.append(psutil.cpu_percent())
            self.mem_util.append(psutil.virtual_memory().percent)
            try:
                import jax

                stats = jax.local_devices()[0].memory_stats() or {}
                used = stats.get("bytes_in_use")
                if used is not None:
                    self.device_mem.append(used / 2**30)
            except Exception:
                pass
            time.sleep(self.delay)

    def stop(self):
        self.stopped = True

    def summary(self) -> dict:
        mean = lambda q: round(sum(q) / len(q), 1) if q else 0.0
        return {
            "cpu_util": mean(self.cpu_util),
            "mem_util": mean(self.mem_util),
            "device_mem_gib": mean(self.device_mem),
        }


@contextlib.contextmanager
def device_trace(log_dir: str | None):
    """Capture a jax.profiler trace around a block (TPU equivalent of the
    reference's torch profiler hooks)."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
