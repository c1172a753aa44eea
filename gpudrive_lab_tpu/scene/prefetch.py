"""Asynchronous scene-batch prefetching.

Runtime component with no reference equivalent (the reference reparses scene
JSONs synchronously inside Manager::setMaps, stalling training at every
resample, reference: src/mgr.cpp:590-654): a background thread pool compiles
the NEXT batch's worlds while the current batch trains, so
``swap_data_batch`` hits warm caches.  The native C++ compiler releases the
GIL during parsing, so prefetch overlaps cleanly with the host-side training
loop.
"""

from __future__ import annotations

import concurrent.futures
from typing import List, Optional

from gpudrive_lab_tpu.core.types import Params
from gpudrive_lab_tpu.env.dataset import SceneDataLoader
from gpudrive_lab_tpu.scene.compiler import compile_world


class PrefetchingSceneLoader:
    """Wraps a SceneDataLoader; ``next_batch()`` returns paths whose
    ``compile_world`` results are already cached, and immediately begins
    compiling the following batch in the background."""

    def __init__(
        self,
        loader: SceneDataLoader,
        params: Params,
        num_workers: int = 2,
    ):
        self.loader = loader
        self.params = params
        self._it = iter(loader)
        self._pool = concurrent.futures.ThreadPoolExecutor(num_workers)
        self._pending: Optional[tuple] = None
        self._kick()

    def _advance(self) -> List[str]:
        try:
            return next(self._it)
        except StopIteration:
            self._it = iter(self.loader)
            return next(self._it)

    def _kick(self):
        paths = self._advance()
        # NB: must pass the default `deleted` explicitly — lru_cache keys on
        # the literal argument tuple, so a 2-arg call would warm a different
        # entry than build_scene's 3-arg call reads.
        futures = [
            self._pool.submit(compile_world, p, self.params, frozenset())
            for p in paths
        ]
        self._pending = (paths, futures)

    def next_batch(self) -> List[str]:
        """Block until the prefetched batch is compiled, return its paths,
        and start prefetching the next one."""
        paths, futures = self._pending
        for f in futures:
            f.result()  # populates compile_world's lru cache
        self._kick()
        return paths

    def close(self):
        self._pool.shutdown(wait=False, cancel_futures=True)
