"""Prefetching scene-loader tests."""

import os
import time

from gpudrive_lab_tpu.core.types import Params
from gpudrive_lab_tpu.env.dataset import SceneDataLoader
from gpudrive_lab_tpu.scene import compiler
from gpudrive_lab_tpu.scene.prefetch import PrefetchingSceneLoader


def test_prefetch_warms_cache(example_scene_paths):
    loader = SceneDataLoader(
        root=os.path.dirname(example_scene_paths[0]),
        batch_size=2, dataset_size=4, sample_with_replacement=True,
    )
    params = Params(polyline_reduction_threshold=0.33)
    pf = PrefetchingSceneLoader(loader, params)
    try:
        paths = pf.next_batch()
        assert len(paths) == 2
        # batch is already compiled: warm fetch is instant
        t = time.time()
        for p in paths:
            compiler.compile_world(p, params, frozenset())
        assert time.time() - t < 0.05
        # iterator keeps producing batches (wraps around)
        for _ in range(4):
            assert len(pf.next_batch()) == 2
    finally:
        pf.close()
