"""Spatial-hash collision path: exact agreement with the dense all-pairs
narrow phase across random rollouts on real scenes."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gpudrive_lab_tpu import constants as C
from gpudrive_lab_tpu.core import step as stepmod
from gpudrive_lab_tpu.core.types import CollisionBehaviour, Params
from gpudrive_lab_tpu.scene.compiler import build_scene
from gpudrive_lab_tpu.scene.grid import build_collision_grid, build_world_grid


def test_grid_registration_covers_all_entities(reference_scene_path):
    params = Params(polyline_reduction_threshold=0.1, ignore_non_vehicles=True)
    scene = build_scene([reference_scene_path], params)
    from gpudrive_lab_tpu.scene.compiler import compile_world

    w = compile_world(reference_scene_path, params, frozenset())
    origin, (gx, gy), cells = build_world_grid(w.road, w.num_roads)
    registered = set()
    for c in cells:
        registered.update(c)
    assert registered == set(range(w.num_roads))


@pytest.mark.parametrize("scene_idx", [0, 1])
def test_grid_matches_dense_collision(example_scene_paths, scene_idx):
    base = Params(
        polyline_reduction_threshold=0.1,
        ignore_non_vehicles=True,
        collision_behaviour=CollisionBehaviour.IGNORE,
    )
    dense_p = base
    grid_p = dataclasses.replace(base, use_collision_grid=True)
    paths = [example_scene_paths[scene_idx]]
    dense_scene = build_scene(paths, dense_p)
    grid_scene = build_scene(paths, grid_p)
    assert grid_scene.grid is not None

    reset = jax.jit(stepmod.reset, static_argnames="params")
    step = jax.jit(stepmod.step, static_argnames="params")

    sd = reset(dense_scene, None, dense_p)
    sg = reset(grid_scene, None, grid_p)
    np.testing.assert_array_equal(
        np.asarray(sd.collided), np.asarray(sg.collided)
    )

    rng = np.random.default_rng(0)
    for t in range(25):
        # random-ish continuous actions to push agents around (and into
        # road edges)
        acts = np.zeros((1, C.MAX_AGENTS, C.ACTION_DIM), np.float32)
        acts[..., 0] = rng.uniform(-4, 4, (1, C.MAX_AGENTS))
        acts[..., 1] = rng.uniform(-0.5, 0.5, (1, C.MAX_AGENTS))
        a = jnp.asarray(acts)
        sd = step(dense_scene, sd, a, dense_p)
        sg = step(grid_scene, sg, a, grid_p)
        np.testing.assert_array_equal(
            np.asarray(sd.collided), np.asarray(sg.collided),
            err_msg=f"step {t}",
        )
        np.testing.assert_array_equal(
            np.asarray(sd.collided_road), np.asarray(sg.collided_road)
        )
        np.testing.assert_allclose(
            np.asarray(sd.pos), np.asarray(sg.pos), atol=1e-6
        )
    # sanity: on the real WOMD scenes random driving must hit something
    # (the sparse synthetic fallback fixture legitimately may not)
    if "synthetic" not in example_scene_paths[scene_idx]:
        assert np.asarray(sd.collided).sum() > 0


@pytest.mark.parametrize("approx", [False, True])
def test_topk_pruned_matches_dense_collision(example_scene_paths, approx):
    """collision_top_k (distance-ranked candidate pruning, exact or
    approx_max_k ranking) agrees with the dense [W, A, R] narrow phase."""
    base = Params(
        polyline_reduction_threshold=0.1,
        ignore_non_vehicles=True,
        collision_behaviour=CollisionBehaviour.IGNORE,
    )
    pruned_p = dataclasses.replace(
        base, collision_top_k=32, approx_top_k=approx
    )
    paths = [example_scene_paths[0]]
    scene = build_scene(paths, base)

    reset = jax.jit(stepmod.reset, static_argnames="params")
    step = jax.jit(stepmod.step, static_argnames="params")

    sd = reset(scene, None, base)
    sp = reset(scene, None, pruned_p)
    rng = np.random.default_rng(1)
    for t in range(25):
        acts = np.zeros((1, C.MAX_AGENTS, C.ACTION_DIM), np.float32)
        acts[..., 0] = rng.uniform(-4, 4, (1, C.MAX_AGENTS))
        acts[..., 1] = rng.uniform(-0.5, 0.5, (1, C.MAX_AGENTS))
        a = jnp.asarray(acts)
        sd = step(scene, sd, a, base)
        sp = step(scene, sp, a, pruned_p)
        np.testing.assert_array_equal(
            np.asarray(sd.collided), np.asarray(sp.collided),
            err_msg=f"step {t}",
        )
        np.testing.assert_array_equal(
            np.asarray(sd.collided_road), np.asarray(sp.collided_road)
        )
