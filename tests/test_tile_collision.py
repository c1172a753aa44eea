"""Tile-skip agent-road narrow phase: exactness vs the dense SAT.

The tile path (scene/rtiles.py + core/pallas_kernels.agent_road_hits_tiled +
core/collision._tiled_road_hits) must produce bit-identical collision flags
to the dense all-pairs path — the AABB tile bound is conservative and the
in-tile math is the same SAT (reference semantics: src/sim.cpp:628-747).
Runs in Pallas interpret mode on CPU; validated compiled on TPU."""

import dataclasses
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gpudrive_lab_tpu.core import step as stepmod
from gpudrive_lab_tpu.core.types import CollisionBehaviour, Params
from gpudrive_lab_tpu.scene.compiler import build_scene
from gpudrive_lab_tpu.scene.rtiles import build_road_tiles

EXAMPLES = "/root/reference/data/processed/examples"
SCENES = (
    sorted(
        os.path.join(EXAMPLES, f)
        for f in os.listdir(EXAMPLES)
        if f.endswith(".json")
    )
    if os.path.isdir(EXAMPLES)
    else []
)


def _random_state(scene, rng):
    state = stepmod.init_state(scene)
    W, A = state.pos.shape[:2]
    # scatter agents around their start positions so some overlap roads
    jitter = rng.normal(0, 8.0, (W, A, 2)).astype(np.float32)
    return state.replace(
        pos=state.pos + jnp.asarray(jitter),
        yaw=state.yaw + jnp.asarray(
            rng.uniform(-1, 1, (W, A)).astype(np.float32)
        ),
        steps_remaining=state.steps_remaining - 1,  # past the fresh branch
    )


@pytest.mark.skipif(not SCENES, reason="example scenes not mounted")
@pytest.mark.parametrize("max_roads", [2048, 10240])
def test_tile_path_matches_dense(max_roads):
    params_dense = Params(
        collision_behaviour=CollisionBehaviour.IGNORE,
        use_tile_collision=False,
        polyline_reduction_threshold=0.1,
    )
    params_tiled = dataclasses.replace(params_dense, use_tile_collision=True)
    paths = (SCENES * 3)[:6]
    scene = build_scene(paths, params_tiled, max_roads=max_roads)
    assert scene.rtiles is not None
    assert scene.rtiles.feat.shape[1] == max_roads // 256

    rng = np.random.default_rng(0)
    state0 = _random_state(scene, rng)
    act = jnp.zeros(
        (scene.num_worlds, scene.max_agents, 10), jnp.float32
    )

    s_dense = jax.jit(stepmod.step, static_argnames="params")(
        scene, state0, act, params_dense
    )
    s_tiled = jax.jit(stepmod.step, static_argnames="params")(
        scene, state0, act, params_tiled
    )
    for f in (
        "collided", "collided_road", "collided_vehicle",
        "collided_non_vehicle",
    ):
        np.testing.assert_array_equal(
            np.asarray(getattr(s_dense, f)),
            np.asarray(getattr(s_tiled, f)),
            err_msg=f,
        )
    # sanity: the jittered states actually produce road collisions
    assert int(np.asarray(s_dense.collided_road).sum()) > 0


def test_tile_builder_covers_all_valid_segments():
    """Every valid segment appears in exactly one tile slot with its
    geometry intact, and padding contributes allow=0."""
    rng = np.random.default_rng(1)
    W, R = 2, 512
    pos = np.zeros((W, R, 3), np.float32)
    pos[..., 0:2] = rng.uniform(-200, 200, (W, R, 2))
    yaw = rng.uniform(-3, 3, (W, R)).astype(np.float32)
    scale = np.zeros((W, R, 3), np.float32)
    scale[..., 0] = rng.uniform(1, 20, (W, R))
    scale[..., 1] = 0.1
    etype = rng.integers(1, 7, (W, R)).astype(np.int32)
    valid = np.arange(R)[None, :] < np.array([200, 512])[:, None]

    rt = build_road_tiles(pos, yaw, scale, etype, valid, tile=256)
    feat = np.asarray(rt.feat)  # [W, T, 8, 256]
    for w in range(W):
        flat = feat[w].transpose(1, 0, 2).reshape(8, -1)  # [8, R] sorted
        n = valid[w].sum()
        got = set(map(tuple, np.round(flat[0:2].T, 4).tolist()))
        want = set(
            map(tuple, np.round(pos[w, valid[w], 0:2], 4).tolist())
        )
        assert want <= got
        # allow rows are zero wherever the (sorted) segment is padding:
        # padding sorts last, so columns n.. must have allow == 0
        assert np.all(flat[6, n:] == 0.0)
        assert np.all(flat[7, n:] == 0.0)
    bounds = np.asarray(rt.bounds)
    # pure-padding tiles are flagged invalid
    assert bounds[0, -1, 5] == 0.0  # world 0: 200/512 valid -> tile 1 empty
    assert np.all(bounds[1, :, 5] == 1.0)
