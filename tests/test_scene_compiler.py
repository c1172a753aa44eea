"""Scene compiler golden tests.

Mirror of the reference's observation test, which recomputes road geometry
directly from the raw scene JSON and checks the exported map observations
(reference: tests/observationTest.cpp:88-137): world-mean subtraction,
segment midpoints/orientations/half-lengths, and entity types.  Plus checks
of the SDC-first object ordering and controllability rules.
"""

import json
import math

import numpy as np
import pytest

from gpudrive_lab_tpu import constants as C
from gpudrive_lab_tpu.core.types import DynamicsModel, Params
from gpudrive_lab_tpu.scene.compiler import build_scene, compile_world
from gpudrive_lab_tpu.scene.loader import load_map, reduce_polyline

PARAMS = Params(
    polyline_reduction_threshold=0.0,  # no reduction: geometry is exact
    ignore_non_vehicles=True,
)


def naive_mean(data):
    tot = np.zeros(2)
    n = 0
    for obj in data["objects"]:
        for i, p in enumerate(obj["position"]):
            if obj["valid"][i]:
                tot += (p["x"], p["y"])
                n += 1
    for r in data["roads"]:
        for p in r["geometry"]:
            tot += (p["x"], p["y"])
            n += 1
    return tot / n


def test_world_mean(reference_scene_path):
    with open(reference_scene_path) as f:
        data = json.load(f)
    w = compile_world(reference_scene_path, PARAMS)
    np.testing.assert_allclose(w.mean[:2], naive_mean(data), atol=1e-3)


def test_road_segments_match_raw_json(reference_scene_path):
    """Every polyline edge becomes a box at the midpoint with atan2
    orientation and half-length scale (reference: src/level_gen.cpp:166-185,
    checked as in observationTest.cpp)."""
    with open(reference_scene_path) as f:
        data = json.load(f)
    w = compile_world(reference_scene_path, PARAMS)
    mean = w.mean[:2]

    expected = []
    for road in data["roads"]:
        t = road["type"]
        # Demean in float32 first, as the compiler (and the reference C++)
        # does — atan2 on raw float64 coords differs by ~1e-3 rad.
        g = np.array(
            [(p["x"], p["y"]) for p in road["geometry"]], np.float32
        ) - mean.astype(np.float32)
        if t in ("road_edge", "road_line", "lane"):
            for a, b in zip(g[:-1], g[1:]):
                mid = ((a[0] + b[0]) / 2, (a[1] + b[1]) / 2)
                yaw = math.atan2(b[1] - a[1], b[0] - a[0])
                half = math.dist(a, b) / 2
                expected.append((mid, yaw, half, t))
        if len(expected) >= C.MAX_ROAD_ENTITIES:
            break

    type_map = {"road_edge": C.ET_ROAD_EDGE, "road_line": C.ET_ROAD_LINE,
                "lane": C.ET_ROAD_LANE}
    seg_rows = [
        k for k in range(w.num_roads)
        if w.road["etype"][k] in (C.ET_ROAD_EDGE, C.ET_ROAD_LINE, C.ET_ROAD_LANE)
    ]
    assert len(seg_rows) == min(len(expected), C.MAX_ROAD_ENTITIES)
    for k, (mid, yaw, half, t) in zip(seg_rows, expected):
        np.testing.assert_allclose(w.road["pos"][k, :2], mid, atol=1e-2)
        assert abs(w.road["yaw"][k] - yaw) < 1e-4
        assert abs(w.road["scale"][k, 0] - half) < 1e-3
        assert w.road["etype"][k] == type_map[t]


def test_sdc_first_ordering(reference_scene_path):
    with open(reference_scene_path) as f:
        data = json.load(f)
    m = load_map(reference_scene_path, 0.0)
    sdc_idx = data["metadata"]["sdc_track_index"]
    if 0 <= sdc_idx < len(data["objects"]):
        assert m["objects"][0]["oid"] == data["objects"][sdc_idx]["id"]
        assert m["objects"][0]["metadata"][0] == 1


def test_goal_and_trajectory_demeaned(reference_scene_path):
    with open(reference_scene_path) as f:
        data = json.load(f)
    w = compile_world(reference_scene_path, PARAMS)
    m = load_map(reference_scene_path, 0.0)
    # First created agent corresponds to first orderable, creatable object.
    obj = next(
        o for o in m["objects"]
        if o["etype"] == C.ET_VEHICLE and o["valid"][0]
    )
    i = list(w.agent["aid"]).index(obj["oid"])
    np.testing.assert_allclose(
        w.agent["goal"][i], obj["goal"] - w.mean[:2], atol=1e-4
    )
    np.testing.assert_allclose(
        w.agent["traj_pos"][i, 0], obj["pos"][0] - w.mean[:2], atol=1e-4
    )


def test_polyline_reduction_keeps_endpoints_and_corners():
    # A right angle with collinear runs: interior collinear points drop,
    # endpoints and the corner survive.
    pts = np.array(
        [[0, 0], [1, 0], [2, 0], [3, 0], [4, 0], [5, 0],
         [5, 1], [5, 2], [5, 3], [5, 4], [5, 5]],
        np.float32,
    )
    out = reduce_polyline(pts, 0.1)
    assert [0, 0] == list(out[0]) and [5, 5] == list(out[-1])
    assert any((p == [5, 0]).all() for p in out)
    assert len(out) < len(pts)


def test_polyline_reduction_zero_threshold_is_identity():
    pts = np.array([[0, 0], [1, 0.5], [2, 0], [3, 0.5]] * 4, np.float32)
    out = reduce_polyline(pts, 0.0)
    assert len(out) == len(pts)


def test_controllability_budget(reference_scene_path):
    params = Params(
        polyline_reduction_threshold=0.5,
        ignore_non_vehicles=True,
        max_num_controlled_agents=1,
    )
    w = compile_world(reference_scene_path, params)
    assert w.agent["controlled"].sum() == 1
    params0 = Params(
        polyline_reduction_threshold=0.5,
        ignore_non_vehicles=True,
        max_num_controlled_agents=0,
    )
    w0 = compile_world(reference_scene_path, params0)
    assert w0.agent["controlled"].sum() == 0


def test_static_agents_goal_at_start(reference_scene_path):
    w = compile_world(reference_scene_path, PARAMS)
    for i in range(w.num_agents):
        dist = np.linalg.norm(w.agent["goal"][i] - w.agent["traj_pos"][i, 0])
        if w.agent["static"][i]:
            assert dist < C.STATIC_THRESHOLD


def test_batch_padding(example_scene_paths):
    scene = build_scene(example_scene_paths, PARAMS)
    n = np.asarray(scene.num_roads)
    valid = np.asarray(scene.roads.valid)
    assert scene.max_roads % 512 == 0
    for wi in range(len(example_scene_paths)):
        assert valid[wi].sum() == n[wi]
        assert not valid[wi, n[wi]:].any()
