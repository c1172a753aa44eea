"""Scene-pool generator contract tests (scripts/make_scene_pool.py v3).

The pool is the training distribution for resampling campaigns; the
contract is the expert-replay invariant the reference's own test suite
checks on its fixtures (tests/test_expert.py): every valid agent reaches
its goal with zero collision flags, here across interaction archetypes
(intersections / merges / crosswalks with pedestrians)."""

import importlib.util
import os

import numpy as np
import pytest

_spec = importlib.util.spec_from_file_location(
    "make_scene_pool",
    os.path.join(os.path.dirname(__file__), "..", "scripts",
                 "make_scene_pool.py"),
)
msp = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(msp)


def _gen_archetypes(seeds=range(40)):
    found = {}
    for s in seeds:
        scene = msp.make_scene_v3(s)
        kind = scene["metadata"]["synth_archetype"]
        found.setdefault(kind, scene)
        if len(found) == 4:
            break
    return found


def test_v3_all_archetypes_replay_clean(tmp_path):
    """One scene of each archetype: expert replay through the REAL sim
    reaches every goal collision-free (pedestrians included)."""
    import json

    found = _gen_archetypes()
    assert set(found) == {"arc", "intersection", "merge", "crosswalk"}, (
        set(found)
    )
    paths = []
    for kind, scene in found.items():
        p = tmp_path / scene["name"]
        p.write_text(json.dumps(scene))
        paths.append(str(p))
    assert msp.validate_pool(paths, ignore_non_vehicles=False)


def test_v3_interaction_content():
    """The non-arc archetypes actually contain the advertised pressure:
    crossing headings at intersections, a ramp path in merges, pedestrians
    marked as experts at crosswalks."""
    found = _gen_archetypes()
    inter = found["intersection"]
    headings = {round(o["heading"][0], 2) for o in inter["objects"]}
    assert len(headings) >= 2
    cw = found["crosswalk"]
    peds = [o for o in cw["objects"] if o["type"] == "pedestrian"]
    assert peds and all(o["mark_as_expert"] for o in peds)
    assert any(r["type"] == "crosswalk" for r in cw["roads"])
    mg = found["merge"]
    # the merger's heading changes along the ramp
    assert any(
        np.ptp(np.asarray(o["heading"])[np.asarray(o["valid"], bool)]) > 0.05
        for o in mg["objects"]
    )


def test_v3_goal_entry_and_sat_verifier():
    """The verifier itself: a fabricated head-on pair is flagged; the
    goal-entry check rejects an early goal."""
    rng = np.random.default_rng(0)
    xs = np.linspace(0.0, 50.0, msp.T)
    ys = np.zeros(msp.T)
    hs = np.zeros(msp.T)
    a = msp.emit_object(rng, xs, ys, hs, msp.T - 2, 1)
    b = msp.emit_object(rng, xs[::-1].copy(), ys, hs + np.pi, msp.T - 2, 2)
    drops = msp.verify_objects([a, b], [])
    assert drops == [1]
    assert msp.goal_entry_ok(a)
    bad = dict(a)
    bad["goalPosition"] = dict(a["position"][0])  # goal at the start
    assert not msp.goal_entry_ok(bad)


def test_v3_scene_size_buckets():
    """Pool scenes stay inside the campaign compile bucket."""
    for s in range(12):
        scene = msp.make_scene_v3(s)
        segs = sum(len(r["geometry"]) - 1 or 1 for r in scene["roads"])
        assert segs <= 250, segs
        assert len(scene["objects"]) <= 32
