"""Tests for the WOMD conversion core (via proto stubs), post-processing
validation, and behavior detection."""

import json
import types

import numpy as np
import pytest

from gpudrive_lab_tpu.data_utils.detect_behavior import (
    check_reversing,
    check_uturn,
    process_scene,
)
from gpudrive_lab_tpu.data_utils.post_processing import (
    is_valid_json_structure,
    process_directory,
)
from gpudrive_lab_tpu.data_utils.waymo_converter import scenario_to_dict


# ---- proto stubs -------------------------------------------------------

class _State(types.SimpleNamespace):
    pass


def _state(x, y, heading=0.0, vx=0.0, vy=0.0, valid=True):
    return _State(
        center_x=x, center_y=y, center_z=0.0, length=4.5, width=2.0,
        height=1.5, heading=heading, velocity_x=vx, velocity_y=vy,
        valid=valid,
    )


class _Track(types.SimpleNamespace):
    pass


class _Point(types.SimpleNamespace):
    pass


class _MapFeature:
    def __init__(self, fid, feature, pts, sub_type=1):
        self.id = fid
        self._feature = feature
        data = types.SimpleNamespace(type=sub_type)
        pl = [_Point(x=p[0], y=p[1], z=p[2] if len(p) > 2 else 0.0) for p in pts]
        if feature in ("crosswalk", "speed_bump", "driveway"):
            data.polygon = pl
        elif feature == "stop_sign":
            data.position = pl[0]
        else:
            data.polyline = pl
        setattr(self, feature, data)

    def WhichOneof(self, _):
        return self._feature


class _Scenario(types.SimpleNamespace):
    pass


def make_scenario(tracks, features, tl=False):
    return _Scenario(
        scenario_id="abc123",
        tracks=tracks,
        map_features=features,
        dynamic_map_states=[
            types.SimpleNamespace(lane_states=[1] if tl else [])
        ],
        sdc_track_index=0,
        objects_of_interest=[],
        tracks_to_predict=[],
    )


def _vehicle(tid, x, y, n=5, **kw):
    return _Track(
        id=tid, object_type=1, states=[_state(x + i, y, **kw) for i in range(n)]
    )


def test_traffic_light_scene_dropped():
    sc = make_scenario([_vehicle(1, 0, 0)], [], tl=True)
    assert scenario_to_dict(sc, "a.json") is None


def test_overpass_scene_dropped():
    # The reference's check compares road-edge VERTICES: two vertices within
    # 0.2m in xy but >0.2m apart in z flag a 3-D structure.
    f1 = _MapFeature(1, "road_edge", [(0, 0, 0), (5, 0, 0), (10, 0, 0)])
    f2 = _MapFeature(2, "road_edge", [(5, 0.05, 5), (5, 5, 5)])
    sc = make_scenario([_vehicle(1, 0, 20)], [f1, f2])
    assert scenario_to_dict(sc, "a.json") is None


def test_basic_conversion_and_expert_marking():
    edge = _MapFeature(1, "road_edge", [(0, 5, 0), (50, 5, 0)])
    lane = _MapFeature(2, "lane", [(0, 0, 0), (50, 0, 0)], sub_type=2)
    clean = _vehicle(1, 0, 0)
    on_edge = _vehicle(2, 10, 5)  # spawns straddling the road edge
    overlapping_a = _vehicle(3, 30, -10)
    overlapping_b = _vehicle(4, 31, -10)  # overlaps agent 3 at spawn
    sc = make_scenario([clean, on_edge, overlapping_a, overlapping_b],
                       [edge, lane])
    out = scenario_to_dict(sc, "scene.json")
    assert out is not None
    assert out["scenario_id"] == "abc123"
    assert len(out["roads"]) == 2
    assert out["roads"][0]["type"] == "road_edge"
    assert out["roads"][0]["map_element_id"] == 15  # ROAD_EDGE_BOUNDARY
    assert out["roads"][1]["map_element_id"] == 2  # LANE_SURFACE_STREET
    flags = {o["id"]: o["mark_as_expert"] for o in out["objects"]}
    assert flags[1] is False
    assert flags[2] is True
    assert flags[3] is True and flags[4] is True


def test_invalid_states_get_err_val():
    t = _Track(
        id=9, object_type=1,
        states=[_state(0, 0), _state(1, 0, valid=False), _state(2, 0)],
    )
    sc = make_scenario([t], [])
    out = scenario_to_dict(sc, "x.json")
    obj = out["objects"][0]
    assert obj["position"][1]["x"] == -1e4
    assert obj["valid"] == [True, False, True]
    # goal = last valid position
    assert obj["goalPosition"]["x"] == 2


def test_post_processing_validation(tmp_path):
    good = {"name": "a", "objects": [{"position": [], "type": "vehicle"}],
            "roads": [{"geometry": [{"x": 1, "y": 2}]}], "tl_states": {}}
    (tmp_path / "tfrecord_good.json").write_text(json.dumps(good))
    (tmp_path / "tfrecord_bad.json").write_text("{broken")
    (tmp_path / "tfrecord_missing.json").write_text(json.dumps({"name": "x"}))
    assert is_valid_json_structure(tmp_path / "tfrecord_good.json")
    valid, invalid = process_directory(str(tmp_path), num_workers=2)
    assert valid == 1 and invalid == 2
    assert not (tmp_path / "tfrecord_bad.json").exists()


def _pb_scenario(scenario_id, with_tl=False):
    """A real (vendored-proto) Scenario message with one driving vehicle."""
    from gpudrive_lab_tpu.data_utils.waymo_protos import scenario_lite_pb2 as pb

    sc = pb.Scenario(scenario_id=scenario_id, sdc_track_index=0)
    tr = sc.tracks.add(id=1, object_type=1)
    for i in range(91):
        tr.states.add(
            center_x=float(i), center_y=0.0, center_z=0.0, length=4.5,
            width=2.0, height=1.5, heading=0.0, velocity_x=10.0,
            velocity_y=0.0, valid=True,
        )
    edge = sc.map_features.add(id=10)
    for x in (-5.0, 50.0, 95.0):
        edge.road_edge.polyline.add(x=x, y=6.0, z=0.0)
    edge.road_edge.type = 1
    lane = sc.map_features.add(id=11)
    lane.lane.type = 2
    for x in (-5.0, 95.0):
        lane.lane.polyline.add(x=x, y=0.0, z=0.0)
    stop = sc.map_features.add(id=12)
    stop.stop_sign.position.x = 90.0
    stop.stop_sign.position.y = -3.0
    stop.stop_sign.lane.append(11)
    if with_tl:
        dms = sc.dynamic_map_states.add()
        dms.lane_states.add(lane=11, state=3)
    sc.tracks_to_predict.add(track_index=0, difficulty=1)
    return sc


def _wire_varint(v):
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        out.append(b | (0x80 if v else 0))
        if not v:
            return bytes(out)


def _wire_field(num, wire_type, payload):
    return _wire_varint((num << 3) | wire_type) + payload


def _wire_len(num, payload):
    return _wire_field(num, 2, _wire_varint(len(payload)) + payload)


def _wire_double(num, v):
    import struct
    return _wire_field(num, 1, struct.pack("<d", v))


def test_vendored_proto_matches_official_wire_numbers():
    """Parse a Scenario payload HAND-ENCODED with the official WOMD field
    numbers (scenario.proto: timestamps_seconds=1, current_time_index=2,
    tracks=3, dynamic_map_states=4, scenario_id=5, map_features=6,
    sdc_track_index=7, objects_of_interest=8, tracks_to_predict=10).
    Guards against the vendored schema drifting from the public one — a
    round-trip through the vendored pb2 alone cannot catch that, since
    wrong numbers serialize and re-parse self-consistently."""
    import struct

    from gpudrive_lab_tpu.data_utils.waymo_protos import scenario_lite_pb2 as pb

    state = (
        _wire_double(2, 12.5)            # center_x
        + _wire_field(5, 5, struct.pack("<f", 4.5))   # length
        + _wire_field(11, 0, b"\x01")    # valid
    )
    track = (
        _wire_field(1, 0, _wire_varint(7))   # id
        + _wire_field(2, 0, _wire_varint(1))  # object_type = vehicle
        + _wire_len(3, state)
    )
    point = _wire_double(1, 1.0) + _wire_double(2, 2.0)
    road_edge = _wire_field(1, 0, b"\x01") + _wire_len(2, point)
    feature = _wire_field(1, 0, _wire_varint(42)) + _wire_len(5, road_edge)
    lane_state = (
        _wire_field(1, 0, _wire_varint(11)) + _wire_field(2, 0, b"\x03")
    )
    dms = _wire_len(1, lane_state)
    ttp = _wire_field(1, 0, b"\x00") + _wire_field(2, 0, b"\x01")

    payload = (
        _wire_double(1, 0.0)                     # timestamps_seconds
        + _wire_field(2, 0, _wire_varint(10))    # current_time_index
        + _wire_len(3, track)                    # tracks
        + _wire_len(4, dms)                      # dynamic_map_states
        + _wire_len(5, b"wire-check")            # scenario_id
        + _wire_len(6, feature)                  # map_features
        + _wire_field(7, 0, _wire_varint(0))     # sdc_track_index
        + _wire_field(8, 0, _wire_varint(7))     # objects_of_interest
        + _wire_len(10, ttp)                     # tracks_to_predict
    )
    sc = pb.Scenario()
    sc.ParseFromString(payload)
    assert sc.scenario_id == "wire-check"
    assert sc.current_time_index == 10
    assert sc.sdc_track_index == 0
    assert list(sc.objects_of_interest) == [7]
    assert len(sc.tracks) == 1 and sc.tracks[0].id == 7
    assert sc.tracks[0].object_type == 1
    assert sc.tracks[0].states[0].center_x == 12.5
    assert sc.tracks[0].states[0].length == 4.5
    assert sc.tracks[0].states[0].valid
    assert len(sc.map_features) == 1 and sc.map_features[0].id == 42
    assert sc.map_features[0].WhichOneof("feature_data") == "road_edge"
    assert sc.map_features[0].road_edge.polyline[0].x == 1.0
    assert len(sc.dynamic_map_states) == 1
    assert sc.dynamic_map_states[0].lane_states[0].lane == 11
    assert sc.dynamic_map_states[0].lane_states[0].state == 3
    assert sc.tracks_to_predict[0].difficulty == 1


def test_tfrecord_pipeline_end_to_end(tmp_path):
    """Synthesized Scenario protos -> TFRecord shard -> CLI conversion ->
    valid JSONs -> compiled, steppable Scene.  Exercises the real framing
    (crc-checked), the vendored proto parse, the traffic-light filter, and
    the downstream scene compiler on the produced files."""
    from gpudrive_lab_tpu.data_utils.process_waymo_files import (
        process_tfrecord,
    )
    from gpudrive_lab_tpu.data_utils.tfrecord import write_tfrecord

    shard = tmp_path / "training.tfrecord-00000-of-00002"
    n = write_tfrecord(
        str(shard),
        [
            _pb_scenario("scene0").SerializeToString(),
            _pb_scenario("tl", with_tl=True).SerializeToString(),
            _pb_scenario("scene2").SerializeToString(),
        ],
    )
    assert n == 3
    out_dir = tmp_path / "out"
    out_dir.mkdir()
    path, written, filtered = process_tfrecord((str(shard), str(out_dir)))
    assert (written, filtered) == (2, 1)
    produced = sorted(out_dir.iterdir())
    assert [p.name for p in produced] == [
        "tfrecord-00000-of-00002_0.json",
        "tfrecord-00000-of-00002_2.json",
    ]

    blob = json.loads(produced[0].read_text())
    assert blob["scenario_id"] == "scene0"
    assert [r["type"] for r in blob["roads"]] == [
        "road_edge", "lane", "stop_sign"
    ]
    assert blob["metadata"]["tracks_to_predict"] == [
        {"track_index": 0, "difficulty": 1}
    ]
    from gpudrive_lab_tpu.data_utils.post_processing import (
        is_valid_json_structure,
    )

    assert all(is_valid_json_structure(p) for p in produced)

    import jax
    from gpudrive_lab_tpu.core import step as stepmod
    from gpudrive_lab_tpu.core.types import Params
    from gpudrive_lab_tpu.scene.compiler import build_scene

    scene = build_scene([str(p) for p in produced], Params())
    state = jax.jit(stepmod.reset, static_argnames="params")(
        scene, None, Params()
    )
    assert int(np.asarray(scene.num_agents).sum()) == 2
    assert not bool(np.asarray(state.collided).any())


def test_uturn_and_reversing_detection():
    n = 30
    straight = np.zeros(n)
    valid = np.ones(n, bool)
    assert not check_uturn(straight, valid)
    uturn = np.linspace(0, np.pi, n)
    assert check_uturn(uturn, valid)
    # reversing: velocity opposite to heading
    vel_fwd = np.tile([5.0, 0.0], (n, 1))
    vel_rev = np.tile([-5.0, 0.0], (n, 1))
    assert not check_reversing(straight, vel_fwd, valid)
    assert check_reversing(straight, vel_rev, valid, min_timesteps=10)
    # short reversal below threshold does not count
    brief = vel_fwd.copy()
    brief[5:10] = [-5, 0]
    assert not check_reversing(straight, brief, valid, min_timesteps=10)
