"""Parity tests: the C++ scene compiler must produce byte-identical arrays
to the Python reference path on real scenes and across option combinations."""

import numpy as np
import pytest

from gpudrive_lab_tpu import native
from gpudrive_lab_tpu.core.types import DynamicsModel, Params
from gpudrive_lab_tpu.scene.compiler import (
    _compile_world_native,
    _compile_world_py,
)

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native compiler unavailable"
)

PARAM_SETS = [
    Params(polyline_reduction_threshold=0.0, ignore_non_vehicles=True),
    Params(polyline_reduction_threshold=0.5, ignore_non_vehicles=True,
           max_num_controlled_agents=2,
           dynamics_model=DynamicsModel.DELTA_LOCAL),
    Params(polyline_reduction_threshold=0.1, ignore_non_vehicles=False,
           dynamics_model=DynamicsModel.INVERTIBLE_BICYCLE),
    Params(init_only_valid_agents=False),
]


def _assert_world_equal(a, b):
    assert a.num_agents == b.num_agents
    assert a.num_roads == b.num_roads
    np.testing.assert_allclose(a.mean, b.mean, atol=1e-4)
    np.testing.assert_array_equal(a.map_name, b.map_name)
    np.testing.assert_array_equal(a.scenario_id, b.scenario_id)
    for k in a.agent:
        np.testing.assert_allclose(
            a.agent[k], b.agent[k], atol=2e-4, err_msg=f"agent[{k}]"
        )
    for k in a.road:
        np.testing.assert_allclose(
            a.road[k], b.road[k], atol=2e-4, err_msg=f"road[{k}]"
        )


@pytest.mark.parametrize("params", PARAM_SETS)
def test_native_matches_python_reference_scene(reference_scene_path, params):
    nat = _compile_world_native(reference_scene_path, params, frozenset())
    assert nat is not None
    py = _compile_world_py(reference_scene_path, params, frozenset())
    _assert_world_equal(nat, py)


def test_native_matches_python_examples(example_scene_paths):
    params = Params(polyline_reduction_threshold=0.1, ignore_non_vehicles=True)
    for p in example_scene_paths:
        nat = _compile_world_native(p, params, frozenset())
        py = _compile_world_py(p, params, frozenset())
        _assert_world_equal(nat, py)


def test_native_deleted_agents(reference_scene_path):
    params = Params(polyline_reduction_threshold=0.5, ignore_non_vehicles=True)
    py_all = _compile_world_py(reference_scene_path, params, frozenset())
    victim = int(py_all.agent["aid"][0])
    nat = _compile_world_native(
        reference_scene_path, params, frozenset({victim})
    )
    py = _compile_world_py(reference_scene_path, params, frozenset({victim}))
    _assert_world_equal(nat, py)
    assert victim not in nat.agent["aid"][: nat.num_agents]
