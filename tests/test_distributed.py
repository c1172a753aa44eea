"""Multi-host scaffolding semantics on the 8-virtual-device CPU mesh:
per-host scene-path blocks, world->device placement of assembled arrays, and
sharded-scene placement (parallel/distributed.py, parallel/mesh.py)."""

import os

import jax
import numpy as np
import pytest

from gpudrive_lab_tpu.parallel import distributed as dist
from gpudrive_lab_tpu.parallel.mesh import make_mesh, shard_worlds


@pytest.fixture(scope="module")
def mesh():
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8)


def test_shard_scene_paths_contiguous_blocks(monkeypatch):
    """Each simulated host gets the contiguous path blocks of ITS devices in
    global device order, and concatenating hosts in process order
    reconstructs the full world list (distributed.py:54-70)."""
    paths = [f"scene_{i:03d}.json" for i in range(64)]
    devices = jax.devices()
    wpd = 4

    host_blocks = []
    for host in range(2):
        local = devices[host * 4 : (host + 1) * 4]
        monkeypatch.setattr(jax, "local_devices", lambda l=local: l)
        got = dist.shard_scene_paths(paths, worlds_per_device=wpd)
        assert len(got) == 4 * wpd
        host_blocks.append(got)
    monkeypatch.undo()

    # block d of the flattened list belongs to global device d
    flat = host_blocks[0] + host_blocks[1]
    for d in range(8):
        block = flat[d * wpd : (d + 1) * wpd]
        assert block == paths[d * wpd : (d + 1) * wpd]


def test_shard_scene_paths_wraps_short_lists(monkeypatch):
    paths = ["a.json", "b.json", "c.json"]
    monkeypatch.setattr(jax, "local_devices", lambda: jax.devices()[:1])
    got = dist.shard_scene_paths(paths, worlds_per_device=5)
    assert got == ["a.json", "b.json", "c.json", "a.json", "b.json"]


def test_host_local_to_global_world_placement(mesh):
    """Assembled arrays are world-sharded: device d holds exactly the worlds
    of its block, in mesh device order (distributed.py:73-90)."""
    W, F = 16, 3  # 2 worlds per device
    x = np.arange(W * F, dtype=np.float32).reshape(W, F)
    tree = {"a": x, "b": np.arange(W, dtype=np.int32)}
    out = dist.host_local_to_global(tree, mesh)

    for name, arr in out.items():
        assert arr.shape[0] == W
        shards = {s.device: np.asarray(s.data) for s in arr.addressable_shards}
        for d_idx, device in enumerate(mesh.devices.ravel()):
            want = tree[name][d_idx * 2 : (d_idx + 1) * 2]
            np.testing.assert_array_equal(shards[device], want)


def test_shard_worlds_scene_placement(mesh):
    from gpudrive_lab_tpu.scene.synthetic import synthetic_scene

    scene = shard_worlds(
        synthetic_scene(num_worlds=8, num_agents=4, num_roads=16), mesh
    )
    valid = scene.agents.valid
    assert valid.shape[0] == 8
    devs = [s.device for s in valid.addressable_shards]
    assert set(devs) == set(mesh.devices.ravel())
    for s in valid.addressable_shards:
        assert np.asarray(s.data).shape[0] == 1  # one world per device


class TestMultiProcess:
    """REAL two-process jax.distributed (localhost coordinator, gloo CPU
    collectives): initialize + shard_scene_paths + host_local_to_global +
    sim step over the global mesh + cross-process all-reduce.  Upgrades the
    single-process virtual-device evidence to an actual process boundary
    (SURVEY §2.3 multi-host plan; parallel/distributed.py:32-87)."""

    def _expected_total(self):
        """Ground truth: the same 4-world rollout in THIS process."""
        import jax
        import jax.numpy as jnp

        from gpudrive_lab_tpu.core import step as stepmod
        from gpudrive_lab_tpu.core.types import (
            CollisionBehaviour,
            DynamicsModel,
            Params,
            RewardType,
        )
        from gpudrive_lab_tpu.scene.synthetic import synthetic_scene

        params = Params(
            dynamics_model=DynamicsModel.CLASSIC,
            collision_behaviour=CollisionBehaviour.IGNORE,
            reward_type=RewardType.DISTANCE_BASED,
            max_num_controlled_agents=0,
        )
        scene = synthetic_scene(num_worlds=4, num_agents=3, num_roads=8, seed=7)
        state = jax.jit(stepmod.reset, static_argnames="params")(
            scene, None, params
        )
        acts = jnp.zeros((4, scene.agents.valid.shape[1], 10))
        step_fn = jax.jit(stepmod.step, static_argnames="params")
        for _ in range(5):
            state = step_fn(scene, state, acts, params)
        pos = np.asarray(state.pos)
        return float(np.where(np.isfinite(pos), pos, 0.0).sum())

    def test_two_process_psum_matches_single_process(self, tmp_path):
        import socket
        import subprocess
        import sys

        # free localhost port for the coordinator
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]

        worker = os.path.join(
            os.path.dirname(__file__), "helpers", "dist_worker.py"
        )
        env = {
            k: v for k, v in os.environ.items()
            if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
        }
        procs = [
            subprocess.Popen(
                [sys.executable, worker, str(i), str(port),
                 str(tmp_path / f"out_{i}.json")],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            )
            for i in range(2)
        ]
        outs = [p.communicate(timeout=300)[0].decode() for p in procs]
        for p, o in zip(procs, outs):
            assert p.returncode == 0, f"worker failed:\n{o}"

        import json

        results = [
            json.load(open(tmp_path / f"out_{i}.json")) for i in range(2)
        ]
        # both processes saw the 2-process / 4-device world
        assert all(r["process_count"] == 2 for r in results)
        # scene-path sharding: contiguous blocks per host in device order
        assert results[0]["local_paths"] == [
            "scene_0.json", "scene_1.json", "scene_2.json", "scene_3.json"
        ]
        assert results[1]["local_paths"] == [
            "scene_4.json", "scene_5.json", "scene_6.json", "scene_7.json"
        ]
        # the cross-process all-reduce produced the same total on both
        # processes, and it equals the single-process ground truth
        assert results[0]["pos_total"] == results[1]["pos_total"]
        expected = self._expected_total()
        assert abs(results[0]["pos_total"] - expected) <= 1e-3 + 1e-6 * abs(
            expected
        ), (results[0]["pos_total"], expected)
