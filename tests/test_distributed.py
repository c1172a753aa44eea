"""Multi-host scaffolding semantics on the 8-virtual-device CPU mesh:
per-host scene-path blocks, world->device placement of assembled arrays, and
sharded-scene placement (parallel/distributed.py, parallel/mesh.py)."""

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
