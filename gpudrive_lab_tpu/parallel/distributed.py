"""Multi-host distributed runtime.

New capability versus the reference (which has no distributed anything,
SURVEY.md §2.3): scale world-parallel simulation + learning across a TPU pod
slice.  The design keeps scene bytes off the network — each host compiles and
feeds only the worlds backing its local devices; only learner gradients cross
ICI/DCN (via jit's automatic psum for replicated params over sharded
batches).

Usage on each host::

    from gpudrive_lab_tpu.parallel import distributed as dist
    dist.initialize()                 # jax.distributed bootstrap
    mesh = dist.global_mesh()         # 1-D 'world' mesh over all devices
    paths = dist.shard_scene_paths(all_paths, worlds_per_device=64)
    scene = build_scene(paths, params)            # host-local compile
    scene = dist.host_local_to_global(scene, mesh)  # global sharded arrays
"""

from __future__ import annotations

import os
from typing import List, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gpudrive_lab_tpu.parallel.mesh import WORLD_AXIS


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """jax.distributed.initialize with env-var fallbacks; no-op when running
    single-process."""
    if num_processes is None:
        num_processes = int(os.environ.get("GPUDRIVE_TPU_NUM_PROCESSES", "1"))
    if num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh() -> Mesh:
    return Mesh(np.asarray(jax.devices()), (WORLD_AXIS,))


def shard_scene_paths(
    all_paths: List[str], worlds_per_device: int
) -> List[str]:
    """The scene paths THIS host must compile: contiguous blocks of
    worlds_per_device scenes per local device, ordered by global device
    index so concatenation over hosts matches the mesh order."""
    per_host = []
    local = {d.id for d in jax.local_devices()}
    for i, d in enumerate(jax.devices()):
        if d.id in local:
            start = i * worlds_per_device
            per_host.extend(
                all_paths[(start + j) % len(all_paths)]
                for j in range(worlds_per_device)
            )
    return per_host


def host_local_to_global(tree, mesh: Mesh):
    """Assemble per-host [W_local, ...] arrays into globally-sharded
    [W_global, ...] arrays on the world axis
    (jax.make_array_from_process_local_data)."""
    sharding = NamedSharding(mesh, P(WORLD_AXIS))

    def assemble(x):
        x = np.asarray(x)
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        return jax.make_array_from_process_local_data(
            sharding, x, global_shape
        )

    return jax.tree.map(assemble, tree)


def scaling_efficiency(per_device_sps: float, single_device_sps: float) -> float:
    """env-steps/s scaling efficiency metric (BASELINE.json north star)."""
    return per_device_sps / max(single_device_sps, 1e-9)
