"""Device-mesh sharding for world-parallel simulation + training.

The reference scales only within one GPU (SURVEY.md §2.3: no NCCL/MPI
anywhere); multi-device scaling is new capability in this framework.  Worlds
are the data-parallel axis: every ``Scene``/``SimState``/rollout array leads
with [W, ...], so sharding them over a 1-D mesh ("world") data-parallelizes
the simulator, and replicating policy/optimizer params makes the learner's
gradient all-reduce ride ICI automatically under jit's partitioner.

Multi-host: build the mesh over ``jax.devices()`` after
``jax.distributed.initialize()``; each host feeds its addressable shard of
worlds (scene compilation is host-local, so scene bytes never cross DCN —
only gradients do).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

WORLD_AXIS = "world"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        assert len(devices) >= n_devices, (
            f"need {n_devices} devices, have {len(devices)}"
        )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (WORLD_AXIS,))


def world_sharding(mesh: Mesh) -> NamedSharding:
    """Shard leading (world) dim; everything else replicated per shard."""
    return NamedSharding(mesh, P(WORLD_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_worlds(tree, mesh: Mesh):
    """Place a pytree of [W, ...] arrays with the world dim sharded."""
    s = world_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def replicate(tree, mesh: Mesh):
    r = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, r), tree)
