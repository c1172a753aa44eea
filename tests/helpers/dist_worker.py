"""Two-process jax.distributed worker (spawned by tests/test_distributed.py
TestMultiProcess): exercises gpudrive_lab_tpu.parallel.distributed across a
REAL process boundary — initialize (localhost coordinator),
shard_scene_paths, host_local_to_global assembly, a fused sim step over the
global world-sharded mesh, and a cross-process reduction (psum via jit
out_shardings).  Writes its result JSON for the parent to compare against
the single-process ground truth."""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    pid = int(sys.argv[1])
    port = sys.argv[2]
    out_path = sys.argv[3]

    from gpudrive_lab_tpu.parallel import distributed as dist

    dist.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=2,
        process_id=pid,
    )
    assert jax.process_count() == 2
    assert len(jax.local_devices()) == 2 and len(jax.devices()) == 4

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gpudrive_lab_tpu.core import step as stepmod
    from gpudrive_lab_tpu.core.types import (
        CollisionBehaviour,
        DynamicsModel,
        Params,
        RewardType,
    )
    from gpudrive_lab_tpu.scene.synthetic import synthetic_scene

    mesh = dist.global_mesh()

    # scene-path sharding: this host compiles only its devices' blocks
    all_paths = [f"scene_{i}.json" for i in range(8)]
    local_paths = dist.shard_scene_paths(all_paths, worlds_per_device=2)

    # host-local world slice (worlds 2*pid .. 2*pid+1 of the 4-world batch)
    params = Params(
        dynamics_model=DynamicsModel.CLASSIC,
        collision_behaviour=CollisionBehaviour.IGNORE,
        reward_type=RewardType.DISTANCE_BASED,
        max_num_controlled_agents=0,
    )
    full = synthetic_scene(num_worlds=4, num_agents=3, num_roads=8, seed=7)
    local = jax.tree.map(lambda x: np.asarray(x)[2 * pid: 2 * pid + 2], full)
    scene = dist.host_local_to_global(local, mesh)

    state = jax.jit(stepmod.reset, static_argnames="params")(
        scene, None, params
    )
    acts = dist.host_local_to_global(
        np.zeros((2, full.agents.valid.shape[1], 10), np.float32), mesh
    )
    step_fn = jax.jit(stepmod.step, static_argnames="params")
    for _ in range(5):
        state = step_fn(scene, state, acts, params)

    # cross-process reduction: sum of agent positions over ALL worlds,
    # replicated to every process (an XLA all-reduce over gloo)
    total = jax.jit(
        lambda s: jnp.sum(jnp.where(jnp.isfinite(s.pos), s.pos, 0.0)),
        out_shardings=NamedSharding(mesh, P()),
    )(state)
    total = float(np.asarray(total))

    with open(out_path, "w") as f:
        json.dump(
            {
                "process_id": pid,
                "process_count": jax.process_count(),
                "local_paths": local_paths,
                "pos_total": total,
            },
            f,
        )
    print(f"worker {pid} OK: pos_total={total}", flush=True)


if __name__ == "__main__":
    main()
