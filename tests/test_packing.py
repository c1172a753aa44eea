"""Dtype-grouped pytree packing: exact round-trips and packed-vs-normal
train-step equivalence (utils/packing.py, ppo/train.py PackedTrainer)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpudrive_lab_tpu.env.config import EnvConfig
from gpudrive_lab_tpu.env.dataset import SceneDataLoader
from gpudrive_lab_tpu.env.env_jax import GPUDriveTPUEnv
from gpudrive_lab_tpu.ppo.ppo import PPOConfig
from gpudrive_lab_tpu.ppo.train import build_trainer
from gpudrive_lab_tpu.utils.packing import make_packer


def test_pack_roundtrip_mixed_dtypes():
    """Every leaf must come back bit-exact — including uint32 PRNG keys and
    int32 ids above 2^24, which a single-buffer float32 pack would corrupt."""
    tree = {
        "f32": jnp.arange(6, dtype=jnp.float32).reshape(2, 3) * 1.5,
        "nested": {
            "i32": jnp.asarray([[17_000_001, -5], [2**30, 0]], jnp.int32),
            "u32": jax.random.PRNGKey(123),  # uint32, high bits set
        },
        "bool": jnp.asarray([True, False, True]),
        "scalar": jnp.float32(3.25),
        "bf16": jnp.asarray([1.0, 2.0], jnp.bfloat16),
    }
    pack, unpack = make_packer(tree)
    packed = pack(tree)
    # one buffer per dtype actually present
    assert sorted(packed) == sorted(
        {str(jnp.asarray(l).dtype) for l in jax.tree.leaves(tree)}
    )
    out = unpack(packed)
    for a, b in zip(jax.tree.leaves(tree), jax.tree.leaves(out)):
        assert a.dtype == b.dtype and a.shape == b.shape
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pack_roundtrip_under_jit():
    tree = (jnp.arange(4, dtype=jnp.int32), jnp.ones((2, 2), jnp.float32))
    pack, unpack = make_packer(tree)
    out = jax.jit(lambda t: unpack(pack(t)))(tree)
    for a, b in zip(jax.tree.leaves(tree), jax.tree.leaves(out)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.fixture(scope="module")
def env(example_scene_paths):
    cfg = EnvConfig(
        num_worlds=2,
        reward_type="weighted_combination",
        collision_weight=-0.75,
        off_road_weight=-0.75,
        dynamics_model="classic",
        collision_behavior="ignore",
    )
    loader = SceneDataLoader(
        root=os.path.dirname(example_scene_paths[0]),
        batch_size=2, dataset_size=4,
    )
    return GPUDriveTPUEnv(cfg, data_loader=loader)


def test_packed_trainer_matches_unpacked(env):
    """Two train iterations through the PackedTrainer must produce the same
    params and metrics as the ordinary pytree-argument train_fn."""
    cfg = PPOConfig(rollout_len=8, num_minibatches=2)

    _, variables, opt_state, carry, fresh, train_fn = build_trainer(
        env, cfg, seed=7,
    )
    for _ in range(2):
        variables, opt_state, carry, metrics = train_fn(
            env.scene, variables, opt_state, carry, fresh,
            env.reward_weights,
        )

    _, _, _, _, _, packed = build_trainer(
        env, cfg, seed=7, packed_io=True,
    )
    for _ in range(2):
        fetched = packed.step(env.reward_weights)

    for k in metrics:
        np.testing.assert_allclose(
            float(np.asarray(metrics[k])), float(fetched[k]),
            atol=1e-5, rtol=1e-5, err_msg=k,
        )
    pv, _, pc = packed.unpack_state()
    for a, b in zip(jax.tree.leaves(variables), jax.tree.leaves(pv)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5
        )
    # env carry advanced identically (same rng chain, same auto-resets)
    np.testing.assert_array_equal(
        np.asarray(carry.world_time_steps),
        np.asarray(pc.world_time_steps),
    )


def test_packed_trainer_set_env_reshape(env, example_scene_paths):
    """set_env with a grown road bucket must rebuild the packer (stale
    static offsets would misalign every leaf after the resized one) and
    keep matching the ordinary pytree-argument train_fn step-for-step."""
    import os as _os

    from gpudrive_lab_tpu.ppo.train import EnvCarry, make_fresh

    cfg = PPOConfig(rollout_len=4, num_minibatches=2)
    _, _, _, _, _, packed = build_trainer(env, cfg, seed=11, packed_io=True)
    packed.step(env.reward_weights)

    # same scenes compiled into a larger road bucket -> different leaf shapes
    env2 = GPUDriveTPUEnv(
        env.config,
        data_loader=SceneDataLoader(
            root=_os.path.dirname(example_scene_paths[0]),
            batch_size=2, dataset_size=4,
        ),
        max_roads=env.scene.max_roads + 256,
    )
    assert env2.scene.max_roads != env.scene.max_roads
    fresh2 = make_fresh(env2)
    variables, opt_state, old_carry = packed.unpack_state()
    carry2 = EnvCarry(
        state=jax.tree.map(jnp.copy, fresh2),
        world_time_steps=jnp.zeros(env2.num_worlds, jnp.int32),
        rng=old_carry.rng,
    )
    packed.set_env(env2.scene, fresh2, carry2)
    fetched = packed.step(env2.reward_weights)

    _, _, _, _, _, train_fn = build_trainer(env2, cfg, seed=11)
    _, _, _, metrics = train_fn(
        env2.scene, variables, opt_state, carry2, fresh2,
        env2.reward_weights,
    )
    for k in metrics:
        np.testing.assert_allclose(
            float(np.asarray(metrics[k])), float(fetched[k]),
            atol=1e-5, rtol=1e-5, err_msg=k,
        )


def test_packed_trainer_checkpoint_paths(env):
    """set_state after unpack_state must be a fixed point, and replace_carry
    must only touch the requested field."""
    cfg = PPOConfig(rollout_len=4, num_minibatches=2)
    _, _, _, _, _, packed = build_trainer(env, cfg, seed=3, packed_io=True)
    packed.step(env.reward_weights)
    v1, o1, c1 = packed.unpack_state()
    packed.set_state(v1, o1, c1)
    v2, _, c2 = packed.unpack_state()
    for a, b in zip(jax.tree.leaves(v1), jax.tree.leaves(v2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    key = jax.random.PRNGKey(99)
    packed.replace_carry(rng=key)
    _, _, c3 = packed.unpack_state()
    np.testing.assert_array_equal(np.asarray(c3.rng), np.asarray(key))
    np.testing.assert_array_equal(
        np.asarray(c3.world_time_steps), np.asarray(c1.world_time_steps)
    )
