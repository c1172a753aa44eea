"""Linear probing tests: probes train on frozen BC features and beat chance
on separable synthetic labels."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gpudrive_lab_tpu.il.linear_probing import (
    LinearProbe,
    ProbeConfig,
    position_grid_labels,
    probe_action_and_position,
)


def test_position_grid_labels():
    rel = np.array([[0.0, 0.0], [-4.9, -4.9], [4.9, 4.9], [4.9, -4.9]])
    labels = position_grid_labels(rel, cells=9, extent=10.0)
    assert labels[0] == 4  # center cell of the 3x3 grid
    assert labels[1] == 0
    assert labels[2] == 8
    assert labels[3] == 2


def test_probe_learns_separable_labels():
    rng = np.random.default_rng(0)
    n, d = 512, 16
    ctx = rng.normal(size=(n, d)).astype(np.float32)
    labels = (ctx[:, 0] > 0).astype(np.int64)  # linearly separable
    probe = LinearProbe(d, 2, ProbeConfig(epochs=100, batch_size=64, lr=1e-2))
    out = probe.fit(ctx, labels, rng)
    assert out["accuracy"] > 0.95


def test_probe_chance_on_random_labels():
    rng = np.random.default_rng(0)
    ctx = rng.normal(size=(256, 8)).astype(np.float32)
    labels = rng.integers(0, 4, 256)
    probe = LinearProbe(8, 4, ProbeConfig(epochs=2, batch_size=64))
    out = probe.fit(ctx, labels, rng)
    assert out["accuracy"] < 0.8  # cannot memorize much through a linear head


def test_end_to_end_probing(reference_scene_path):
    from gpudrive_lab_tpu.env.config import EnvConfig
    from gpudrive_lab_tpu.env.env_jax import GPUDriveTPUEnv
    from gpudrive_lab_tpu.il.data_generation import generate_state_action_pairs
    from gpudrive_lab_tpu.il.dataset import ExpertDataset
    from gpudrive_lab_tpu.il.networks import BCConfig, EarlyFusionAttnBCNet

    env = GPUDriveTPUEnv(
        EnvConfig(num_worlds=1, dynamics_model="delta_local",
                  max_controlled_agents=0),
        scene_paths=[reference_scene_path],
    )
    data = generate_state_action_pairs(env)
    data["controlled_mask"] = data["valid_mask"]
    ds = ExpertDataset(data, rollout_len=2)
    cfg = BCConfig(num_stack=2, network_dim=32, num_head=2,
                   num_fusion_layers=1)
    model = EarlyFusionAttnBCNet(cfg)
    ex = ds.batch(np.arange(2))
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(ex["obs"]),
        jnp.asarray(ex["partner_mask"]), jnp.asarray(ex["road_mask"]),
    )
    results = probe_action_and_position(
        model, variables, ds, data["action_idx"],
        ProbeConfig(epochs=1, batch_size=32),
    )
    assert "future_action" in results and "future_position" in results
    for r in results.values():
        assert np.isfinite(r["loss"]) and 0.0 <= r["accuracy"] <= 1.0
