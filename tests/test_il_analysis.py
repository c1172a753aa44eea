"""IL analysis suite: closed-loop rollout metrics, importance-weight
collection, token probes + intervention, and the overlay plots
(reference: baselines/il/test/{simulation,importance_weight,intervention}.py)."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpudrive_lab_tpu.env.config import EnvConfig
from gpudrive_lab_tpu.env.dataset import SceneDataLoader
from gpudrive_lab_tpu.env.env_jax import GPUDriveTPUEnv
from gpudrive_lab_tpu.il import analysis
from gpudrive_lab_tpu.il.data_generation import generate_state_action_pairs
from gpudrive_lab_tpu.il.dataset import ExpertDataset
from gpudrive_lab_tpu.il.linear_probing import ProbeConfig
from gpudrive_lab_tpu.il.networks import BCConfig, EarlyFusionAttnBCNet


@pytest.fixture(scope="module")
def setup(example_scene_paths):
    loader = SceneDataLoader(
        root=os.path.dirname(example_scene_paths[0]), batch_size=2,
        dataset_size=4,
    )
    cfg = EnvConfig(
        num_worlds=2, dynamics_model="delta_local",
        collision_behavior="ignore", max_controlled_agents=0,
    )
    env = GPUDriveTPUEnv(cfg, data_loader=loader)
    data = generate_state_action_pairs(env)
    data["controlled_mask"] = data["valid_mask"]
    ds = ExpertDataset(data, rollout_len=3)

    bc_cfg = BCConfig(num_stack=3, network_dim=32, num_head=2)
    model = EarlyFusionAttnBCNet(bc_cfg)
    ex = ds.batch(np.arange(2))
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(ex["obs"]),
        jnp.asarray(ex["partner_mask"]), jnp.asarray(ex["road_mask"]),
    )
    eval_env = GPUDriveTPUEnv(
        dataclasses.replace(cfg, max_controlled_agents=128),
        scene_paths=env.scene_paths,
    )
    return eval_env, model, variables, bc_cfg, ds


@pytest.fixture(scope="module")
def rollout(setup):
    eval_env, model, variables, bc_cfg, _ = setup
    return analysis.closed_loop_rollout(
        eval_env, model, variables, bc_cfg, max_steps=6,
        collect_importance=True, collect_tokens=True, collect_states=True,
    )


def test_grid_round_trip():
    centers = analysis.cell_centers_ego_frame()
    assert centers.shape == (analysis.grid_cells(), 2)
    # every cell center maps back to its own cell index
    np.testing.assert_array_equal(
        analysis.position_to_cell(centers), np.arange(analysis.grid_cells())
    )


def test_expert_done_steps(setup):
    eval_env = setup[0]
    done = analysis.expert_done_steps(eval_env.scene)
    W, A = np.asarray(eval_env.scene.agents.valid).shape
    assert done.shape == (W, A)
    assert (done >= 1).all() and (done <= 91).all()


def test_closed_loop_metrics_finite(rollout):
    m = rollout.metrics
    for key in ("goal_rate", "collision_rate", "off_road_rate",
                "goal_progress", "goal_time_ratio"):
        assert np.isfinite(m[key]), key
    assert 0.0 <= m["goal_rate"] <= 1.0
    assert 0.0 <= m["goal_progress"] <= 1.0


def test_importance_weights_are_attention(rollout, setup):
    eval_env, _, _, bc_cfg, _ = setup
    imp = rollout.importance
    T, W, H, P = imp.shape
    assert W == 2 and H == bc_cfg.num_head and P == bc_cfg.ro_max
    # softmax over partner keys: each head's weights sum to 1
    np.testing.assert_allclose(imp.sum(-1), 1.0, atol=1e-4)


def test_token_collection_shapes(rollout, setup):
    _, _, _, bc_cfg, _ = setup
    assert rollout.ego_tokens.shape[-1] == bc_cfg.network_dim
    assert rollout.ro_tokens.shape[-2:] == (bc_cfg.ro_max, bc_cfg.network_dim)
    assert rollout.positions.shape[:2] == rollout.ego_tokens.shape[:2]


def test_probes_and_intervention(setup):
    _, model, variables, _, ds = setup
    tokens = analysis.extract_token_dataset(model, variables, ds)
    assert tokens["ego"].shape[0] == len(ds)
    labels = analysis.probe_labels_from_positions(ds, future_step=5)
    assert labels["ego"].shape == (len(ds),)
    assert labels["partner"].shape == tokens["ro"].shape[:2]
    assert (labels["ego"] < analysis.grid_cells()).all()

    t, w, a = ds.index.T
    partner_valid = ds.data["partner_mask"][t, w, a] == 0
    ego_probe, other_probe, metrics = analysis.train_position_probes(
        tokens, labels, partner_valid,
        ProbeConfig(epochs=1, batch_size=32),
    )
    assert 0.0 <= metrics["ego"]["accuracy"] <= 1.0

    iv = analysis.intervention_effect(
        ego_probe, other_probe, tokens["ego"][:8], intervention_label=10
    )
    assert iv["ego_pred"].shape == (8,)
    assert (iv["ego_pred_prime"] < analysis.grid_cells()).all()

    cells = analysis.predict_partner_cells(other_probe, tokens["ro"][:4])
    assert cells.shape == tokens["ro"][:4].shape[:2]


def test_overlay_plots(rollout, setup):
    eval_env = setup[0]
    ctrl = np.asarray(eval_env.cont_agent_mask)
    ego = int(np.argmax(ctrl[0]))
    imgs = eval_env.vis.plot_importance_weight(
        eval_env.state, 0, rollout.importance[-1, 0], ego, zoom_radius=50.0
    )
    assert len(imgs) == rollout.importance.shape[2]
    assert imgs[0].ndim == 3

    img = eval_env.vis.plot_linear_probing(
        eval_env.state, 0, ego,
        ego_pred=[3, 4, 5], ego_pred_prime=[3, 3, 3], partner_pred=[10, 11, 12],
        partner_log_cells=[10, 10, 11],
    )
    assert img.ndim == 3

    img = eval_env.vis.plot_log_replay_comparison(rollout.positions, 0)
    assert img.ndim == 3
