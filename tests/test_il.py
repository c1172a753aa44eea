"""IL stack tests: expert data generation, dataset stacking, BC net + GMM
loss training step (reference strategy: baselines/il/*)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpudrive_lab_tpu import constants as C
from gpudrive_lab_tpu.env.config import EnvConfig
from gpudrive_lab_tpu.env.env_jax import GPUDriveTPUEnv
from gpudrive_lab_tpu.il.data_generation import (
    generate_state_action_pairs,
    map_to_closest_discrete_value,
)
from gpudrive_lab_tpu.il.dataset import ExpertDataset
from gpudrive_lab_tpu.il.networks import (
    BCConfig,
    EarlyFusionAttnBCNet,
    gmm_log_prob,
    gmm_sample,
)
from gpudrive_lab_tpu.il.train import BCTrainConfig, make_bc_train_step


@pytest.fixture(scope="module")
def il_data(reference_scene_path):
    env = GPUDriveTPUEnv(
        EnvConfig(
            num_worlds=1, dynamics_model="delta_local",
            max_controlled_agents=0,
        ),
        scene_paths=[reference_scene_path],
    )
    data = generate_state_action_pairs(env)
    data["controlled_mask"] = data["valid_mask"]
    return data


def test_data_shapes(il_data):
    T = C.EPISODE_LEN
    assert il_data["obs"].shape == (T, 1, C.MAX_AGENTS, 3368)
    assert il_data["actions"].shape == (T, 1, C.MAX_AGENTS, 3)
    assert il_data["action_idx"].shape == (T, 1, C.MAX_AGENTS)
    assert il_data["action_idx"].max() < 20 * 20 * 20


def test_discretization_roundtrip():
    grid = np.linspace(-6, 6, 20).round(3)
    vals = np.array([-6.0, 0.05, 5.9, 100.0])
    snapped, idx = map_to_closest_discrete_value(vals, grid)
    assert snapped[0] == grid[0]
    assert snapped[-1] == grid[-1]
    assert abs(snapped[1] - 0.05) <= (grid[1] - grid[0]) / 2


def test_dataset_stacking(il_data):
    ds = ExpertDataset(il_data, rollout_len=5)
    assert len(ds) > 0
    b = ds.batch(np.arange(min(8, len(ds))))
    assert b["obs"].shape[1] == 5 * 3368
    assert b["actions"].shape[1:] == (1, 3)
    # the last frame of the stack equals the raw obs at (t, w, a)
    t, w, a = ds.index[0]
    np.testing.assert_array_equal(
        b["obs"][0, -3368:], il_data["obs"][t, w, a]
    )


def test_gmm_log_prob_matches_scipy():
    rng = np.random.default_rng(0)
    B, K, D = 4, 3, 2
    means = rng.normal(size=(B, K, D)).astype(np.float32)
    var = rng.uniform(0.5, 2.0, (B, K, D)).astype(np.float32)
    w = rng.dirichlet(np.ones(K), B).astype(np.float32)
    a = rng.normal(size=(B, D)).astype(np.float32)
    got = np.asarray(
        gmm_log_prob(jnp.asarray(a), jnp.asarray(means), jnp.asarray(var), jnp.asarray(w))
    )
    # manual reference
    from scipy.stats import multivariate_normal

    for b in range(B):
        p = sum(
            w[b, k] * multivariate_normal.pdf(a[b], means[b, k], np.diag(var[b, k]))
            for k in range(K)
        )
        assert abs(got[b] - np.log(p + 1e-8)) < 1e-3


def test_bc_training_reduces_loss(il_data):
    ds = ExpertDataset(il_data, rollout_len=2)
    cfg = BCTrainConfig(batch_size=32, epochs=1, rollout_len=2)
    bc_cfg = BCConfig(num_stack=2, num_fusion_layers=1, network_dim=32,
                      num_head=2)
    model = EarlyFusionAttnBCNet(bc_cfg)
    ex = ds.batch(np.arange(4))
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(ex["obs"]),
        jnp.asarray(ex["partner_mask"]), jnp.asarray(ex["road_mask"]),
    )
    tx, train_step = make_bc_train_step(model, cfg)
    opt = tx.init(variables)
    b = {k: jnp.asarray(v) for k, v in ds.batch(np.arange(32)).items()}
    first = None
    for _ in range(15):
        variables, opt, loss = train_step(variables, opt, b)
        first = first if first is not None else float(np.asarray(loss))
    last = float(np.asarray(loss))
    assert np.isfinite(last)
    assert last < first, (first, last)


def test_gmm_sample_deterministic():
    means = jnp.asarray([[[1.0, 2.0], [5.0, 6.0]]])
    var = jnp.ones((1, 2, 2))
    w = jnp.asarray([[0.9, 0.1]])
    a = gmm_sample(None, means, var, w, deterministic=True)
    np.testing.assert_allclose(np.asarray(a), [[1.0, 2.0]])
