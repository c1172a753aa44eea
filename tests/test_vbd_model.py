"""VBD model tests: shapes, diffusion schedule, denoise training signal,
sampling, rollout inverse, and the end-to-end trajectory source."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from gpudrive_lab_tpu.vbd.model import (
    DDPMScheduler,
    VBDConfig,
    VBDModel,
    denoise_loss,
    inverse_roll_out,
    roll_out,
    sample_denoiser,
)

CFG = VBDConfig(
    future_len=20, agents_len=8, action_len=5, diffusion_steps=4,
    encoder_layers=1, hidden_dim=64, num_heads=4,
)


def _batch(B=2, A=8, H=11):
    rng = np.random.default_rng(0)
    return {
        "agents_history": jnp.asarray(
            rng.normal(size=(B, A, H, 8)).astype(np.float32)
        ),
        "agents_id": jnp.asarray(
            np.where(np.arange(A)[None].repeat(B, 0) < 5,
                     np.arange(A)[None].repeat(B, 0), -1)
        ),
        "agents_interested": jnp.ones((B, A), jnp.int32),
        "polylines": jnp.asarray(
            rng.normal(size=(B, 16, 10, 5)).astype(np.float32)
        ),
        "anchors": jnp.asarray(
            rng.normal(size=(B, A, 4, 2)).astype(np.float32)
        ),
    }


@pytest.fixture(scope="module")
def model_and_vars():
    model = VBDModel(CFG)
    batch = _batch()
    x = jnp.zeros((2, 8, CFG.action_blocks, 2))
    t = jnp.zeros((2, 8), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), batch, x, t)
    return model, variables, batch


def test_forward_shapes(model_and_vars):
    model, variables, batch = model_and_vars
    x = jnp.zeros((2, 8, CFG.action_blocks, 2))
    t = jnp.zeros((2, 8), jnp.int32)
    denoised, goal_actions, goal_scores = model.apply(variables, batch, x, t)
    assert denoised.shape == (2, 8, CFG.action_blocks, 2)
    assert goal_actions.shape == (2, 8, 4, CFG.action_blocks, 2)
    assert goal_scores.shape == (2, 8, 4)


def test_scheduler_roundtrip():
    sched = DDPMScheduler(8)
    x0 = jnp.ones((2, 3, 4, 2))
    noise = jnp.zeros_like(x0)
    # t=0 keeps most signal; last step mostly noise
    x_early = sched.add_noise(x0, noise, jnp.zeros((2, 3), jnp.int32))
    x_late = sched.add_noise(x0, noise, jnp.full((2, 3), 7, jnp.int32))
    assert float(jnp.abs(x_early - x0).max()) < 0.2
    assert float(jnp.abs(x_late).max()) < float(jnp.abs(x_early).max())


def test_denoise_training_reduces_loss(model_and_vars):
    model, variables, batch = model_and_vars
    sched = DDPMScheduler(CFG.diffusion_steps)
    gt = jnp.asarray(
        np.random.default_rng(1).normal(size=(2, 8, CFG.action_blocks, 2))
        .astype(np.float32)
    )
    tx = optax.adam(1e-3)
    opt = tx.init(variables)

    @jax.jit
    def step_fn(variables, opt, rng):
        l, g = jax.value_and_grad(
            lambda v: denoise_loss(model, v, sched, batch, gt, rng, CFG)
        )(variables)
        u, opt = tx.update(g, opt)
        return optax.apply_updates(variables, u), opt, l

    first = None
    rng = jax.random.PRNGKey(2)
    for _ in range(25):
        rng, k = jax.random.split(rng)
        variables, opt, loss = step_fn(variables, opt, k)
        first = first if first is not None else float(loss)
    assert float(loss) < first


def test_sampling_and_rollout(model_and_vars):
    model, variables, batch = model_and_vars
    sched = DDPMScheduler(CFG.diffusion_steps)
    out = sample_denoiser(
        model, variables, sched, batch, jax.random.PRNGKey(3), CFG
    )
    assert out["denoised_trajs"].shape == (2, 8, CFG.future_len, 5)
    assert np.isfinite(np.asarray(out["denoised_trajs"])).all()


def test_padding_does_not_affect_valid_agents(model_and_vars):
    """Mask-polarity regression: randomizing the HISTORY of padded agents
    (agents_id == -1) must leave valid agents' denoiser outputs unchanged."""
    model, variables, batch = model_and_vars
    x = jnp.zeros((2, 8, CFG.action_blocks, 2))
    t = jnp.zeros((2, 8), jnp.int32)
    d1, _, _ = model.apply(variables, batch, x, t)

    pad = np.asarray(batch["agents_id"]) < 0  # agents 5..7
    hist = np.asarray(batch["agents_history"]).copy()
    hist[pad] = np.random.default_rng(9).normal(size=hist[pad].shape) * 50
    batch2 = dict(batch)
    batch2["agents_history"] = jnp.asarray(hist)
    d2, _, _ = model.apply(variables, batch2, x, t)

    valid = ~pad
    np.testing.assert_allclose(
        np.asarray(d1)[valid], np.asarray(d2)[valid], atol=1e-5
    )
    # sanity: outputs are not trivially constant
    assert float(np.abs(np.asarray(d1)[valid]).max()) > 0


def test_roll_out_inverse_consistency():
    rng = np.random.default_rng(0)
    cs = jnp.asarray(rng.normal(size=(2, 4, 5)).astype(np.float32))
    acts = jnp.asarray((rng.normal(size=(2, 4, 4, 2)) * 0.3).astype(np.float32))
    trajs = roll_out(cs, acts, action_len=5)
    back = inverse_roll_out(trajs, cs, action_len=5)
    np.testing.assert_allclose(np.asarray(back), np.asarray(acts), atol=1e-4)


def test_vbd_trajectory_source(reference_scene_path):
    from gpudrive_lab_tpu.env.config import EnvConfig
    from gpudrive_lab_tpu.env.env_jax import GPUDriveTPUEnv
    from gpudrive_lab_tpu.vbd.integration import VBDTrajectorySource

    env = GPUDriveTPUEnv(
        EnvConfig(num_worlds=1), scene_paths=[reference_scene_path]
    )
    model = VBDModel(CFG)
    batch = _batch(B=1, A=CFG.agents_len)
    x = jnp.zeros((1, CFG.agents_len, CFG.action_blocks, 2))
    t = jnp.zeros((1, CFG.agents_len), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), batch, x, t)
    source = VBDTrajectorySource(
        model, variables, DDPMScheduler(CFG.diffusion_steps), CFG
    )
    env.set_vbd_trajectories(source)
    trajs = np.asarray(env.vbd_trajectories)
    assert trajs.shape == (1, 128, 91, 5)
    assert np.isfinite(trajs).all()
    # denoised entries land on the sim agent slots nearest the SDC
    assert np.abs(trajs[0, 0]).sum() > 0
