"""VBD guidance tests: cost gradients steer sampling measurably."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gpudrive_lab_tpu.vbd.guidance import (
    collision_guidance,
    comfort_guidance,
    goal_guidance,
    sample_denoiser_guided,
)
from gpudrive_lab_tpu.vbd.model import DDPMScheduler, VBDConfig, VBDModel

CFG = VBDConfig(
    future_len=20, agents_len=4, action_len=5, diffusion_steps=4,
    encoder_layers=1, hidden_dim=32, num_heads=2,
)


@pytest.fixture(scope="module")
def setup():
    model = VBDModel(CFG)
    rng = np.random.default_rng(0)
    B, A, H = 1, CFG.agents_len, 11
    hist = rng.normal(size=(B, A, H, 8)).astype(np.float32) * 0.1
    hist[..., -1, 3] = 2.0  # moving +x at 2 m/s
    batch = {
        "agents_history": jnp.asarray(hist),
        "agents_id": jnp.asarray(np.arange(A)[None]),
        "agents_interested": jnp.ones((B, A), jnp.int32),
        "polylines": jnp.asarray(
            rng.normal(size=(B, 8, 10, 5)).astype(np.float32)
        ),
        "anchors": jnp.asarray(rng.normal(size=(B, A, 2, 2)).astype(np.float32)),
    }
    x = jnp.zeros((B, A, CFG.action_blocks, 2))
    t = jnp.zeros((B, A), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), batch, x, t)
    return model, variables, batch


def test_unguided_equals_empty_guidance(setup):
    model, variables, batch = setup
    sched = DDPMScheduler(CFG.diffusion_steps)
    a = sample_denoiser_guided(
        model, variables, sched, batch, jax.random.PRNGKey(1), CFG
    )
    from gpudrive_lab_tpu.vbd.model import sample_denoiser

    b = sample_denoiser(
        model, variables, sched, batch, jax.random.PRNGKey(1), CFG
    )
    np.testing.assert_allclose(
        np.asarray(a["denoised_trajs"]), np.asarray(b["denoised_trajs"]),
        atol=1e-5,
    )


def test_goal_guidance_pulls_endpoints(setup):
    model, variables, batch = setup
    sched = DDPMScheduler(CFG.diffusion_steps)
    goals = jnp.asarray(
        np.array([[[50.0, 0.0]] * CFG.agents_len], np.float32)
    )
    free = sample_denoiser_guided(
        model, variables, sched, batch, jax.random.PRNGKey(2), CFG
    )
    pulled = sample_denoiser_guided(
        model, variables, sched, batch, jax.random.PRNGKey(2), CFG,
        guidance=[goal_guidance(goals, weight=1.0)], guidance_scale=0.3,
    )
    d_free = np.linalg.norm(
        np.asarray(free["denoised_trajs"])[..., -1, 0:2] - np.asarray(goals),
        axis=-1,
    ).mean()
    d_pulled = np.linalg.norm(
        np.asarray(pulled["denoised_trajs"])[..., -1, 0:2] - np.asarray(goals),
        axis=-1,
    ).mean()
    assert d_pulled < d_free


def test_all_costs_finite(setup):
    model, variables, batch = setup
    sched = DDPMScheduler(CFG.diffusion_steps)
    goals = jnp.zeros((1, CFG.agents_len, 2))
    out = sample_denoiser_guided(
        model, variables, sched, batch, jax.random.PRNGKey(3), CFG,
        guidance=[
            goal_guidance(goals),
            collision_guidance(radius=3.0),
            comfort_guidance(),
        ],
    )
    assert np.isfinite(np.asarray(out["denoised_trajs"])).all()
