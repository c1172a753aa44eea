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


# ---------------------------------------------------------------------------
# waymo_guidance (MotionDiffuser-style, gradient through the denoiser)
# reference: sim_actor.py:192-289
# ---------------------------------------------------------------------------


def test_waymo_guidance_steers_toward_goal(setup):
    from gpudrive_lab_tpu.vbd.guidance import sample_denoiser_waymo
    from gpudrive_lab_tpu.vbd.guidance_metrics import goal_reward
    from gpudrive_lab_tpu.vbd.model import sample_denoiser

    model, variables, batch = setup
    sched = DDPMScheduler(CFG.diffusion_steps)
    goals = jnp.asarray(
        np.array([[[50.0, 0.0]] * CFG.agents_len], np.float32)
    )
    free = sample_denoiser(
        model, variables, sched, batch, jax.random.PRNGKey(7), CFG
    )
    guided = sample_denoiser_waymo(
        model, variables, sched, batch, jax.random.PRNGKey(7), CFG,
        rewards=[goal_reward(goals)], gradient_scale=2.0, guidance_iter=3,
    )
    assert np.isfinite(np.asarray(guided["denoised_trajs"])).all()
    d_free = np.linalg.norm(
        np.asarray(free["denoised_trajs"])[..., -1, 0:2] - np.asarray(goals),
        axis=-1,
    ).mean()
    d_guided = np.linalg.norm(
        np.asarray(guided["denoised_trajs"])[..., -1, 0:2]
        - np.asarray(goals),
        axis=-1,
    ).mean()
    assert d_guided < d_free
    # ascent: within guided steps the reward improves on average over the
    # guidance iterations
    hist = np.asarray(guided["reward_history"])  # [n_steps, guidance_iter]
    assert hist.shape == (CFG.diffusion_steps - 1, 3)
    assert np.isfinite(hist).all()
    assert (hist[:, -1] - hist[:, 0]).mean() > 0


def test_waymo_guidance_no_rewards_matches_unguided(setup):
    from gpudrive_lab_tpu.vbd.guidance import sample_denoiser_waymo
    from gpudrive_lab_tpu.vbd.model import sample_denoiser

    model, variables, batch = setup
    sched = DDPMScheduler(CFG.diffusion_steps)
    a = sample_denoiser_waymo(
        model, variables, sched, batch, jax.random.PRNGKey(11), CFG
    )
    b = sample_denoiser(
        model, variables, sched, batch, jax.random.PRNGKey(11), CFG
    )
    np.testing.assert_allclose(
        np.asarray(a["denoised_trajs"]), np.asarray(b["denoised_trajs"]),
        atol=1e-5,
    )


# ---------------------------------------------------------------------------
# ibr_guidance (iterative best response: adversary pursues, ego evades)
# reference: sim_actor.py:290-517
# ---------------------------------------------------------------------------


def _adversarial_batch():
    """Ego at the origin crawling +x, adversary 12 m to the left, two
    bystanders far away; one straight road edge below everything."""
    B, A, H = 1, CFG.agents_len, 11
    hist = np.zeros((B, A, H, 8), np.float32)
    xy = [(0.0, 0.0), (0.0, 12.0), (40.0, 40.0), (-40.0, 40.0)]
    for a, (x, y) in enumerate(xy):
        hist[0, a, :, 0] = x
        hist[0, a, :, 1] = y
    hist[..., -1, 3] = 1.0  # vx
    hist[..., -1, 5] = 4.0  # length
    hist[..., -1, 6] = 2.0  # width
    poly = np.zeros((B, 8, 10, 5), np.float32)
    poly[0, 0, :, 0] = np.linspace(-60, 60, 10)
    poly[0, 0, :, 1] = -30.0
    poly[0, 0, :, 4] = 1.0  # ET_ROAD_EDGE
    return {
        "agents_history": jnp.asarray(hist),
        "agents_id": jnp.asarray(np.arange(A)[None]),
        "agents_interested": jnp.ones((B, A), jnp.int32),
        "polylines": jnp.asarray(poly),
        "anchors": jnp.zeros((B, A, 2, 2), jnp.float32),
    }


def _min_pair_dist(trajs, i, j):
    p = np.asarray(trajs)[0, :, :, 0:2]
    return float(np.linalg.norm(p[i] - p[j], axis=-1).min())


def test_ibr_adversary_pursues_ego(setup):
    from gpudrive_lab_tpu.vbd.guidance import sample_denoiser_ibr
    from gpudrive_lab_tpu.vbd.model import sample_denoiser

    model, variables, _ = setup
    batch = _adversarial_batch()
    sched = DDPMScheduler(CFG.diffusion_steps)
    free = sample_denoiser(
        model, variables, sched, batch, jax.random.PRNGKey(13), CFG
    )
    # adversary-only rounds (ego_iter=0), direct-rollout gradients
    guided = sample_denoiser_ibr(
        model, variables, sched, batch, jax.random.PRNGKey(13), CFG,
        ego_idx=0, adv_idx=1, ego_iter=0, adv_iter=4,
        adv_use_ctg=True, gradient_scale=5.0, guidance_iter=2,
        t_react=CFG.action_blocks, overlap_clip=50.0,
    )
    assert np.isfinite(np.asarray(guided["denoised_trajs"])).all()
    d_free = _min_pair_dist(free["denoised_trajs"], 1, 0)
    d_guided = _min_pair_dist(guided["denoised_trajs"], 1, 0)
    assert d_guided < d_free
    hist = np.asarray(guided["pursue_history"])
    assert hist.size > 0 and np.isfinite(hist).all()
    # pursuit reward improves over the alternation on average
    n = 4 * 2  # adv_iter * guidance_iter per guided diffusion step
    per_step = hist.reshape(-1, n)
    assert (per_step[:, -1] - per_step[:, 0]).mean() > 0


def test_ibr_full_alternation_runs(setup):
    from gpudrive_lab_tpu.vbd.guidance import sample_denoiser_ibr
    from gpudrive_lab_tpu.vbd.model import sample_denoiser

    model, variables, _ = setup
    batch = _adversarial_batch()
    sched = DDPMScheduler(CFG.diffusion_steps)
    free = sample_denoiser(
        model, variables, sched, batch, jax.random.PRNGKey(17), CFG
    )
    guided = sample_denoiser_ibr(
        model, variables, sched, batch, jax.random.PRNGKey(17), CFG,
        ego_idx=0, adv_idx=1, other_idx=[2, 3], ego_iter=2, adv_iter=2,
        adv_use_ctg=True, ego_use_ctg=True, gradient_scale=1.0,
        guidance_iter=2, t_react=2, overlap_clip=20.0,
    )
    # ^ clip=20 keeps the 12 m ego-adv pair inside the active band (the
    # default 5 m clip zeroes every reward gradient at this separation)
    trajs = np.asarray(guided["denoised_trajs"])
    assert np.isfinite(trajs).all()
    # guidance changed the sample
    assert not np.allclose(trajs, np.asarray(free["denoised_trajs"]))
    assert np.asarray(guided["pursue_history"]).size > 0
    assert np.asarray(guided["evasion_history"]).size > 0
    assert np.isfinite(np.asarray(guided["evasion_history"])).all()


def test_guidance_mode_registry():
    from gpudrive_lab_tpu.vbd.guidance import (
        GUIDANCE_MODES,
        sample_denoiser_guided,
        sample_denoiser_ibr,
        sample_denoiser_waymo,
    )

    assert GUIDANCE_MODES["ctg"] is sample_denoiser_guided
    assert GUIDANCE_MODES["waymo"] is sample_denoiser_waymo
    assert GUIDANCE_MODES["ibr"] is sample_denoiser_ibr
