"""Tests: vectorized flat-agent wrapper, profiling, checkpointing, and
multi-device sharding of the sim step."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gpudrive_lab_tpu.env.config import EnvConfig
from gpudrive_lab_tpu.env.dataset import SceneDataLoader
from gpudrive_lab_tpu.env.env_vec import VecGPUDriveEnv
from gpudrive_lab_tpu.utils.checkpoint import (
    load_checkpoint,
    load_metadata,
    save_checkpoint,
)
from gpudrive_lab_tpu.utils.profiling import Profile, Utilization


@pytest.fixture(scope="module")
def vec_env(example_scene_paths):
    loader = SceneDataLoader(
        root=os.path.dirname(example_scene_paths[0]),
        batch_size=2, dataset_size=4,
    )
    cfg = EnvConfig(
        num_worlds=2,
        reward_type="weighted_combination",
        collision_weight=-0.75, off_road_weight=-0.75,
        dynamics_model="classic", collision_behavior="ignore",
    )
    return VecGPUDriveEnv(cfg, loader)


def test_vec_env_flat_api(vec_env):
    obs = vec_env.reset()
    n = vec_env.num_agents
    assert obs.shape == (n, vec_env.single_observation_dim)
    rng = np.random.default_rng(0)
    for _ in range(5):
        acts = rng.integers(0, vec_env.single_action_space_n, n)
        obs, rew, term, trunc, infos = vec_env.step(acts)
    assert obs.shape[0] == n and rew.shape == (n,)
    assert term.dtype == bool


def test_vec_env_episode_stats(vec_env):
    vec_env.reset()
    rng = np.random.default_rng(0)
    stats = []
    for _ in range(95):
        acts = rng.integers(0, vec_env.single_action_space_n, vec_env.num_agents)
        _, _, _, _, infos = vec_env.step(acts)
        stats.extend(infos["episode_stats"])
        if stats:
            break
    assert stats, "no episode completed within the horizon"
    s = stats[0]
    for key in ("perc_goal_achieved", "perc_veh_collisions", "perc_off_road",
                "episode_length"):
        assert key in s
    assert 0 <= s["perc_goal_achieved"] <= 1


def test_vec_env_resample(vec_env):
    names = dict(vec_env.env.get_env_filenames())
    vec_env.resample_scenario_batch()
    assert vec_env.env.get_env_filenames() != names
    assert len(vec_env.data_coverage) >= 2
    obs = vec_env.reset()
    assert obs.shape[0] == vec_env.num_agents


def test_profile_and_utilization():
    import time

    prof = Profile()
    with prof.phase("env"):
        time.sleep(0.01)
    prof.account(100, 200)
    s = prof.summary()
    assert s["time_env_s"] >= 0.01 - 1e-3
    assert s["controlled_agent_sps"] > 0
    util = Utilization(delay=0.05)
    util.start()
    time.sleep(0.2)
    util.stop()
    assert util.summary()["cpu_util"] >= 0


def test_checkpoint_roundtrip(tmp_path):
    variables = {
        "params": {
            "w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
            "b": jnp.zeros(3),
        }
    }
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, variables, metadata={"arch": {"dim": 64}, "step": 7})
    example = jax.tree.map(jnp.zeros_like, variables)
    restored = load_checkpoint(path, {"variables": example})
    np.testing.assert_array_equal(
        np.asarray(restored["variables"]["params"]["w"]),
        np.asarray(variables["params"]["w"]),
    )
    meta = load_metadata(path)
    assert meta["arch"]["dim"] == 64


def test_sharded_sim_step_multidevice():
    """Step the sim over an 8-device world-sharded mesh (virtual CPU
    devices) — the multi-chip layout the driver dry-runs."""
    from gpudrive_lab_tpu.core import step as stepmod
    from gpudrive_lab_tpu.core.types import Params
    from gpudrive_lab_tpu.parallel.mesh import make_mesh, shard_worlds
    from gpudrive_lab_tpu.scene.synthetic import synthetic_scene

    assert jax.device_count() >= 8
    mesh = make_mesh(8)
    params = Params()
    scene = synthetic_scene(num_worlds=8, num_agents=4, num_roads=8)
    scene = shard_worlds(scene, mesh)
    state = jax.jit(stepmod.reset, static_argnames="params")(
        scene, None, params
    )
    acts = jnp.zeros((8, 128, 10))
    stepped = jax.jit(stepmod.step, static_argnames="params")(
        scene, state, acts, params
    )
    assert np.asarray(stepped.steps_remaining).max() == 90
    # outputs inherit the world sharding
    shard_devices = {s.device for s in stepped.pos.addressable_shards}
    assert len(shard_devices) == 8


def test_dashboard_renders():
    """Rich dashboard frame renders the summary + metric columns
    (reference: integrations/puffer/logging.py:50-164)."""
    from gpudrive_lab_tpu.utils.dashboard import Dashboard

    dash = Dashboard(total_timesteps=5e7, force=True)
    text = dash.render_text(
        1_234_567,
        {
            "controlled_agent_sps": 123456.0,
            "pg_loss": -0.04, "v_loss": 0.2, "entropy": 4.1,
            "approx_kl": 0.008, "perc_goal_achieved": 0.17,
            "perc_collisions": 0.001, "perc_off_road": 0.005,
            "episodes": 12.0, "mean_reward": 0.01,
            "time_learn_s": 30.0, "time_env_s": 5.0,
            "cpu_util": 55.0, "mem_util": 3.0,
        },
    )
    assert "1.23M" in text and "50.00M" in text      # steps / total
    assert "123.46K" in text                          # SPS
    assert "perc_goal_achieved" in text and "0.170" in text
    assert "eta" in text
    # update() is a no-op when not a tty and force shim is off
    Dashboard(1e6).update(1, {})
