"""Tests for datatype views, the visualizer, sim-agent actors, and
multi-policy rollouts."""

import numpy as np
import jax.numpy as jnp
import pytest

from gpudrive_lab_tpu import constants as C
from gpudrive_lab_tpu.agents import PolicyActor, RandomActor, merge_actions
from gpudrive_lab_tpu.core import observations as obsmod
from gpudrive_lab_tpu.core import step as stepmod
from gpudrive_lab_tpu.core.types import Params
from gpudrive_lab_tpu.datatypes.info import Info, Metadata, ResponseType
from gpudrive_lab_tpu.datatypes.observation import (
    GlobalEgoState,
    LocalEgoState,
    PartnerObs,
)
from gpudrive_lab_tpu.datatypes.roadgraph import LocalRoadGraphPoints
from gpudrive_lab_tpu.datatypes.trajectory import LogTrajectory
from gpudrive_lab_tpu.env.config import EnvConfig
from gpudrive_lab_tpu.env.env_jax import GPUDriveTPUEnv
from gpudrive_lab_tpu.scene.synthetic import synthetic_scene
from gpudrive_lab_tpu.utils.multi_policy_rollout import multi_policy_rollout

import jax

PARAMS = Params()


@pytest.fixture(scope="module")
def scene_state():
    scene = synthetic_scene(num_worlds=2, num_agents=4, num_roads=8)
    state = jax.jit(stepmod.reset, static_argnames="params")(
        scene, None, PARAMS
    )
    return scene, state


def test_local_ego_view_roundtrip(scene_state):
    scene, state = scene_state
    so = obsmod.self_observation(scene, state)
    v = LocalEgoState.from_array(np.asarray(so))
    assert v.shape == (2, C.MAX_AGENTS)
    np.testing.assert_allclose(
        np.asarray(v.vehicle_length)[0, :4],
        np.asarray(scene.agents.size)[0, :4, 0] * C.VEHICLE_LENGTH_SCALE,
    )
    v.normalize()
    assert np.abs(np.asarray(v.rel_goal_x)).max() <= 1.0


def test_global_ego_restore_mean(scene_state):
    scene, state = scene_state
    ao = obsmod.absolute_self_observation(scene, state)
    v = GlobalEgoState.from_array(np.asarray(ao))
    x_before = np.asarray(v.pos_x).copy()
    v.restore_mean(jnp.asarray([10.0, 20.0]), jnp.asarray([1.0, 2.0]))
    np.testing.assert_allclose(
        np.asarray(v.pos_x)[0], x_before[0] + 10.0, atol=1e-5
    )


def test_partner_and_roadgraph_views(scene_state):
    scene, state = scene_state
    po = obsmod.partner_observations(scene, state, PARAMS)
    v = PartnerObs.from_array(np.asarray(po))
    v.normalize()
    v.one_hot_encode_agent_types()
    assert np.asarray(v.agent_type).shape[-1] == 4
    mo = obsmod.agent_map_observations(scene, state, PARAMS)
    rg = LocalRoadGraphPoints.from_array(np.asarray(mo))
    rg.one_hot_encode_road_point_types()
    rg.normalize()
    assert np.asarray(rg.type).shape[-1] == 7


def test_log_trajectory_pack_roundtrip(scene_state):
    scene, _ = scene_state
    traj = LogTrajectory.from_scene(scene)
    blob = np.asarray(traj.pack())
    assert blob.shape == (2, C.MAX_AGENTS, C.TRAJECTORY_EXPORT_SIZE)
    back = LogTrajectory.from_blob(jnp.asarray(blob), 2, C.MAX_AGENTS)
    np.testing.assert_array_equal(
        np.asarray(back.pos_xy), np.asarray(traj.pos_xy)
    )


def test_info_metadata_response_views(scene_state):
    scene, state = scene_state
    info = Info.from_state(scene, state)
    assert np.asarray(info.collided).shape == (2, C.MAX_AGENTS)
    md = Metadata.from_scene(scene)
    assert np.asarray(md.is_sdc).shape == (2, C.MAX_AGENTS)
    rt = ResponseType.from_scene(scene)
    assert not (np.asarray(rt.static) & np.asarray(rt.moving)).any()


def test_visualizer_renders(example_scene_paths):
    env = GPUDriveTPUEnv(
        EnvConfig(num_worlds=1), scene_paths=example_scene_paths[:1]
    )
    env.reset()
    img = env.render(0, zoom_radius=80)
    assert img.ndim == 3 and img.shape[2] == 3
    assert img.std() > 0  # not a blank canvas
    fig = env.vis.plot_agent_observation(env.state, 0, 0)
    assert fig is not None


def test_merge_actions():
    ref = np.zeros((2, 4))
    merged = merge_actions(
        {"a": [5, 6], "b": [7]},
        {"a": np.array([0, 3]), "b": np.array([6])},
        ref,
    )
    assert merged[0, 0] == 5 and merged[0, 3] == 6 and merged[1, 2] == 7


def test_multi_policy_rollout(example_scene_paths):
    env = GPUDriveTPUEnv(
        EnvConfig(num_worlds=1, max_controlled_agents=4),
        scene_paths=example_scene_paths[:1],
    )
    ctrl = np.asarray(env.cont_agent_mask)
    ids = np.nonzero(ctrl.reshape(-1))[0]
    half = len(ids) // 2
    m1 = np.zeros_like(ctrl.reshape(-1), bool)
    m1[ids[:half]] = True
    m2 = np.zeros_like(m1)
    m2[ids[half:]] = True
    policies = {
        "rand1": RandomActor(None, env.action_space_n, seed=1),
        "rand2": RandomActor(None, env.action_space_n, seed=2),
    }
    masks = {"rand1": m1.reshape(ctrl.shape), "rand2": m2.reshape(ctrl.shape)}
    metrics = multi_policy_rollout(env, policies, masks, max_steps=10)
    assert set(metrics) == {"rand1", "rand2"}
    for v in metrics.values():
        assert set(v) == {"goal_achieved", "collided", "off_road"}
    # render_sim_state without a visualizer must raise, not collect Nones
    import pytest as _pytest
    if not hasattr(env, "vis"):
        with _pytest.raises(ValueError):
            multi_policy_rollout(env, policies, masks, max_steps=1,
                                 render_sim_state=True)


def test_policy_actor_selects(example_scene_paths):
    env = GPUDriveTPUEnv(
        EnvConfig(num_worlds=1), scene_paths=example_scene_paths[:1]
    )
    obs = env.reset()
    from gpudrive_lab_tpu.networks.late_fusion import PolicyConfig

    actor = PolicyActor(
        None,
        variables=None if False else _init_vars(env),
        policy_config=PolicyConfig(action_dim=env.action_space_n or 91),
    )
    acts = actor.select_action(np.asarray(obs)[0, :8])
    assert np.asarray(acts).shape == (8,)


def _init_vars(env):
    import jax

    from gpudrive_lab_tpu.networks.late_fusion import (
        LateFusionPolicy,
        PolicyConfig,
    )

    cfg = PolicyConfig(action_dim=env.action_space_n or 91)
    policy = LateFusionPolicy(cfg)
    return policy.init(
        jax.random.PRNGKey(0), jnp.zeros((1, cfg.obs_dim))
    )


def test_render_training_videos(example_scene_paths, tmp_path):
    """Checkpoint-adjacent rollout videos with the current policy — the
    ppo/train.py --video-interval hook (reference: env_puffer.py:405-483)."""
    import jax

    from gpudrive_lab_tpu.networks.late_fusion import (
        LateFusionPolicy,
        PolicyConfig,
    )
    from gpudrive_lab_tpu.visualize.video import render_training_videos

    env = GPUDriveTPUEnv(
        EnvConfig(num_worlds=1), scene_paths=example_scene_paths[:1]
    )
    pc = PolicyConfig(action_dim=env.action_space_n)
    policy = LateFusionPolicy(pc)
    variables = policy.init(
        jax.random.PRNGKey(0), np.zeros((1, pc.obs_dim), np.float32)
    )
    paths = render_training_videos(
        env, policy, variables, tmp_path, global_step=123, max_steps=3
    )
    assert len(paths) == 1
    assert paths[0].endswith("world0_step123.gif")
    import os

    assert os.path.getsize(paths[0]) > 0


def test_policy_accepts_presplit_obs():
    """LateFusionPolicy((ego, partner, road)) must equal the flat form
    bitwise — same modules in the same order, so parameters are shared."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gpudrive_lab_tpu.networks.late_fusion import (
        LateFusionPolicy,
        PolicyConfig,
    )

    cfg = PolicyConfig(action_dim=7)
    policy = LateFusionPolicy(cfg)
    obs = jax.random.normal(jax.random.PRNGKey(0), (5, cfg.obs_dim))
    variables = policy.init(jax.random.PRNGKey(1), obs)
    e = cfg.ego_feat_dim
    p = (cfg.max_agents - 1) * 6
    parts = (
        obs[..., :e],
        obs[..., e:e + p].reshape(5, cfg.max_agents - 1, 6),
        obs[..., e + p:].reshape(5, cfg.top_k_roads, 13),
    )
    lo_f, v_f = policy.apply(variables, obs)
    lo_t, v_t = policy.apply(variables, parts)
    np.testing.assert_array_equal(np.asarray(lo_f), np.asarray(lo_t))
    np.testing.assert_array_equal(np.asarray(v_f), np.asarray(v_t))
