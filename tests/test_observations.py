"""Observation collector tests: KNN correctness vs brute force, radius
filtering, partner-slot padding semantics (id -1 vs -2), and export layouts
(reference systems: src/sim.cpp:168-280; export ABI: SURVEY.md Appendix B)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpudrive_lab_tpu import constants as C
from gpudrive_lab_tpu.core import observations as obs
from gpudrive_lab_tpu.core import step as stepmod
from gpudrive_lab_tpu.core.types import (
    DynamicsModel,
    Params,
    RewardType,
    RoadObsAlgorithm,
)
from gpudrive_lab_tpu.scene.compiler import build_scene

PARAMS = Params(
    dynamics_model=DynamicsModel.CLASSIC,
    reward_type=RewardType.DISTANCE_BASED,
    dist_to_goal_threshold=1.0,
    observation_radius=50.0,
    polyline_reduction_threshold=0.5,
    ignore_non_vehicles=True,
)


@pytest.fixture(scope="module")
def scene_state(reference_scene_path):
    scene = build_scene([reference_scene_path], PARAMS)
    state = jax.jit(stepmod.reset, static_argnames="params")(
        scene, None, PARAMS
    )
    return scene, state


def test_self_obs_layout(scene_state):
    scene, state = scene_state
    so = np.asarray(jax.jit(obs.self_observation)(scene, state))
    assert so.shape == (1, C.MAX_AGENTS, 8)
    n = int(np.asarray(scene.num_agents)[0])
    size = np.asarray(scene.agents.size)
    # speed at t=0 equals |traj_vel[0]| for non-static agents
    v0 = np.linalg.norm(np.asarray(scene.agents.traj_vel)[0, :n, 0], axis=-1)
    static = np.asarray(scene.agents.static)[0, :n]
    np.testing.assert_allclose(so[0, :n, 0], np.where(static, 0, v0), atol=1e-5)
    np.testing.assert_allclose(so[0, :n, 1:4], size[0, :n], atol=1e-6)
    # padding rows: SelfObservation::zero() with id=-1
    assert (so[0, n:, 7] == -1).all()
    assert (so[0, n:, :7] == 0).all()


def test_partner_obs_padding_ids(scene_state):
    scene, state = scene_state
    po = np.asarray(
        jax.jit(obs.partner_observations, static_argnames="params")(
            scene, state, PARAMS
        )
    )
    assert po.shape == (1, C.MAX_AGENTS, C.MAX_AGENTS - 1, 9)
    n = int(np.asarray(scene.num_agents)[0])
    # slots beyond numAgents-1 for real egos: zero_nonexist (id=-2)
    assert (po[0, :n, n - 1 :, 8] == -2).all()
    # rows of padded egos: zero() (id=-1)
    assert (po[0, n:, :, 8] == -1).all()
    # existing slots: either real id (>=0) or zeroed-out-of-radius (-1)
    ids = po[0, :n, : n - 1, 8]
    assert ((ids >= 0) | (ids == -1)).all()


def test_partner_obs_values_vs_bruteforce(scene_state):
    scene, state = scene_state
    po = np.asarray(
        jax.jit(obs.partner_observations, static_argnames="params")(
            scene, state, PARAMS
        )
    )
    n = int(np.asarray(scene.num_agents)[0])
    pos = np.asarray(state.pos)[0]
    yaw = np.asarray(state.yaw)[0]
    vel = np.asarray(state.vel)[0]
    aid = np.asarray(scene.agents.aid)[0]
    for i in range(min(n, 4)):
        k = 0
        for j in range(n):
            if j == i:
                continue
            rel = pos[j] - pos[i]
            c, s = np.cos(yaw[i]), np.sin(yaw[i])
            rel_ego = np.array([c * rel[0] + s * rel[1], -s * rel[0] + c * rel[1]])
            if np.linalg.norm(rel_ego) > PARAMS.observation_radius:
                assert po[0, i, k, 8] == -1
            else:
                np.testing.assert_allclose(po[0, i, k, 1:3], rel_ego, atol=1e-4)
                assert po[0, i, k, 8] == aid[j]
                assert po[0, i, k, 0] == pytest.approx(
                    np.linalg.norm(vel[j]), abs=1e-5
                )
            k += 1


def test_knn_matches_bruteforce(scene_state):
    scene, state = scene_state
    mo = np.asarray(
        jax.jit(obs.agent_map_observations, static_argnames="params")(
            scene, state, PARAMS
        )
    )
    assert mo.shape == (1, C.MAX_AGENTS, C.MAX_AGENT_MAP_OBS, 9)
    n = int(np.asarray(scene.num_agents)[0])
    nr = int(np.asarray(scene.num_roads)[0])
    rpos = np.asarray(scene.roads.pos)[0, :nr, :2]
    pos = np.asarray(state.pos)[0]

    for i in range(min(n, 4)):
        d = np.linalg.norm(rpos - pos[i], axis=-1)
        expected = np.sort(d[d <= PARAMS.observation_radius])[: C.MAX_AGENT_MAP_OBS]
        got_rel = mo[0, i, :, :2]
        got_d = np.linalg.norm(got_rel, axis=-1)
        got_types = mo[0, i, :, 7]
        kept = got_d[got_d > 0]
        assert len(kept) == len(expected)
        np.testing.assert_allclose(np.sort(kept), expected, atol=1e-3)
        # filler rows are all-zero (KNN filler zeroes id/mapType too)
        empty = mo[0, i][got_d == 0]
        if len(empty):
            assert (empty == 0).all()


def test_linear_algorithm_first_k_in_radius(scene_state):
    scene, state = scene_state
    params = Params(
        **{
            **PARAMS.__dict__,
            "road_obs_algorithm": RoadObsAlgorithm.LINEAR,
        }
    )
    mo = np.asarray(
        jax.jit(obs.agent_map_observations, static_argnames="params")(
            scene, state, params
        )
    )
    n = int(np.asarray(scene.num_agents)[0])
    nr = int(np.asarray(scene.num_roads)[0])
    rpos = np.asarray(scene.roads.pos)[0, :nr, :2]
    pos = np.asarray(state.pos)[0]
    for i in range(min(n, 4)):
        d = np.linalg.norm(rpos - pos[i], axis=-1)
        within = np.where(d <= params.observation_radius)[0][: C.MAX_AGENT_MAP_OBS]
        got_d = np.linalg.norm(mo[0, i, :, :2], axis=-1)
        np.testing.assert_allclose(
            got_d[: len(within)], d[within], atol=1e-3
        )
        # linear filler rows carry MapObservation::zero(): id = mapType = -1
        if len(within) < C.MAX_AGENT_MAP_OBS:
            assert (mo[0, i, len(within):, 7] == -1).all()


def test_absolute_obs_matches_state(scene_state):
    scene, state = scene_state
    ao = np.asarray(jax.jit(obs.absolute_self_observation)(scene, state))
    assert ao.shape == (1, C.MAX_AGENTS, 14)
    n = int(np.asarray(scene.num_agents)[0])
    np.testing.assert_allclose(ao[0, :n, :2], np.asarray(state.pos)[0, :n])
    np.testing.assert_allclose(ao[0, :n, 7], np.asarray(state.yaw)[0, :n])
    np.testing.assert_allclose(
        ao[0, :n, 8:10], np.asarray(scene.agents.goal)[0, :n]
    )
    # quaternion encodes the yaw
    w, z = ao[0, :n, 3], ao[0, :n, 6]
    np.testing.assert_allclose(
        2 * np.arctan2(z, w), np.asarray(state.yaw)[0, :n], atol=1e-5
    )


def test_flat_observation_ego_subset_matches_full(example_scene_paths):
    """flat_observation(ego_idx) == full flat_observation gathered at the
    same slots — the learner-compaction correctness contract."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gpudrive_lab_tpu.env.config import EnvConfig
    from gpudrive_lab_tpu.env.env_jax import GPUDriveTPUEnv, flat_observation

    env = GPUDriveTPUEnv(
        EnvConfig(num_worlds=2, collision_behavior="ignore"),
        scene_paths=example_scene_paths[:2],
    )
    env.reset()
    # step a few times so states differ from reset
    for _ in range(3):
        env.step_dynamics(
            jnp.zeros((2, env.max_agent_count, 10)).at[..., 0].set(1.0)
        )
    full, pm_full, rm_full = flat_observation(
        env.scene, env.state, env.params, env.spec, env.reward_weights
    )
    # controlled-first slot order (what the compact learner uses) plus a
    # couple of arbitrary rows
    ctrl = np.asarray(env.scene.agents.controlled)
    Csub = 8
    idx = np.argsort(~ctrl, axis=1, kind="stable")[:, :Csub]
    sub, pm_sub, rm_sub = flat_observation(
        env.scene, env.state, env.params, env.spec, env.reward_weights,
        jnp.asarray(idx),
    )
    w = np.arange(2)[:, None]
    np.testing.assert_allclose(
        np.asarray(sub), np.asarray(full)[w, idx], atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(pm_sub), np.asarray(pm_full)[w, idx]
    )
    np.testing.assert_array_equal(
        np.asarray(rm_sub), np.asarray(rm_full)[w, idx]
    )


def test_flat_ego_layout_matches_world_layout(scene_state):
    """flat (w_idx, a_idx) ego indexing returns exactly the same rows as
    the [W, C] per-world compaction — the cross-world flat-compaction
    contract used by the PPO learner's compact_mode='flat'."""
    import jax.numpy as jnp
    from gpudrive_lab_tpu.env.env_jax import ObsSpec, flat_observation

    scene, state = scene_state
    W, A = np.asarray(scene.agents.valid).shape
    # tile to 2 worlds for a cross-world case
    scene2 = jax.tree.map(lambda x: jnp.concatenate([x, x], axis=0), scene)
    state2 = jax.tree.map(lambda x: jnp.concatenate([x, x], axis=0), state)
    weights = jnp.zeros((2 * W, A, 3), jnp.float32)

    Cc = 4
    cidx = jnp.tile(jnp.arange(Cc)[None], (2 * W, 1))  # [2W, C]
    w_idx = jnp.repeat(jnp.arange(2 * W), Cc)
    a_idx = jnp.tile(jnp.arange(Cc), 2 * W)

    spec = ObsSpec()
    obs_w, pm_w, rm_w = flat_observation(
        scene2, state2, PARAMS, spec, weights, cidx
    )
    obs_f, pm_f, rm_f = flat_observation(
        scene2, state2, PARAMS, spec, weights, (w_idx, a_idx)
    )
    np.testing.assert_array_equal(
        np.asarray(obs_w).reshape(2 * W * Cc, -1), np.asarray(obs_f)
    )
    np.testing.assert_array_equal(
        np.asarray(pm_w).reshape(2 * W * Cc, -1), np.asarray(pm_f)
    )
    np.testing.assert_array_equal(
        np.asarray(rm_w).reshape(2 * W * Cc, -1), np.asarray(rm_f)
    )


def test_flat_ego_layout_linear_road_obs(scene_state):
    """Same flat-vs-world contract under the LINEAR road algorithm."""
    import dataclasses

    import jax.numpy as jnp

    scene, state = scene_state
    params = dataclasses.replace(
        PARAMS, road_obs_algorithm=RoadObsAlgorithm.LINEAR
    )
    W, A = np.asarray(scene.agents.valid).shape
    Cc = 3
    cidx = jnp.tile(jnp.arange(Cc)[None], (W, 1))
    w_idx = jnp.repeat(jnp.arange(W), Cc)
    a_idx = jnp.tile(jnp.arange(Cc), W)
    mo_w = np.asarray(
        obs.agent_map_observations(scene, state, params, cidx)
    ).reshape(W * Cc, C.MAX_AGENT_MAP_OBS, 9)
    mo_f = np.asarray(
        obs.agent_map_observations(scene, state, params, (w_idx, a_idx))
    )
    np.testing.assert_array_equal(mo_w, mo_f)


@pytest.mark.parametrize("algo", [RoadObsAlgorithm.KNEAREST,
                                  RoadObsAlgorithm.LINEAR])
@pytest.mark.parametrize("layout", ["world", "flat"])
def test_dot_gather_matches_take_gather(scene_state, algo, layout):
    """road_gather='dot' (one-hot MXU matmul) returns bitwise-identical
    observations to the production row gather in every layout x algorithm
    combination — exactness justified in observations._dot_gather_rows
    (1.0 * value sums with exactly one nonzero term)."""
    import dataclasses

    scene, state = scene_state
    W, A = np.asarray(scene.agents.valid).shape
    if layout == "world":
        ego_idx = None
    else:
        Cc = 5
        ego_idx = (
            jnp.repeat(jnp.arange(W), Cc),
            jnp.tile(jnp.arange(Cc), W),
        )
    p_take = dataclasses.replace(PARAMS, road_obs_algorithm=algo)
    p_dot = dataclasses.replace(p_take, road_gather="dot")
    mo_take = np.asarray(
        obs.agent_map_observations(scene, state, p_take, ego_idx)
    )
    mo_dot = np.asarray(
        obs.agent_map_observations(scene, state, p_dot, ego_idx)
    )
    np.testing.assert_array_equal(mo_take, mo_dot)
