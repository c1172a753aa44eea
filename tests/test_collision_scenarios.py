"""Scenario-level collision cases tiled across 64 parallel worlds
(BASELINE config 3; reference: tests/agent-agent-collision.json +
tests/agent-road-edge-collision.json, fixtures here re-authored with full
91-step trajectories — see tests/data/make_collision_fixtures.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gpudrive_lab_tpu.core import step as stepmod
from gpudrive_lab_tpu.core.types import (
    CollisionBehaviour,
    DynamicsModel,
    Params,
    RewardType,
)
from gpudrive_lab_tpu.scene.compiler import build_scene

AGENT_AGENT = "tests/data/agent_agent_collision.json"
ROAD_EDGE = "tests/data/agent_road_edge_collision.json"
NUM_WORLDS = 64


@pytest.fixture(scope="module")
def rollout():
    params = Params(
        dynamics_model=DynamicsModel.CLASSIC,
        collision_behaviour=CollisionBehaviour.IGNORE,
        reward_type=RewardType.DISTANCE_BASED,
        dist_to_goal_threshold=1.0,
        polyline_reduction_threshold=0.0,
        max_num_controlled_agents=0,  # all-expert playback
    )
    # alternate the two cases across 64 parallel worlds
    paths = [AGENT_AGENT if w % 2 == 0 else ROAD_EDGE for w in range(NUM_WORLDS)]
    scene = build_scene(paths, params)
    reset_fn = jax.jit(stepmod.reset, static_argnames="params")
    step_fn = jax.jit(stepmod.step, static_argnames="params")
    state = reset_fn(scene, None, params)
    acts = jnp.zeros((NUM_WORLDS, scene.agents.valid.shape[1], 10))
    snapshots = {}
    for t in range(1, 61):
        state = step_fn(scene, state, acts, params)
        if t in (1, 40, 50, 60):
            snapshots[t] = jax.tree.map(np.asarray, state)
    return scene, snapshots


def test_road_edge_case_collides_immediately(rollout):
    scene, snaps = rollout
    s1 = snaps[1]
    road_worlds = np.arange(1, NUM_WORLDS, 2)
    # the only agent in each road-edge world straddles the edge from step 1
    assert (s1.collided_road[road_worlds, 0] == 1).all()
    assert (s1.collided_vehicle[road_worlds, 0] == 0).all()


def test_agent_agent_case_no_contact_early(rollout):
    scene, snaps = rollout
    s1 = snaps[1]
    aa_worlds = np.arange(0, NUM_WORLDS, 2)
    assert (s1.collided_vehicle[aa_worlds, :2] == 0).all()
    assert (s1.collided_road[aa_worlds, :2] == 0).all()


def test_agent_agent_case_collides_on_approach(rollout):
    """Boxes (1x1, scale 0.7 -> half extents 0.35) 5 m apart closing at
    1 m/s first touch at dy=0.7, i.e. step ceil(43): by step 50 both agents
    must carry collidedWithVehicle in every agent-agent world."""
    scene, snaps = rollout
    s50 = snaps[50]
    aa_worlds = np.arange(0, NUM_WORLDS, 2)
    assert (s50.collided_vehicle[aa_worlds, 0] == 1).all()  # the mover
    assert (s50.collided_vehicle[aa_worlds, 1] == 1).all()  # the parked car
    assert (s50.collided_road[aa_worlds, :2] == 0).all()
    # not flagged at t=40 (dy = 1.0 > 0.7): contact is timed, not spurious
    s40 = snaps[40]
    assert (s40.collided_vehicle[aa_worlds, :2] == 0).all()


def test_cases_do_not_cross_contaminate(rollout):
    scene, snaps = rollout
    s60 = snaps[60]
    road_worlds = np.arange(1, NUM_WORLDS, 2)
    # single-agent worlds can never see a vehicle collision
    assert (s60.collided_vehicle[road_worlds] == 0).all()
