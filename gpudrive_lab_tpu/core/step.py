"""The fused simulation step.

The reference executes each step as a CUDA megakernel running a taskgraph of
ECS systems (reference: src/sim.cpp:785-971).  Here the whole Step graph is
one pure function ``step(scene, state, actions, params)`` compiled by XLA:

    movement -> collision -> reward -> step tracker -> done

and the Reset graph is ``reset(scene, state, reset_mask, params)`` built from
the same tail (no step decrement), with world (re)generation replaced by a
``jnp.where`` blend against the freshly-initialized state — the
"reset-as-select" pattern, so per-world async resets stay inside jit.

Observation collection lives in core/observations.py and is composed by the
env layer so disabled observations cost nothing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gpudrive_lab_tpu import constants as C
from gpudrive_lab_tpu.core import dynamics
from gpudrive_lab_tpu.core.collision import collision_system
from gpudrive_lab_tpu.core.types import (
    CollisionBehaviour,
    DynamicsModel,
    Params,
    RewardType,
    Scene,
    SimState,
)


def current_step_index(state: SimState) -> jnp.ndarray:
    """Trajectory index used by movement/collision this step
    (reference: src/sim.cpp:23-25), clamped into the stored horizon."""
    return jnp.clip(C.EPISODE_LEN - state.steps_remaining, 0, C.TRAJECTORY_LEN - 1)


def _movement_system(
    scene: Scene, state: SimState, actions: jnp.ndarray, params: Params,
    cur_step: jnp.ndarray,
) -> SimState:
    """reference: src/sim.cpp:294-383."""
    agents = scene.agents
    valid = agents.valid
    collided_b = (state.collided != 0) & valid
    zero = jnp.zeros_like(state.vel)
    pad_xy = jnp.array(C.PADDING_POSITION, jnp.float32)

    done = state.done
    collided = state.collided
    pos, z, vel, ang_vel = state.pos, state.z, state.vel, state.ang_vel
    c_road, c_veh, c_nonveh = (
        state.collided_road, state.collided_vehicle, state.collided_non_vehicle
    )

    # -- phase 1: collision response (src/sim.cpp:302-323) ----------------
    if params.collision_behaviour == CollisionBehaviour.AGENT_STOP:
        done = jnp.where(collided_b, 1, done)
        vel = jnp.where(collided_b[..., None], zero, vel)
        ang_vel = jnp.where(collided_b, 0.0, ang_vel)
    elif params.collision_behaviour == CollisionBehaviour.AGENT_REMOVED:
        done = jnp.where(collided_b, 1, done)
        pos = jnp.where(collided_b[..., None], pad_xy, pos)
        z = jnp.where(collided_b, C.PADDING_Z, z)
        vel = jnp.where(collided_b[..., None], zero, vel)
        ang_vel = jnp.where(collided_b, 0.0, ang_vel)
    else:  # IGNORE: clear the event + info flags each step
        collided = jnp.where(collided_b, 0, collided)
        c_road = jnp.where(collided_b, 0, c_road)
        c_veh = jnp.where(collided_b, 0, c_veh)
        c_nonveh = jnp.where(collided_b, 0, c_nonveh)

    movable = valid & ~agents.static

    # -- phase 2: teleport done (non-static) agents (src/sim.cpp:333-343) --
    # Note: under AgentStop/AgentRemoved a newly-collided agent is done and
    # therefore ALSO teleported this same step (the reference's movement
    # system re-reads the done flag it just wrote).
    teleport = movable & (done != 0)
    pos = jnp.where(teleport[..., None], pad_xy, pos)
    z = jnp.where(teleport, C.PADDING_Z, z)
    vel = jnp.where(teleport[..., None], zero, vel)
    ang_vel = jnp.where(teleport, 0.0, ang_vel)

    # -- phase 3: integrate ------------------------------------------------
    active = movable & (done == 0)
    drive = active & agents.controlled
    expert = active & ~agents.controlled

    if params.dynamics_model == DynamicsModel.CLASSIC:
        n_pos, n_yaw, n_vel, n_w = dynamics.forward_classic(
            actions, agents.size[..., 0], pos, state.yaw, vel
        )
    elif params.dynamics_model == DynamicsModel.INVERTIBLE_BICYCLE:
        n_pos, n_yaw, n_vel, n_w = dynamics.forward_invertible_bicycle(
            actions, pos, state.yaw, vel
        )
    elif params.dynamics_model == DynamicsModel.DELTA_LOCAL:
        n_pos, n_yaw, n_vel, n_w = dynamics.forward_delta_local(
            actions, pos, state.yaw, vel
        )
    else:  # STATE
        n_pos, n_yaw, n_vel, n_w = dynamics.forward_state(actions)

    yaw = jnp.where(drive, n_yaw, state.yaw)
    pos = jnp.where(drive[..., None], n_pos, pos)
    # Classic sets z=1 explicitly (src/dynamics.hpp:43); the other models
    # leave z untouched but live agents always have z=1 anyway.
    z = jnp.where(drive, 1.0, z)
    vel = jnp.where(drive[..., None], n_vel, vel)
    ang_vel = jnp.where(drive, n_w, ang_vel)

    # Expert playback (src/sim.cpp:370-382)
    idx = cur_step[..., None]
    e_pos = jnp.take_along_axis(agents.traj_pos, idx[..., None], axis=2)[:, :, 0]
    e_vel = jnp.take_along_axis(agents.traj_vel, idx[..., None], axis=2)[:, :, 0]
    e_yaw = jnp.take_along_axis(agents.traj_yaw, idx, axis=2)[:, :, 0]
    pos = jnp.where(expert[..., None], e_pos, pos)
    z = jnp.where(expert, 1.0, z)
    vel = jnp.where(expert[..., None], e_vel, vel)
    ang_vel = jnp.where(expert, 0.0, ang_vel)
    yaw = jnp.where(expert, e_yaw, yaw)

    return state.replace(
        pos=pos, z=z, yaw=yaw, vel=vel, ang_vel=ang_vel, collided=collided,
        done=done, collided_road=c_road, collided_vehicle=c_veh,
        collided_non_vehicle=c_nonveh,
    )


def _reward_system(scene: Scene, state: SimState, params: Params) -> SimState:
    """reference: src/sim.cpp:560-587."""
    dist = jnp.linalg.norm(state.pos - scene.agents.goal, axis=-1)
    if params.reward_type == RewardType.DISTANCE_BASED:
        r = -dist
    else:  # ON_GOAL_ACHIEVED
        r = (dist < params.dist_to_goal_threshold).astype(jnp.float32)
    return state.replace(
        reward=jnp.where(scene.agents.valid, r, state.reward)
    )


def _done_system(scene: Scene, state: SimState, params: Params) -> SimState:
    """reference: src/sim.cpp:597-626."""
    valid = scene.agents.valid
    steps = state.steps_remaining
    done = state.done
    reached = state.reached_goal

    fresh = (steps == C.EPISODE_LEN) & (done != 1)  # early-return branch
    done = jnp.where(fresh, 0, jnp.where(steps == 0, 1, done))

    dist = jnp.linalg.norm(state.pos - scene.agents.goal, axis=-1)
    near = dist < params.dist_to_goal_threshold
    check = ~fresh & ~((done == 1) & (reached == 1)) & near
    done = jnp.where(check, 1, done)
    reached = jnp.where(check, 1, reached)

    return state.replace(
        done=jnp.where(valid, done, state.done),
        reached_goal=jnp.where(valid, reached, state.reached_goal),
    )


def _rest_of_tasks(
    scene: Scene, state: SimState, params: Params, cur_step: jnp.ndarray,
    decrement_step: bool,
) -> SimState:
    """Shared tail of the Step and Reset graphs
    (reference: src/sim.cpp:785-943)."""
    state = collision_system(scene, state, params, cur_step)
    state = _reward_system(scene, state, params)
    if decrement_step:
        state = state.replace(
            steps_remaining=jnp.where(
                scene.agents.valid, state.steps_remaining - 1,
                state.steps_remaining,
            )
        )
    return _done_system(scene, state, params)


def step(
    scene: Scene, state: SimState, actions: jnp.ndarray, params: Params
) -> SimState:
    """One Step-graph invocation (reference: src/sim.cpp:945-958).

    ``actions``: [W, A, 10] action-union rows (src/types.hpp:109-145).
    """
    cur_step = current_step_index(state)
    state = _movement_system(scene, state, actions, params, cur_step)
    return _rest_of_tasks(scene, state, params, cur_step, decrement_step=True)


def init_state(scene: Scene) -> SimState:
    """Fresh per-agent state exactly as resetAgent leaves it
    (reference: src/level_gen.cpp:32-54) — before the Reset graph's tail runs."""
    agents = scene.agents
    valid = agents.valid
    pos0 = agents.traj_pos[:, :, 0]
    vel0 = jnp.where(
        (valid & ~agents.static)[..., None], agents.traj_vel[:, :, 0], 0.0
    )
    yaw0 = agents.traj_yaw[:, :, 0]
    zeros_i = jnp.zeros_like(agents.aid)
    return SimState(
        pos=jnp.where(valid[..., None], pos0, 0.0),
        z=jnp.where(valid, 1.0, 0.0),
        yaw=jnp.where(valid, yaw0, 0.0),
        vel=vel0,
        ang_vel=jnp.zeros_like(yaw0),
        collided=zeros_i,
        done=jnp.where(valid, 0, 1),
        collided_road=zeros_i,
        collided_vehicle=zeros_i,
        collided_non_vehicle=zeros_i,
        reached_goal=zeros_i,
        steps_remaining=jnp.where(valid, C.EPISODE_LEN, 0),
        reward=jnp.zeros_like(yaw0),
    )


def reset(
    scene: Scene,
    state: SimState | None,
    params: Params,
    reset_mask: jnp.ndarray | None = None,
) -> SimState:
    """Reset-graph invocation (reference: src/sim.cpp:150-166, 960-966).

    ``reset_mask``: [W] bool — worlds to regenerate; others pass through the
    (idempotent) graph tail exactly like the reference, which runs the Reset
    taskgraph across all worlds and only regenerates flagged ones.
    """
    fresh = init_state(scene)
    if state is None or reset_mask is None:
        state = fresh
    else:
        blend = lambda a, b: jnp.where(
            reset_mask.reshape((-1,) + (1,) * (a.ndim - 1)), a, b
        )
        state = jax.tree.map(blend, fresh, state)
    cur_step = current_step_index(state)
    return _rest_of_tasks(scene, state, params, cur_step, decrement_step=False)
