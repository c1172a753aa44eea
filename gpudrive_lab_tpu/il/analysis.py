"""Closed-loop IL evaluation analyses.

The fork's research tooling over a trained BC policy, re-built for the JAX
stack (reference: baselines/il/test/simulation.py:1-253 closed-loop metric
harness, importance_weight.py:1-197 attention-importance rollouts,
intervention.py:1-220 linear-probe intervention experiment):

  * ``closed_loop_rollout`` — drive controlled agents with the BC policy and
    record episode flags, goal-reached-time ratio vs the logged expert,
    goal-progress ratio, and (optionally) the per-head ego->partner attention
    ("importance weight") and fused tokens at every step.
  * ``expert_done_steps`` — per-agent step at which the logged expert first
    reaches its goal (the reference reads these from a precomputed CSV;
    here they come straight from the logged trajectory).
  * ``extract_token_dataset`` / ``train_position_probes`` — linear probes on
    the frozen ego token (future ego grid cell) and partner tokens (future
    partner grid cell), on the reference's 8x8 grid over +-100 m
    (constants.py:12-35 GRID_CELL_COUNT=9 corner lines).
  * ``intervention_effect`` — add the partner-probe's class-weight row for a
    chosen target cell to the ego token and report how the ego probe's
    prediction shifts (intervention.py:152-165 ego_pred vs ego_pred_prime).

All analysis math is host-side numpy over device-collected arrays: the hot
path (policy forward, sim step) stays jitted; the analyses are O(T*W) python.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gpudrive_lab_tpu import constants as C
from gpudrive_lab_tpu.il.linear_probing import LinearProbe, ProbeConfig
from gpudrive_lab_tpu.il.networks import BCConfig, gmm_sample

# The reference grid: GRID_CELL_COUNT=9 corner lines over
# 0.1*[MIN_REL_AGENT_POS, MAX_REL_AGENT_POS] = +-100 m -> 8x8 = 64 cells
# (reference: visualize/core.py:1773, env/constants.py:35).
GRID_CORNER_LINES = 9
GRID_EXTENT = 0.1 * C.MAX_REL_AGENT_POS  # 100 m half-extent


def grid_cells() -> int:
    side = GRID_CORNER_LINES - 1
    return side * side


def position_to_cell(rel_xy: np.ndarray) -> np.ndarray:
    """Ego-frame displacement -> cell index on the reference's 8x8 grid.
    Out-of-grid positions clamp to the border cells (the reference drops
    them for plotting; for probe labels clamping keeps every sample).
    rel_xy [..., 2] -> [...] int."""
    side = GRID_CORNER_LINES - 1
    res = 2 * GRID_EXTENT / side
    col = np.clip(((rel_xy[..., 0] + GRID_EXTENT) / res).astype(int), 0, side - 1)
    row = np.clip(((rel_xy[..., 1] + GRID_EXTENT) / res).astype(int), 0, side - 1)
    return row * side + col


def cell_centers_ego_frame() -> np.ndarray:
    """[cells, 2] ego-frame xy of each grid-cell center."""
    side = GRID_CORNER_LINES - 1
    corners = np.linspace(-GRID_EXTENT, GRID_EXTENT, GRID_CORNER_LINES)
    cx = (corners[:-1] + corners[1:]) / 2
    gx, gy = np.meshgrid(cx, cx)  # row-major: index = row * side + col
    return np.stack([gx.ravel(), gy.ravel()], axis=-1)


def partner_slot_map(A: int) -> np.ndarray:
    """[A, A-1] agent index behind partner-obs slot k of agent a
    (the all-but-self wiring, env_jax.flat_observation:159-162)."""
    k = np.arange(A - 1)
    return k[None, :] + (k[None, :] >= np.arange(A)[:, None])


def expert_done_steps(scene, goal_threshold: float = 2.0) -> np.ndarray:
    """[W, A] first logged step within goal_threshold of the goal; falls
    back to the last valid logged step (the reference precomputes the same
    quantity into expert_*_data_v2.csv 'done_step')."""
    traj = np.asarray(scene.agents.traj_pos)  # [W, A, T, 2]
    valid = np.asarray(scene.agents.traj_valid) > 0  # [W, A, T]
    goal = np.asarray(scene.agents.goal)[..., None, :2]  # [W, A, 1, 2]
    at_goal = (np.linalg.norm(traj[..., :2] - goal, axis=-1) < goal_threshold) & valid
    T = traj.shape[2]
    first = np.where(at_goal.any(-1), at_goal.argmax(-1), -1)
    last_valid = np.where(
        valid.any(-1), T - 1 - valid[..., ::-1].argmax(-1), T - 1
    )
    done = np.where(first >= 0, first, last_valid)
    return np.maximum(done, 1)


@dataclasses.dataclass
class ClosedLoopResult:
    metrics: Dict[str, float]
    # per-world-agent episode flags over controlled agents [W, A]
    goal_achieved: np.ndarray
    collided: np.ndarray
    off_road: np.ndarray
    # [T, W, H, A-1] ego->partner attention per head (None unless collected)
    importance: Optional[np.ndarray] = None
    # [T, W, A, D] fused ego tokens (None unless collected)
    ego_tokens: Optional[np.ndarray] = None
    # [T, W, A, A-1, D] fused partner tokens (None unless collected)
    ro_tokens: Optional[np.ndarray] = None
    # world-frame positions/yaw history [T, W, A, 2] / [T, W, A]
    positions: Optional[np.ndarray] = None
    yaws: Optional[np.ndarray] = None


def closed_loop_rollout(
    env,
    model,
    variables,
    bc_config: BCConfig,
    max_steps: int = C.EPISODE_LEN,
    deterministic: bool = True,
    collect_importance: bool = False,
    collect_tokens: bool = False,
    collect_states: bool = False,
    rng: Optional[jax.Array] = None,
) -> ClosedLoopResult:
    """Drive every controlled agent with the BC policy; dead agents keep
    receiving zero actions with collision response 'ignore' (reference:
    simulation.py:49-108 loop semantics).  Returns episode metrics plus the
    requested per-step analysis tensors."""
    rng = jax.random.PRNGKey(0) if rng is None else rng
    obs = env.reset()
    ns = bc_config.num_stack
    W, A = env.num_worlds, env.max_agent_count

    collect = ["intermediates"] if (collect_importance or collect_tokens) else []
    apply = jax.jit(
        lambda v, o, pm, rm: model.apply(v, o, pm, rm, mutable=collect)
    )

    ctrl = np.asarray(env.cont_agent_mask)  # [W, A]
    n_ctrl = max(int(ctrl.sum()), 1)
    pos0 = np.asarray(env.state.pos)
    goal = np.asarray(env.scene.agents.goal)[..., :2]
    init_goal_dist = np.maximum(np.linalg.norm(goal - pos0, axis=-1), 1e-3)

    expert_done = expert_done_steps(
        env.scene, getattr(env.params, "dist_to_goal_threshold", 2.0)
    )

    goal_ep = np.zeros((W, A), bool)
    col_ep = np.zeros((W, A), bool)
    off_ep = np.zeros((W, A), bool)
    goal_step = np.full((W, A), -1.0, np.float32)
    last_dist = init_goal_dist.copy()

    frames = [np.asarray(obs)] * ns
    importance, ego_toks, ro_toks, poss, yaws = [], [], [], [], []

    for t in range(max_steps):
        stacked = np.concatenate(frames[-ns:], axis=-1).reshape(W * A, -1)
        pm = np.asarray(env.get_partner_mask()).reshape(W * A, -1) != 0
        rm = np.asarray(env.get_road_mask()).reshape(W * A, -1)
        out = apply(
            variables, jnp.asarray(stacked), jnp.asarray(pm), jnp.asarray(rm)
        )
        (_, (means, variances, weights)), aux = out[0], out[1] if collect else {}
        rng, k = jax.random.split(rng)
        act = gmm_sample(k, means, variances, weights, deterministic)
        act3 = np.array(act).reshape(W, A, 3)
        act3[~ctrl] = 0.0

        if collect_importance:
            attn = np.asarray(
                aux["intermediates"]["ego_ro_cross"]["MultiHeadAttention_0"][
                    "attn_weights"
                ][0]
            )  # [W*A, H, 1, A-1]
            attn = attn[:, :, 0, :].reshape(W, A, attn.shape[1], -1)
            # one controlled (ego) agent per world is the reference setting;
            # take each world's first controlled row
            ego_rows = np.argmax(ctrl, axis=1)
            importance.append(attn[np.arange(W), ego_rows])
        if collect_tokens:
            inter = aux["intermediates"]
            ego_toks.append(
                np.asarray(inter["ego_token"][0]).reshape(W, A, -1)
            )
            ro = np.asarray(inter["ro_tokens"][0])
            ro_toks.append(ro.reshape(W, A, ro.shape[1], -1))
        if collect_states:
            poss.append(np.asarray(env.state.pos))
            yaws.append(np.asarray(env.state.yaw))

        env.step_dynamics(jnp.asarray(act3))
        obs = env.get_obs()
        frames.append(np.asarray(obs))

        infos = env.get_infos()
        goal_now = np.asarray(infos["goal_achieved"]) > 0
        newly = goal_now & ~goal_ep & ctrl
        goal_step[newly] = t / expert_done[newly]
        goal_ep |= goal_now
        col_ep |= np.asarray(infos["collided"]) > 0
        off_ep |= np.asarray(infos["off_road"]) > 0
        pos_t = np.asarray(env.state.pos)
        live = ~(goal_ep | col_ep | off_ep)
        last_dist = np.where(
            live, np.linalg.norm(goal - pos_t, axis=-1), last_dist
        )
        if np.asarray(env.get_dones()).all():
            break

    progress = 1.0 - np.clip(last_dist / init_goal_dist, 0.0, 1.0)
    progress[goal_ep] = 1.0
    gt = goal_step[ctrl & goal_ep]
    metrics = {
        "goal_rate": float((goal_ep & ctrl).sum() / n_ctrl),
        "collision_rate": float((col_ep & ctrl).sum() / n_ctrl),
        "off_road_rate": float((off_ep & ctrl).sum() / n_ctrl),
        "goal_progress": float(progress[ctrl].mean()),
        # rollout-goal-step / expert-goal-step over agents that made it
        # (reference: simulation.py:110-140 'Goal Reached Time')
        "goal_time_ratio": float(gt.mean()) if gt.size else -1.0,
    }
    return ClosedLoopResult(
        metrics=metrics,
        goal_achieved=goal_ep & ctrl,
        collided=col_ep & ctrl,
        off_road=off_ep & ctrl,
        importance=np.stack(importance) if importance else None,
        ego_tokens=np.stack(ego_toks) if ego_toks else None,
        ro_tokens=np.stack(ro_toks) if ro_toks else None,
        positions=np.stack(poss) if poss else None,
        yaws=np.stack(yaws) if yaws else None,
    )


def extract_token_dataset(
    model, variables, dataset, batch_size: int = 256
) -> Dict[str, np.ndarray]:
    """Forward the ExpertDataset through the frozen BC net collecting the
    fused ego and partner tokens (the analogue of the reference's forward
    hooks, intervention.py:45-63)."""
    apply = jax.jit(
        lambda v, o, pm, rm: model.apply(
            v, o, pm, rm, mutable=["intermediates"]
        )[1]["intermediates"]
    )
    ego, ro = [], []
    ids = np.arange(len(dataset))
    for i in range(0, len(ids), batch_size):
        b = dataset.batch(ids[i : i + batch_size])
        inter = apply(
            variables,
            jnp.asarray(b["obs"]),
            jnp.asarray(b["partner_mask"]),
            jnp.asarray(b["road_mask"]),
        )
        ego.append(np.asarray(inter["ego_token"][0]))
        ro.append(np.asarray(inter["ro_tokens"][0]))
    return {"ego": np.concatenate(ego), "ro": np.concatenate(ro)}


def _rotate_into_ego(rel_world: np.ndarray, yaw: np.ndarray) -> np.ndarray:
    c, s = np.cos(yaw), np.sin(yaw)
    x = rel_world[..., 0] * c + rel_world[..., 1] * s
    y = -rel_world[..., 0] * s + rel_world[..., 1] * c
    return np.stack([x, y], axis=-1)


def probe_labels_from_positions(
    dataset, future_step: int
) -> Dict[str, np.ndarray]:
    """Grid-cell labels for the ego and partner position probes.

    Requires 'positions' [T, W, A, 2] and 'yaw' [T, W, A] in the generation
    data (il.data_generation records them).  Ego label: ego displacement at
    t+future in the ego frame at t.  Partner label per obs slot: partner's
    position at t+future relative to the ego frame at t (the grid the
    reference draws around the ego, visualize/core.py:1762-1805)."""
    pos = dataset.data["positions"]
    yaw = dataset.data["yaw"]
    T, W, A = yaw.shape
    t, w, a = dataset.index.T
    tf = np.clip(t + future_step, 0, T - 1)

    ego_now = pos[t, w, a]
    ego_yaw = yaw[t, w, a]
    ego_fut = pos[tf, w, a]
    ego_label = position_to_cell(_rotate_into_ego(ego_fut - ego_now, ego_yaw))

    slots = partner_slot_map(A)[a]  # [B, A-1]
    partner_fut = pos[tf[:, None], w[:, None], slots]  # [B, A-1, 2]
    rel = _rotate_into_ego(
        partner_fut - ego_now[:, None], ego_yaw[:, None]
    )
    partner_label = position_to_cell(rel)
    return {"ego": ego_label, "partner": partner_label}


def train_position_probes(
    tokens: Dict[str, np.ndarray],
    labels: Dict[str, np.ndarray],
    partner_valid: Optional[np.ndarray] = None,
    config: Optional[ProbeConfig] = None,
):
    """Fit the ego-token and partner-token position probes.  Returns
    (ego_probe, other_probe, metrics).  Partner samples flatten over obs
    slots, keeping only valid (unmasked) partners."""
    config = config or ProbeConfig()
    rng = np.random.default_rng(0)
    cells = grid_cells()

    ego_probe = LinearProbe(tokens["ego"].shape[-1], cells, config)
    m_ego = ego_probe.fit(tokens["ego"], labels["ego"], rng)

    ro = tokens["ro"].reshape(-1, tokens["ro"].shape[-1])
    lab = labels["partner"].reshape(-1)
    if partner_valid is not None:
        keep = partner_valid.reshape(-1)
        ro, lab = ro[keep], lab[keep]
    other_probe = LinearProbe(ro.shape[-1], cells, config)
    m_other = other_probe.fit(ro, lab, rng)
    return ego_probe, other_probe, {"ego": m_ego, "partner": m_other}


def intervention_effect(
    ego_probe: LinearProbe,
    other_probe: LinearProbe,
    ego_tokens: np.ndarray,
    intervention_label: int,
) -> Dict[str, np.ndarray]:
    """The fork's intervention experiment (intervention.py:152-165): push the
    partner-probe's class-weight row for ``intervention_label`` into the ego
    representation and read how the ego probe's position prediction moves.

    Returns ego_pred / ego_pred_prime [B] cell indices."""
    w_ego = np.asarray(ego_probe.params["w"])
    b_ego = np.asarray(ego_probe.params["b"])
    # class->feature direction of the partner probe (torch stores head
    # weights [classes, dim]; ours is [dim, classes] -> take the column)
    direction = np.asarray(other_probe.params["w"])[:, intervention_label]
    ego_pred = np.argmax(ego_tokens @ w_ego + b_ego, axis=-1)
    ego_prime = np.argmax((ego_tokens + direction) @ w_ego + b_ego, axis=-1)
    return {"ego_pred": ego_pred, "ego_pred_prime": ego_prime}


def predict_partner_cells(
    other_probe: LinearProbe, ro_tokens: np.ndarray
) -> np.ndarray:
    """[..., A-1] predicted grid cell per partner slot."""
    w = np.asarray(other_probe.params["w"])
    b = np.asarray(other_probe.params["b"])
    return np.argmax(ro_tokens @ w + b, axis=-1)
