"""GPUDriveTPUEnv — the gymnasium-style batched environment.

TPU-native counterpart of the reference's torch env
(reference: gpudrive/env/env_torch.py).  Differences by design:

  * There is no separate simulator process/extension: the "sim" is the jitted
    step from gpudrive_lab_tpu.core, and "tensor exports" are just pytree
    fields.  One fused XLA program computes step + observations + shaped
    rewards + dones, so the hot rollout path never leaves the device.
  * Per-world async reset is a masked blend inside the same program.
  * Scene swaps (set_maps) rebuild the Scene pytree host-side with identical
    padded shapes, so no recompilation happens between batches.

Host-side state kept by the class: the Scene pytree, the SimState, stacked
observations, world_time_steps, and reward-conditioning weights.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gpudrive_lab_tpu import constants as C
from gpudrive_lab_tpu.core import observations as obsmod
from gpudrive_lab_tpu.core import step as stepmod
from gpudrive_lab_tpu.core.types import DynamicsModel, Params, Scene, SimState
from gpudrive_lab_tpu.env.config import EnvConfig
from gpudrive_lab_tpu.env.dataset import SceneDataLoader
from gpudrive_lab_tpu.scene.compiler import build_scene


@dataclasses.dataclass(frozen=True)
class ObsSpec:
    """Static observation-assembly options (hashable jit key)."""

    ego_state: bool = True
    road_map_obs: bool = True
    partner_obs: bool = True
    norm_obs: bool = True
    reward_conditioned: bool = False

    @property
    def obs_dim(self) -> int:
        d = 0
        if self.ego_state:
            d += C.EGO_FEAT_DIM + (3 if self.reward_conditioned else 0)
        if self.partner_obs:
            d += (C.MAX_AGENTS - 1) * C.PARTNER_FEAT_DIM
        if self.road_map_obs:
            d += C.MAX_AGENT_MAP_OBS * C.ROAD_GRAPH_FEAT_DIM
        return d


def _minmax(x, lo, hi):
    """normalize_min_max (reference: gpudrive/utils/geometry.py)."""
    return 2.0 * ((x - lo) / (hi - lo)) - 1.0


@functools.partial(jax.jit, static_argnames=("params", "spec", "split"))
def flat_observation(
    scene: Scene,
    state: SimState,
    params: Params,
    spec: ObsSpec,
    reward_weights: jnp.ndarray,
    ego_idx: Optional[jnp.ndarray] = None,
    split: bool = False,
):
    """Flattened per-agent policy observation + masks.

    Layout (reference: gpudrive/env/env_torch.py:1172-1216, Appendix C of
    SURVEY.md): [ego(6[+3]), partner(127*6), road(200*13)], normalized when
    norm_obs.  Returns (obs [W, A, D], partner_mask [W, A, 127],
    road_mask [W, A, K]).

    ego_idx [W, C] restricts the ego axis to the selected agent slots
    (obs/masks come back [W, C, ...]) — the learner-compaction hook: the
    policy only needs rows for controlled agents, so compacting here cuts
    the whole obs+policy path by A/C.  ego_idx may also be a FLAT
    (w_idx [N], a_idx [N]) tuple: obs/masks come back [N, ...] with the ego
    axis holding exactly the selected (world, agent) pairs — cross-world
    compaction for batches whose per-world controlled counts are imbalanced.

    ``split=True`` returns the obs as the PRE-SPLIT modality tuple
    (ego [.., E], partner [.., 127, 6], road [.., 200, 13]) instead of one
    concatenated [.., 3368] vector — the exact operands
    ``LateFusionPolicy.__call__`` unpacks the flat form into, minus the
    slice/reshape relayouts.  Requires all three classic modalities on.
    """
    if split and not (spec.ego_state and spec.partner_obs
                      and spec.road_map_obs):
        raise ValueError("split obs requires ego/partner/road all enabled")
    parts = []
    partner_mask = None
    road_mask = None

    # Partner collection only when enabled — it is the most expensive gather
    # and the reference skips it entirely in lidar-only mode
    # (env_torch.py:1224-1272 returns empty masks when partner_obs is off).
    # with_static rides the other agent's static flag on the same packed
    # gather — the partner-mask block below needs it, and a separate
    # agents.static gather would repeat the all-but-self indexing.
    partner = other_static = None
    if spec.partner_obs:
        partner, other_static = obsmod.partner_observations(
            scene, state, params, ego_idx, with_static=True
        )
        # Fixed flat-feature ABI: 127 partner slots (Appendix C) even when
        # the sim's agent axis is bucketed below 128.  Pad the RAW rows
        # with PartnerObservation "nonexistent" fillers (zero features,
        # id=-2) BEFORE normalization, so padded and full-128 pipelines
        # produce bitwise-identical observations and masks.
        short = (C.MAX_AGENTS - 1) - partner.shape[-2]
        if short:
            filler = jnp.zeros(9, jnp.float32).at[8].set(-2.0)
            pad_rows = jnp.broadcast_to(
                filler, partner.shape[:-2] + (short, 9)
            )
            partner = jnp.concatenate([partner, pad_rows], axis=-2)
            other_static = jnp.concatenate(
                [
                    other_static,
                    jnp.zeros(
                        other_static.shape[:-1] + (short,), other_static.dtype
                    ),
                ],
                axis=-1,
            )

    if spec.ego_state:
        so = obsmod.self_observation(scene, state, ego_idx)
        speed = so[..., 0]
        length = so[..., 1] * C.VEHICLE_LENGTH_SCALE
        width = so[..., 2] * C.VEHICLE_LENGTH_SCALE
        gx, gy = so[..., 4], so[..., 5]
        collided = so[..., 6]
        if spec.norm_obs:
            speed = speed / C.MAX_SPEED
            length = length / C.MAX_VEH_LEN
            width = width / C.MAX_VEH_WIDTH
            gx = _minmax(gx, C.MIN_REL_GOAL_COORD, C.MAX_REL_GOAL_COORD)
            gy = _minmax(gy, C.MIN_REL_GOAL_COORD, C.MAX_REL_GOAL_COORD)
        ego = jnp.stack([speed, length, width, gx, gy, collided], axis=-1)
        if spec.reward_conditioned:
            ego = jnp.concatenate(
                [ego, obsmod._ego_take(reward_weights, ego_idx)], axis=-1
            )
        parts.append(ego)

    if spec.partner_obs:
        p_speed = partner[..., 0]
        p_x, p_y = partner[..., 1], partner[..., 2]
        p_head = partner[..., 3]
        p_len = partner[..., 4] * C.VEHICLE_LENGTH_SCALE
        p_wid = partner[..., 5] * C.VEHICLE_LENGTH_SCALE
        if spec.norm_obs:
            p_speed = p_speed / C.MAX_SPEED
            p_x = _minmax(p_x, C.MIN_REL_AGENT_POS, C.MAX_REL_AGENT_POS)
            p_y = _minmax(p_y, C.MIN_REL_AGENT_POS, C.MAX_REL_AGENT_POS)
            p_head = p_head / C.MAX_ORIENTATION_RAD
            p_len = p_len / C.MAX_VEH_LEN
            p_wid = p_wid / C.MAX_VEH_WIDTH
        pobs = jnp.stack([p_speed, p_x, p_y, p_head, p_len, p_wid], axis=-1)
        parts.append(pobs if split else pobs.reshape(pobs.shape[:-2] + (-1,)))

    if spec.road_map_obs:
        mo = obsmod.agent_map_observations(scene, state, params, ego_idx)
        x, y = mo[..., 0], mo[..., 1]
        d0, d1, d2 = mo[..., 2], mo[..., 3], mo[..., 4]
        heading = mo[..., 5]
        rtype = jnp.clip(mo[..., 6].astype(jnp.int32), 0, 6)
        if spec.norm_obs:
            x = _minmax(x, C.MIN_RG_COORD, C.MAX_RG_COORD)
            y = _minmax(y, C.MIN_RG_COORD, C.MAX_RG_COORD)
            d0 = d0 / C.MAX_ROAD_LINE_SEGMENT_LEN
            d1 = d1 / C.MAX_ROAD_SCALE
            d2 = d2 / C.MAX_ROAD_SCALE
            heading = heading / C.MAX_ORIENTATION_RAD
        one_hot = jax.nn.one_hot(rtype, 7, dtype=jnp.float32)
        robs = jnp.concatenate(
            [jnp.stack([x, y, d0, d1, d2, heading], axis=-1), one_hot],
            axis=-1,
        )
        parts.append(robs if split else robs.reshape(robs.shape[:-2] + (-1,)))
        road_mask = mo[..., 7] == -1  # road_mask (env_torch.py:1258-1272)

    if split:
        obs = tuple(parts)
    elif parts:
        obs = jnp.concatenate(parts, axis=-1)
    elif isinstance(ego_idx, tuple):  # lidar-only, flat ego axis
        obs = jnp.zeros((ego_idx[0].shape[0], 0), jnp.float32)
    else:  # disable_classic_obs: no flat features (lidar-only mode)
        W, A = scene.agents.valid.shape
        rows = A if ego_idx is None else ego_idx.shape[1]
        obs = jnp.zeros((W, rows, 0), jnp.float32)

    if spec.partner_obs:
        # Partner mask: 0 partner / 1 static / 2 nonexist
        # (reference: env_torch.py:1224-1253); the all-but-self slot map
        # matches partner_observations' OtherAgents wiring.
        ids = partner[..., 8]
        feat_sum = jnp.sum(partner[..., :6], axis=-1)
        partner_mask = jnp.where(
            other_static & (feat_sum != 0), 1, jnp.where(ids <= -1, 2, 0)
        )
    return obs, partner_mask, road_mask


@functools.partial(jax.jit, static_argnames=("params", "reward_type"))
def shaped_rewards(
    scene: Scene,
    state: SimState,
    params: Params,
    reward_type: str,
    reward_weights: jnp.ndarray,
    world_time_steps: jnp.ndarray,
):
    """Python-side reward shaping (reference: env_torch.py:469-604)."""
    off_road = state.collided_road.astype(jnp.float32)
    collided = (state.collided_vehicle + state.collided_non_vehicle).astype(
        jnp.float32
    )
    goal = state.reached_goal.astype(jnp.float32)
    if reward_type == "sparse_on_goal_achieved":
        return state.reward
    w = reward_weights  # [W, A, 3] = (collision, goal_achieved, off_road)
    r = w[..., 0] * collided + w[..., 1] * goal + w[..., 2] * off_road
    if reward_type == "distance_to_logs":
        t = jnp.clip(world_time_steps, 0, C.TRAJECTORY_LEN - 1)
        log_pos = jnp.take_along_axis(
            scene.agents.traj_pos, t[:, None, None, None], axis=2
        )[:, :, 0]
        dist = jnp.linalg.norm(log_pos - state.pos, axis=-1)
        r = r + 0.01 * jnp.exp(-dist)
    return r


@functools.partial(jax.jit, static_argnames="params")
def _step_with_indices(
    scene: Scene,
    state: SimState,
    world_time_steps: jnp.ndarray,
    idx: jnp.ndarray,
    table: jnp.ndarray,
    params: Params,
):
    """Fused: index->value lookup + sim step + world-clock update
    (reference: env_torch.py:606-664 plus the megakernel launch)."""
    idx = jnp.clip(jnp.nan_to_num(idx).astype(jnp.int32), 0, table.shape[0] - 1)
    vals = table[idx]
    act = jnp.zeros(idx.shape + (C.ACTION_DIM,), jnp.float32)
    act = act.at[..., :3].set(vals)
    state = stepmod.step(scene, state, act, params)
    any_done = jnp.any((state.done != 0) & scene.agents.valid, axis=1)
    wts = jnp.where(any_done, world_time_steps, world_time_steps + 1)
    return state, wts


@functools.partial(jax.jit, static_argnames="params")
def _step_with_values(
    scene: Scene,
    state: SimState,
    world_time_steps: jnp.ndarray,
    act: jnp.ndarray,
    params: Params,
):
    pad = C.ACTION_DIM - act.shape[-1]
    if pad:
        act = jnp.concatenate(
            [act, jnp.zeros(act.shape[:-1] + (pad,), act.dtype)], axis=-1
        )
    state = stepmod.step(scene, state, act.astype(jnp.float32), params)
    any_done = jnp.any((state.done != 0) & scene.agents.valid, axis=1)
    wts = jnp.where(any_done, world_time_steps, world_time_steps + 1)
    return state, wts


@jax.jit
def _stack_obs(prev: jnp.ndarray, obs: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([prev[..., obs.shape[-1] :], obs], axis=-1)


# Tiny jitted helpers: eager op dispatch is pathologically slow in some CPU
# environments (first-kernel compiles of ~100s), so every device-array
# manipulation goes through jit.
_dones_f32 = jax.jit(lambda done: done.astype(jnp.float32))
_zero_where = jax.jit(lambda mask, x: jnp.where(mask, 0, x))
_slice_t = jax.jit(lambda x, t: jax.lax.dynamic_index_in_dim(x, t, 2, False))


@jax.jit
def _infos(scene: Scene, state: SimState):
    return {
        "off_road": state.collided_road,
        "collided": state.collided_vehicle + state.collided_non_vehicle,
        "goal_achieved": state.reached_goal,
        "type": jnp.where(scene.agents.valid, scene.agents.etype, 0),
    }


@functools.partial(jax.jit, static_argnames="model")
def _expert_actions(scene: Scene, model: str):
    """Inverse/log actions with per-model clamps, padded to the 10-float
    union rows (reference: env_torch.py:1445-1509)."""
    ag = scene.agents
    inv = ag.traj_inv_actions[..., :3]
    if model == "delta_local":
        a3 = jnp.stack(
            [
                jnp.clip(inv[..., 0], -6, 6),
                jnp.clip(inv[..., 1], -6, 6),
                jnp.clip(inv[..., 2], -jnp.pi, jnp.pi),
            ],
            axis=-1,
        )
    elif model == "state":
        a3 = None
    else:  # classic | bicycle
        a3 = jnp.stack(
            [
                jnp.clip(inv[..., 0], -6, 6),
                jnp.clip(inv[..., 1], -0.3, 0.3),
                inv[..., 2],
            ],
            axis=-1,
        )
    if model == "state":
        full = jnp.concatenate(
            [
                ag.traj_pos,
                jnp.ones(ag.traj_pos.shape[:-1] + (1,)),
                ag.traj_yaw[..., None],
                ag.traj_vel,
                jnp.zeros(ag.traj_pos.shape[:-1] + (4,)),
            ],
            axis=-1,
        )
    else:
        full = jnp.concatenate(
            [a3, jnp.zeros(a3.shape[:-1] + (C.ACTION_DIM - 3,), a3.dtype)],
            axis=-1,
        )
    return full, ag.traj_pos, ag.traj_vel, ag.traj_yaw, ag.traj_valid


def expert_log_playback(scene, state, world_time_steps, params, model, k):
    """Advance ``state`` by ``k`` steps of expert log playback starting at
    absolute trajectory time 0 (reference: env_torch.py:1274-1293).  Shared
    by the env's reset warmup and the PPO trainer's auto-reset target."""
    expert_actions = _expert_actions(scene, model)[0]
    for t in range(k):
        state, world_time_steps = _step_with_values(
            scene, state, world_time_steps,
            _slice_t(expert_actions, t), params,
        )
    return state, world_time_steps


class GPUDriveTPUEnv:
    """Batched multi-world driving env with the reference's API surface
    (reset / step_dynamics / get_obs / get_rewards / get_dones / get_infos /
    swap_data_batch / get_expert_actions), reference:
    gpudrive/env/env_torch.py:41-130."""

    def __init__(
        self,
        config: EnvConfig,
        data_loader: Optional[SceneDataLoader] = None,
        scene_paths: Optional[List[str]] = None,
        max_roads: Optional[int] = None,
        render_config=None,
    ):
        self.config = config
        self.render_config = render_config
        self.params = config.sim_params()
        self.data_loader = data_loader
        if scene_paths is None:
            assert data_loader is not None, "need data_loader or scene_paths"
            self.data_iterator = iter(data_loader)
            scene_paths = next(self.data_iterator)
        else:
            self.data_iterator = iter(data_loader) if data_loader else None
        self.scene_paths = scene_paths
        self.num_worlds = len(scene_paths)
        self.episode_len = C.EPISODE_LEN

        self.scene: Scene = build_scene(
            scene_paths, self.params, max_roads,
            max_agents=config.agent_bucket,
        )
        self._max_roads = self.scene.max_roads
        # bucketed agent axis (== 128 unless config.agent_bucket)
        self.max_agent_count = int(self.scene.agents.valid.shape[1])

        # disable_classic_obs skips ego/partner/roadmap collection entirely
        # (the reference's 2x-faster lidar-only mode,
        # gpudrive/env/config.py:39-42)
        classic = not config.disable_classic_obs
        self.spec = ObsSpec(
            ego_state=config.ego_state and classic,
            road_map_obs=config.road_map_obs and classic,
            partner_obs=config.partner_obs and classic,
            norm_obs=config.norm_obs,
            reward_conditioned=(config.reward_type == "reward_conditioned"),
        )
        # VBD integration (reference: env_torch.py:132-245): predicted
        # global trajectories [W, A, T, 5]; populated by
        # set_vbd_trajectories() from any TrajectorySource.
        self.vbd_trajectories = None
        self._vbd_obs_dim = (
            C.TRAJECTORY_LEN * 5 if config.use_vbd and config.vbd_in_obs else 0
        )
        self.observation_dim = (
            self.spec.obs_dim + self._vbd_obs_dim
        ) * config.num_stack

        self._build_action_table()
        self._build_spaces()
        self._reset_fn = jax.jit(stepmod.reset, static_argnames="params")
        self._step_fn = jax.jit(stepmod.step, static_argnames="params")

        self._rng = np.random.default_rng(config.seed)
        self.reward_weights = self._default_reward_weights()
        self.world_time_steps = jnp.zeros(self.num_worlds, jnp.int32)
        self.state: SimState = None
        self.stacked_obs = None
        self.partner_mask = None
        self.road_mask = None
        self.reset()

    # ----- setup ---------------------------------------------------------

    def _build_action_table(self):
        """Discrete action grids as a [n_actions, 3] lookup table, cartesian
        product in the reference's order (env_torch.py:666-724)."""
        cfg = self.config
        if cfg.dynamics_model in ("classic", "bicycle"):
            grids = (cfg.accel_actions, cfg.steer_actions, cfg.head_tilt_actions)
        elif cfg.dynamics_model == "delta_local":
            grids = (cfg.dx, cfg.dy, cfg.dyaw)
        else:
            self.action_keys = None
            self.action_space_n = 1
            return
        a, b, c = np.meshgrid(*grids, indexing="ij")
        table = np.stack([a.ravel(), b.ravel(), c.ravel()], axis=-1)
        self.action_keys = jnp.asarray(table, jnp.float32)
        self.action_space_n = len(table)
        self.action_key_to_values = {
            i: [float(v) for v in row] for i, row in enumerate(table)
        }

    def _build_spaces(self):
        """gymnasium spaces over the single-agent view
        (reference: env_torch.py constructor + _set_discrete_action_space)."""
        try:
            import gymnasium
        except ImportError:  # pragma: no cover
            self.observation_space = None
            self.action_space = None
            return
        self.observation_space = gymnasium.spaces.Box(
            low=-np.inf, high=np.inf,
            shape=(self.observation_dim,), dtype=np.float32,
        )
        if self.action_keys is not None:
            self.action_space = gymnasium.spaces.Discrete(self.action_space_n)
        else:  # state dynamics: continuous 10-dim action rows
            self.action_space = gymnasium.spaces.Box(
                low=-np.inf, high=np.inf, shape=(C.ACTION_DIM,),
                dtype=np.float32,
            )

    def _default_reward_weights(self) -> jnp.ndarray:
        cfg = self.config
        if cfg.reward_type == "reward_conditioned":
            return self._sample_reward_weights()
        w = np.broadcast_to(
            np.array(
                [cfg.collision_weight, cfg.goal_achieved_weight, cfg.off_road_weight],
                np.float32,
            ),
            (self.num_worlds, self.max_agent_count, 3),
        )
        return jnp.asarray(w)

    # Reward-conditioning presets (reference: env_torch.py:247-401).
    _PRESETS = {
        "cautious": (0.9, 0.7, 0.9),
        "aggressive": (0.5, 0.9, 0.6),
        "risk_taker": (0.3, 1.0, 0.4),
    }

    def _sample_reward_weights(
        self, condition_mode: str | None = None, agent_type=None
    ) -> jnp.ndarray:
        """Per-agent (collision, goal, off_road) weights
        (reference: env_torch.py:247-401): condition_mode 'random' samples
        within the configured bounds; 'preset' scales the bounds by the named
        profile; 'fixed' broadcasts a given 3-vector."""
        cfg = self.config
        mode = condition_mode or cfg.condition_mode
        lo = np.array(
            [cfg.collision_weight_lb, cfg.goal_achieved_weight_lb, cfg.off_road_weight_lb]
        )
        hi = np.array(
            [cfg.collision_weight_ub, cfg.goal_achieved_weight_ub, cfg.off_road_weight_ub]
        )
        if mode == "fixed":
            if agent_type is None:
                raise ValueError(
                    "condition_mode='fixed' requires agent_type=[c, g, o] "
                    "weights (reference: env_torch.py:376-381)"
                )
            w = np.broadcast_to(
                np.asarray(agent_type, np.float32),
                (self.num_worlds, self.max_agent_count, 3),
            )
        elif mode == "preset":
            name = agent_type if isinstance(agent_type, str) else "balanced"
            if name == "balanced":
                vec = (lo + hi) / 2.0
            else:
                s = self._PRESETS[name]
                vec = np.array([lo[0] * s[0], hi[1] * s[1], lo[2] * s[2]])
            w = np.broadcast_to(
                vec.astype(np.float32),
                (self.num_worlds, self.max_agent_count, 3),
            )
        else:  # random
            w = self._rng.uniform(
                lo, hi, (self.num_worlds, self.max_agent_count, 3)
            )
        return jnp.asarray(w, jnp.float32)

    # ----- core API ------------------------------------------------------

    @property
    def cont_agent_mask(self) -> jnp.ndarray:
        return self.scene.agents.controlled

    def get_controlled_agents_mask(self):
        return np.asarray(self.scene.agents.controlled)

    def reset(
        self,
        env_idx_list: Optional[List[int]] = None,
        condition_mode: Optional[str] = None,
        agent_type=None,
    ):
        """(Re)generate worlds; per-world partial reset supported
        (reference: env_torch.py:403-451)."""
        if env_idx_list is None or self.state is None:
            self.state = self._reset_fn(self.scene, None, self.params)
            self.world_time_steps = jnp.zeros(self.num_worlds, jnp.int32)
        else:
            mask = np.zeros(self.num_worlds, bool)
            mask[np.asarray(env_idx_list)] = True
            jmask = jnp.asarray(mask)
            self.state = self._reset_fn(self.scene, self.state, self.params, jmask)
            self.world_time_steps = _zero_where(jmask, self.world_time_steps)
        if self.config.reward_type == "reward_conditioned":
            fresh_w = self._sample_reward_weights(condition_mode, agent_type)
            if env_idx_list is None or self.reward_weights is None:
                self.reward_weights = fresh_w
            else:
                # only re-condition the reset worlds
                # (reference: env_torch.py _set_reward_weights(env_idx_list))
                wmask = np.zeros(self.num_worlds, bool)
                wmask[np.asarray(env_idx_list)] = True
                self.reward_weights = jnp.asarray(
                    np.where(
                        wmask[:, None, None],
                        np.asarray(fresh_w),
                        np.asarray(self.reward_weights),
                    )
                )
        if self.config.init_steps > 0:
            self.advance_sim_with_log_playback(self.config.init_steps)
        return self.get_obs(reset=True)

    def step_dynamics(self, actions):
        """reference: env_torch.py:606-613.  ``actions`` may be [W, A] (or
        [W, A, 1]) discrete indices, or [W, A, <=10] raw action values."""
        A = self.max_agent_count
        if actions is None:
            actions = jnp.zeros(
                (self.num_worlds, A, C.ACTION_DIM), jnp.float32
            )
        actions = jnp.asarray(actions)
        if actions.shape[1] > A:  # full-128 ABI callers: rows >= A are pads
            actions = actions[:, :A]
        is_index = self.action_keys is not None and (
            actions.ndim == 2
            or (actions.ndim == 3 and actions.shape[-1] == 1)
        )
        if is_index:
            self.state, self.world_time_steps = _step_with_indices(
                self.scene,
                self.state,
                self.world_time_steps,
                actions.reshape(self.num_worlds, -1),
                self.action_keys,
                self.params,
            )
        else:
            self.state, self.world_time_steps = _step_with_values(
                self.scene,
                self.state,
                self.world_time_steps,
                actions,
                self.params,
            )

    def set_vbd_trajectories(self, source_or_array):
        """Install predicted trajectories ([W, A, T, 5] array or a
        TrajectorySource callable; see gpudrive_lab_tpu.vbd.integration)."""
        if callable(source_or_array):
            self.vbd_trajectories = source_or_array(self.scene, self.state)
        else:
            self.vbd_trajectories = jnp.asarray(source_or_array)

    def get_obs(self, reset: bool = False) -> jnp.ndarray:
        obs, self.partner_mask, self.road_mask = flat_observation(
            self.scene, self.state, self.params, self.spec, self.reward_weights
        )
        if self._vbd_obs_dim:
            from gpudrive_lab_tpu.vbd.integration import (
                egocentric_vbd_obs,
                log_replay_trajectories,
            )

            if self.vbd_trajectories is None:
                # default source until a model is installed via
                # set_vbd_trajectories()
                self.vbd_trajectories = log_replay_trajectories(
                    self.scene, self.state
                )
            obs = jnp.concatenate(
                [obs, egocentric_vbd_obs(self.state, self.vbd_trajectories)],
                axis=-1,
            )
        n = self.config.num_stack
        if n > 1:
            if reset or self.stacked_obs is None:
                self.stacked_obs = jnp.asarray(
                    np.zeros(obs.shape[:-1] + (obs.shape[-1] * n,), np.float32)
                )
            self.stacked_obs = _stack_obs(self.stacked_obs, obs)
            return self.stacked_obs
        return obs

    def get_rewards(self) -> jnp.ndarray:
        if self.config.reward_type == "distance_to_vdb_trajs":
            from gpudrive_lab_tpu.vbd.integration import vbd_distance_reward

            assert self.vbd_trajectories is not None, (
                "distance_to_vdb_trajs requires set_vbd_trajectories()"
            )
            base = shaped_rewards(
                self.scene, self.state, self.params, "weighted_combination",
                self.reward_weights, self.world_time_steps,
            )
            return base + vbd_distance_reward(
                self.state, self.vbd_trajectories, self.world_time_steps,
                self.config.vbd_trajectory_weight,
            )
        return shaped_rewards(
            self.scene,
            self.state,
            self.params,
            self.config.reward_type,
            self.reward_weights,
            self.world_time_steps,
        )

    def get_dones(self) -> jnp.ndarray:
        return _dones_f32(self.state.done)

    def get_infos(self):
        """Info columns as in the export ABI: off_road, collided(2), goal,
        type (reference: gpudrive/datatypes/info.py)."""
        return _infos(self.scene, self.state)

    def get_partner_mask(self):
        return self.partner_mask

    def get_road_mask(self):
        return self.road_mask

    def get_lidar_obs(self):
        """[W, A, 3, S, 4] lidar samples (reference:
        env_torch.py:898-924 via the lidar_tensor export)."""
        if getattr(self, "_lidar_fn", None) is None:
            from gpudrive_lab_tpu.core.lidar import lidar_observation

            self._lidar_fn = jax.jit(
                lidar_observation, static_argnames="params"
            )
        zeros = jnp.zeros(
            (self.num_worlds, self.max_agent_count, C.ACTION_DIM),
            jnp.float32,
        )
        return self._lidar_fn(self.scene, self.state, self.params, zeros)

    def get_bev_obs(self):
        """[W, A, RES, RES, 1] type-id grid (reference:
        env_torch.py:926-945 via the bev_observation_tensor export)."""
        if getattr(self, "_bev_fn", None) is None:
            from gpudrive_lab_tpu.core.bev import bev_observation

            self._bev_fn = jax.jit(bev_observation, static_argnames="params")
        return self._bev_fn(self.scene, self.state, self.params)

    def get_camera_obs(self, camera_config=None):
        """Per-agent camera tensors: (rgb [W, A, H, Wpx, 4] uint8,
        depth [W, A, H, Wpx, 1] float32) — the batch-renderer equivalent
        (reference: mgr.cpp:922-948 rgbTensor/depthTensor fed by the
        madrona batch renderer)."""
        from gpudrive_lab_tpu.core.render import CameraConfig, batch_render

        if camera_config is None:
            camera_config = CameraConfig()
        return batch_render(self.scene, self.state, camera_config)

    # ----- log playback / experts ---------------------------------------

    def get_expert_actions(self):
        """Inverse actions with per-model clamps
        (reference: env_torch.py:1445-1509).  Returns the full-horizon
        (actions [W,A,T,10], pos, vel, yaw, valids)."""
        return _expert_actions(self.scene, self.config.dynamics_model)

    def advance_sim_with_log_playback(self, init_steps: int):
        """Warm-up by stepping experts (reference: env_torch.py:1274-1293).
        Controlled agents replay their inverse actions."""
        self.state, self.world_time_steps = expert_log_playback(
            self.scene, self.state, self.world_time_steps,
            self.params, self.config.dynamics_model, init_steps,
        )

    # ----- dataset churn -------------------------------------------------

    def swap_data_batch(self, data_batch: Optional[List[str]] = None):
        """The analogue of Manager::setMaps (reference: env_torch.py:1351-1384
        -> src/mgr.cpp:590-654): recompile the Scene host-side into the same
        padded shapes and fully reset."""
        if data_batch is None:
            assert self.data_iterator is not None
            try:
                data_batch = next(self.data_iterator)
            except StopIteration:
                self.data_iterator = iter(self.data_loader)
                data_batch = next(self.data_iterator)
        assert len(data_batch) == self.num_worlds, (
            "swap requires len(data_batch) == num_worlds"
        )
        self.scene_paths = data_batch
        ab = self.config.agent_bucket
        if ab == "auto":
            ab = self.max_agent_count  # keep shapes stable across swaps
        try:
            self.scene = build_scene(
                data_batch, self.params, self._max_roads, max_agents=ab
            )
        except ValueError:
            # batch needs a bigger bucket -> recompile once
            self.scene = build_scene(
                data_batch, self.params,
                max_agents=self.config.agent_bucket,
            )
            self._max_roads = self.scene.max_roads
            self.max_agent_count = int(self.scene.agents.valid.shape[1])
        self.state = None
        self.reset()

    def remove_agents_by_id(self, perc_to_rmv_per_world: float, remove_controlled_agents: bool = True):
        """Randomly mark agents deleted and regenerate the worlds
        (reference: env_torch.py:1295-1349 -> Manager::deleteAgents)."""
        deleted: dict[int, frozenset] = {}
        mask = (
            np.asarray(self.scene.agents.controlled)
            if remove_controlled_agents
            else np.asarray(self.scene.agents.valid)
            & ~np.asarray(self.scene.agents.controlled)
        )
        aid = np.asarray(self.scene.agents.aid)
        for w in range(self.num_worlds):
            ids = aid[w][mask[w]]
            k = int(np.ceil(perc_to_rmv_per_world * len(ids)))
            if k:
                deleted[w] = frozenset(
                    self._rng.choice(ids, size=k, replace=False).tolist()
                )
        self.scene = build_scene(
            self.scene_paths, self.params, self._max_roads, deleted,
            max_agents=self.config.agent_bucket,
        )
        self.state = None
        self.reset()

    # ----- rendering -----------------------------------------------------

    @property
    def vis(self):
        """Lazy matplotlib visualizer bound to the current scene
        (reference: env_torch.py constructor wiring of MatplotlibVisualizer)."""
        if getattr(self, "_vis", None) is None or self._vis.scene is not self.scene:
            from gpudrive_lab_tpu.visualize.core import MatplotlibVisualizer

            self._vis = MatplotlibVisualizer(self.scene, self.render_config)
        return self._vis

    def render(self, env_idx: int = 0, zoom_radius: float | None = None):
        return self.vis.plot_simulator_state(
            self.state, [env_idx], zoom_radius=zoom_radius
        )[0]

    # ----- name exports --------------------------------------------------

    def get_env_filenames(self):
        names = np.asarray(self.scene.map_name)
        return {
            i: "".join(chr(c) for c in names[i] if c != 0)
            for i in range(self.num_worlds)
        }

    def get_scenario_ids(self):
        ids = np.asarray(self.scene.scenario_id)
        return {
            i: "".join(chr(c) for c in ids[i] if c != 0)
            for i in range(self.num_worlds)
        }
