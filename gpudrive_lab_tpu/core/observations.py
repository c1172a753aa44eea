"""Observation collectors.

Vectorized replacements for the reference's per-agent observation systems
(reference: src/sim.cpp:168-280, 462-555, 769-783; src/knn.hpp).  Each
function returns the exact export layout of the corresponding tensor
(reference: src/mgr.cpp:718-902, catalogued in SURVEY.md Appendix B), so the
env layer and datatype views consume identical ABI.

The K-nearest road selection replaces the reference's per-agent binary heap
with one ``top_k`` (or TPU-native ``approx_max_k``) over the [W, A, R]
distance lattice; the observation set is consumed permutation-invariantly, so
candidate order inside K is unspecified in both implementations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gpudrive_lab_tpu import constants as C
from gpudrive_lab_tpu.core.geometry import (
    quat_yaw_diff,
    rotate_into_frame,
    yaw_to_quat_wxyz,
)
from gpudrive_lab_tpu.core.types import Params, RoadObsAlgorithm, Scene, SimState


def _ego_take(x: jnp.ndarray, ego_idx) -> jnp.ndarray:
    """Gather ego rows (identity when ego_idx is None).  Two layouts:

      * [W, C] per-world index -> [W, C(, d...)] rows (world compaction);
      * (w_idx [N], a_idx [N]) tuple -> [N(, d...)] rows — FLAT cross-world
        compaction: the ego axis holds exactly the controlled agents of the
        whole batch, so wildly imbalanced worlds (e.g. 46 vs 3 controlled)
        no longer pad every world to the max (the round-3 throughput lever).

    Every observation collector is a per-ego computation, so restricting
    the ego axis shrinks the whole obs/policy path proportionally."""
    if ego_idx is None:
        return x
    if isinstance(ego_idx, tuple):
        w_idx, a_idx = ego_idx
        return x[w_idx, a_idx]
    idx = ego_idx.reshape(ego_idx.shape + (1,) * (x.ndim - 2))
    return jnp.take_along_axis(x, idx.astype(jnp.int32), axis=1)


def self_observation(
    scene: Scene, state: SimState, ego_idx=None
) -> jnp.ndarray:
    """[W, A, 8]: speed, size(3), ego-frame rel goal(2), collision, id
    (reference: src/sim.cpp:168-186; layout src/types.hpp:189-208).
    Padding rows are SelfObservation::zero() (id = -1).
    ego_idx [W, C] restricts rows to the selected ego slots."""
    agents = scene.agents
    sel = lambda x: _ego_take(x, ego_idx)
    speed = sel(state.speed)
    rel_goal = rotate_into_frame(
        sel(agents.goal) - sel(state.pos), sel(state.yaw)
    )
    obs = jnp.concatenate(
        [
            speed[..., None],
            sel(agents.size),
            rel_goal,
            (sel(state.collided) != 0).astype(jnp.float32)[..., None],
            sel(agents.aid).astype(jnp.float32)[..., None],
        ],
        axis=-1,
    )
    zero = jnp.zeros_like(obs).at[..., 7].set(-1.0)
    return jnp.where(sel(agents.valid)[..., None], obs, zero)


def partner_observations(
    scene: Scene, state: SimState, params: Params, ego_idx=None,
    with_static: bool = False,
) -> jnp.ndarray:
    """[W, A, A-1, 9]: speed, ego-frame rel pos(2), rel heading, size(3),
    type, id (reference: src/sim.cpp:188-240).  Out-of-radius partners are
    zeroed with id=-1; never-created slots get id=-2; rows of padded ego
    agents are all zero()/id=-1 (src/level_gen.cpp:322-325).

    Implementation: per-agent scalars of the *other* agent are gathered
    through the static [A, A-1] "all-but-self" index map first, then the
    9-wide features are computed directly at the packed layout — no
    [W, A, A, 9] intermediate (HBM traffic matters: this runs every step).

    ego_idx [W, C] restricts the EGO axis; partners still span all other
    agents (slot k of ego i reads agent k + (k >= i)).

    with_static=True additionally returns the other agent's raw static
    flag [W, A, A-1] bool (unmasked — the partner-mask semantics in
    env_jax.flat_observation need it even for out-of-radius slots).  It
    rides the same packed gather as a 10th channel, so callers avoid a
    second A-1-wide gather of agents.static."""
    agents = scene.agents
    A = state.pos.shape[1]
    esel = lambda x: _ego_take(x, ego_idx)

    # Slot k of ego i reads agent k + (k >= i)
    # (the OtherAgents wiring, src/level_gen.cpp:450-464).
    # TPU formulation: the all-but-self view is TWO STATIC SLICES blended by
    # k < i — where(k < i, x[:A-1], x[1:]) — instead of a per-element gather
    # (dynamic small-slice gathers run ~2 elem/cycle on TPU; this select is
    # pure bandwidth).  Bitwise-identical to the gather in all layouts.
    k = jnp.arange(A - 1)

    if ego_idx is None:

        def take(x):  # [W, A, d] -> [W, A, A-1, d]
            keep = (k[None, :] < jnp.arange(A)[:, None])[None, ..., None]
            return jnp.where(keep, x[:, None, : A - 1], x[:, None, 1:])

    elif isinstance(ego_idx, tuple):
        w_idx, a_idx = ego_idx

        def take(x):  # [W, A, d] -> [N, A-1, d]
            full = x[w_idx]  # [N, A, d] block row gather
            keep = (k[None, :] < a_idx[:, None])[..., None]  # [N, A-1, 1]
            return jnp.where(keep, full[:, : A - 1], full[:, 1:])

    else:

        def take(x):  # [W, A, d] -> [W, C, A-1, d]
            keep = (k[None, None, :] < ego_idx[..., None])[..., None]
            return jnp.where(keep, x[:, None, : A - 1], x[:, None, 1:])

    # ONE packed gather instead of six per-attribute gathers: each gather is
    # its own (slow) HLO on TPU, and the gathered values are small ints/floats
    # that are exact in f32, so packing first changes nothing numerically.
    cols = [
        state.pos,                                    # 0:2
        state.speed[..., None],                       # 2
        state.yaw[..., None],                         # 3
        agents.size,                                  # 4:7
        agents.etype.astype(jnp.float32)[..., None],  # 7
        agents.aid.astype(jnp.float32)[..., None],    # 8
    ]
    if with_static:
        cols.append(agents.static.astype(jnp.float32)[..., None])  # 9
    packed = jnp.concatenate(cols, axis=-1)  # [W, A, 9(+1)]
    sel_p = take(packed)
    o_pos = sel_p[..., 0:2]
    o_speed = sel_p[..., 2]
    o_yaw = sel_p[..., 3]
    o_size = sel_p[..., 4:7]
    o_type = sel_p[..., 7]
    o_id = sel_p[..., 8]

    rel_ego = rotate_into_frame(
        o_pos - esel(state.pos)[..., None, :], esel(state.yaw)[..., None]
    )
    dist = jnp.linalg.norm(rel_ego, axis=-1)
    rel_heading = quat_yaw_diff(esel(state.yaw)[..., None], o_yaw)

    obs = jnp.concatenate(
        [
            o_speed[..., None],
            rel_ego,
            rel_heading[..., None],
            o_size,
            o_type[..., None],
            o_id[..., None],
        ],
        axis=-1,
    )  # [W, A, A-1, 9]

    in_radius = dist <= params.observation_radius
    obs = jnp.where(in_radius[..., None], obs, 0.0)

    # Existing-slot predicate: slot k valid iff k < numAgents-1 for real egos
    # (src/sim.cpp:199,236-239).
    if isinstance(ego_idx, tuple):
        exists = k[None, :] < (scene.num_agents[ego_idx[0]][:, None] - 1)
    else:
        exists = k[None, None, :] < (scene.num_agents[:, None, None] - 1)

    id_col = jnp.where(
        exists, jnp.where(in_radius, obs[..., 8], -1.0), -2.0
    )
    obs = jnp.where(exists[..., None], obs, 0.0)
    obs = obs.at[..., 8].set(id_col)

    # Padded ego rows: PartnerObservation::zero() everywhere (id = -1).
    ego_valid = esel(agents.valid)[..., None, None]
    zero_row = jnp.zeros(9, jnp.float32).at[8].set(-1.0)
    obs = jnp.where(ego_valid, obs, zero_row)
    if with_static:
        return obs, sel_p[..., 9] > 0.5
    return obs


def _packed_road_columns(roads) -> jnp.ndarray:
    """[W, R, 10] attribute pack: pos(2), scale(3), yaw, type, id, mapType,
    valid.  ONE packed gather of this beats six per-attribute gathers (each
    gather is its own slow HLO on TPU; measured ~55 ms of the W=64 obs
    path), and the values are small ints/floats exact in f32."""
    return jnp.concatenate(
        [
            roads.pos[..., 0:2],                           # 0:2
            roads.scale,                                   # 2:5
            roads.yaw[..., None],                          # 5
            roads.etype.astype(jnp.float32)[..., None],    # 6
            roads.rid.astype(jnp.float32)[..., None],      # 7
            roads.map_type.astype(jnp.float32)[..., None], # 8
            roads.valid.astype(jnp.float32)[..., None],    # 9
        ],
        axis=-1,
    )


def _dot_gather_rows(packed, idx, w_idx=None):
    """MXU one-hot matmul gather of the [..., K] winners' packed columns.

    TPU element gathers retire ~2 elem/cycle; expressing the same selection
    as one-hot [.., K, R] x packed [.., R, 10] rides the MXU instead.  XLA
    fuses the iota-compare one-hot into the dot operand (VMEM tiles only),
    so the ONE-HOT never hits HBM K*R-wide.  EXACT in f32/HIGHEST: each
    output element is a sum with exactly one nonzero term (1.0 * value).

    Large-R caveat (flat path): w_idx selection materializes
    pw = packed[w_idx] as [N, R, 10] f32 — at flat N in the thousands with
    the forced R=10240 bucket that is GBs per obs step.  Benched faster at
    the production config (R<=2560, N=4096: 3.19 vs 4.57 ms), but expect it
    to regress or OOM at large R; prefer road_gather="take" there (the
    bench/train flag help says the same)."""
    R = packed.shape[1]
    oh = (idx[..., None] == jnp.arange(R, dtype=jnp.int32)).astype(jnp.float32)
    if w_idx is not None:
        pw = packed[w_idx]  # [N, R, 10] contiguous block-row gather
        return jax.lax.dot_general(
            oh, pw, (((2,), (1,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )  # [N, K, 10]
    # per-world layout [W, A, K, R] x [W, R, 10] -> batch dim W
    return jax.lax.dot_general(
        oh, packed, (((3,), (1,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # [W, A, K, 10]


def _gather_road_features(packed, idx, ego_pos, ego_yaw, w_idx=None,
                          method: str = "take"):
    """Gather-then-compute: fetch the [..., K] winners' packed columns and
    only then build the 9-wide ego-frame MapObservation features — the
    [..., R] lattice never materializes 9-wide (the bandwidth hot spot
    flagged in SURVEY.md §7).  Ego axes: [W, A] per-world (w_idx None) or
    flat [N] (w_idx [N] selects each ego's world rows).  Returns
    (features [..., K, 9], world-frame d2 [..., K], valid flag [..., K])."""
    if method == "dot":
        sel_p = _dot_gather_rows(packed, idx, w_idx)
    else:
        # Flat single-index-vector row gather: measurably faster than the
        # 2-D advanced-index form on TPU (probe_gather_variants.py: 7.32 ->
        # 6.44 ms/step at the peak config), same elements bitwise.
        W, R = packed.shape[0], packed.shape[1]
        flat = packed.reshape(W * R, packed.shape[2])
        if w_idx is not None:
            sel_p = flat[w_idx[:, None] * R + idx]  # [N, K, 10]
        else:
            w_of = jnp.arange(W).reshape((W,) + (1,) * (idx.ndim - 1))
            sel_p = flat[w_of * R + idx]  # [W, A, K, 10]
    rel = sel_p[..., 0:2] - ego_pos[..., None, :]
    rel_ego = rotate_into_frame(rel, ego_yaw[..., None])
    heading = quat_yaw_diff(ego_yaw[..., None], sel_p[..., 5])
    sel = jnp.concatenate(
        [
            rel_ego,
            sel_p[..., 2:5],
            heading[..., None],
            sel_p[..., 6:9],
        ],
        axis=-1,
    )
    sel_d2 = jnp.sum(rel * rel, axis=-1)
    return sel, sel_d2, sel_p[..., 9] > 0.5


def agent_map_observations(
    scene: Scene, state: SimState, params: Params, ego_idx=None
) -> jnp.ndarray:
    """[W, A, K, 9] ego-frame road observations.  ego_idx [W, C] restricts
    the ego axis (the [W, A, R] distance lattice — the expensive part —
    shrinks to [W, C, R]).

    KNEAREST: K nearest road entities by ego distance, then radius filter and
    zero fill (reference: src/knn.hpp:103-158).  The reference's KNN filler
    zeroes id/mapType (knn.hpp:19-28), unlike MapObservation::zero().
    Selection runs on squared world distances only; the 9-wide ego-frame
    features are computed AFTER gathering the K winners, so the [W, A, R]
    lattice never materializes 9-wide (the bandwidth hot spot flagged in
    SURVEY.md §7).

    LINEAR: first K entities (by index) within the radius, zero-filled with
    MapObservation::zero() — id/mapType = -1 (reference: src/sim.cpp:259-280).
    """
    K = C.MAX_AGENT_MAP_OBS
    roads = scene.roads
    ego_pos = _ego_take(state.pos, ego_idx)
    ego_yaw = _ego_take(state.yaw, ego_idx)
    ego_valid = _ego_take(scene.agents.valid, ego_idx)
    if isinstance(ego_idx, tuple):
        w_idx = ego_idx[0]
        road_valid = roads.valid[w_idx]                    # [N, R]
        road_pos = roads.pos[w_idx, :, 0:2]                # [N, R, 2]
    else:
        w_idx = None
        road_valid = roads.valid[:, None, :]               # [W, 1, R]
        road_pos = roads.pos[:, None, :, 0:2]              # [W, 1, R, 2]

    if params.road_obs_algorithm == RoadObsAlgorithm.KNEAREST:
        delta = road_pos - ego_pos[..., None, :]
        d2 = jnp.sum(delta * delta, axis=-1)  # [..., R]
        score = jnp.where(road_valid, d2, jnp.inf)
        # Fewer road entities than K: take them all and zero-fill
        # (reference: src/knn.hpp:122-126).
        K_eff = min(K, score.shape[-1])
        if params.approx_top_k and K_eff == K:
            _, idx = jax.lax.approx_max_k(-score, K_eff, recall_target=0.99)
        else:
            _, idx = jax.lax.top_k(-score, K_eff)
        if K_eff < K:
            idx = jnp.concatenate(
                [idx, jnp.zeros(idx.shape[:-1] + (K - K_eff,), idx.dtype)],
                axis=-1,
            )

        sel, sel_d2, sel_valid = _gather_road_features(
            _packed_road_columns(roads), idx, ego_pos, ego_yaw, w_idx,
            method=params.road_gather,
        )
        if K_eff < K:
            pad = jnp.arange(K) >= K_eff
            sel_valid = sel_valid & ~pad
        keep = sel_valid & (sel_d2 <= params.observation_radius**2)
        # KNN filler: all-zero row including id/mapType (knn.hpp:19-28).
        out = jnp.where(keep[..., None], sel, 0.0)
    else:
        # LINEAR: slot j gets the (j+1)-th within-radius entity, in entity
        # order (src/sim.cpp:259-280).  TPU-first formulation: top_k over
        # index keys — key[r] = r if within-radius else R, so the K smallest
        # keys ARE the first K within indices in entity order — then one
        # packed gather of the winners.
        # (The original scatter-into-K+1-buckets formulation cost ~450 ms
        # per step at W=64 on TPU and materialized the 9-wide [W, A, R]
        # feature lattice; a dense [K, R] rank comparison-reduction fixed
        # that but still scaled as K*R — ~50 ms/step at W=256.  top_k is
        # R log R and measures at the dispatch floor.)
        delta = road_pos - ego_pos[..., None, :]
        d2 = jnp.sum(delta * delta, axis=-1)  # [..., R]
        within = road_valid & (d2 <= params.observation_radius**2)
        R = d2.shape[-1]
        key = jnp.where(within, jnp.arange(R, dtype=jnp.int32), R)
        K_eff = min(K, R)
        neg, _ = jax.lax.top_k(-key, K_eff)
        idx = -neg  # [..., K_eff] ascending; == R past the within count
        if K_eff < K:
            idx = jnp.concatenate(
                [idx, jnp.full(idx.shape[:-1] + (K - K_eff,), R, idx.dtype)],
                axis=-1,
            )
        filled = idx < R
        idx = jnp.where(filled, idx, 0)
        sel, _, _ = _gather_road_features(
            _packed_road_columns(roads), idx, ego_pos, ego_yaw, w_idx,
            method=params.road_gather,
        )
        # Linear filler: MapObservation::zero() has id=-1, mapType=-1.
        filler = jnp.zeros(9, jnp.float32).at[7].set(-1.0).at[8].set(-1.0)
        out = jnp.where(filled[..., None], sel, filler)

    # Padded ego agents: MapObservation::zero() rows
    # (src/level_gen.cpp:315-318).
    pad_filler = jnp.zeros(9, jnp.float32).at[7].set(-1.0).at[8].set(-1.0)
    return jnp.where(ego_valid[..., None, None], out, pad_filler)


def map_observation(scene: Scene) -> jnp.ndarray:
    """[W, R, 9] world-frame (demeaned) MapObservation rows — the per-road
    static export (reference: src/level_gen.hpp:59-65, mgr.cpp map_observation
    export).  Padding rows are MapObservation::zero()."""
    roads = scene.roads
    feats = jnp.concatenate(
        [
            roads.pos[..., 0:2],
            roads.scale,
            roads.yaw[..., None],
            roads.etype.astype(jnp.float32)[..., None],
            roads.rid.astype(jnp.float32)[..., None],
            roads.map_type.astype(jnp.float32)[..., None],
        ],
        axis=-1,
    )
    filler = jnp.zeros(9, jnp.float32).at[7].set(-1.0).at[8].set(-1.0)
    return jnp.where(roads.valid[..., None], feats, filler)


def absolute_self_observation(scene: Scene, state: SimState) -> jnp.ndarray:
    """[W, A, 14]: pos(3), quat wxyz(4), yaw, goal(2), size(3), id
    (reference: src/sim.cpp:769-783; src/types.hpp:389-406)."""
    agents = scene.agents
    quat = yaw_to_quat_wxyz(state.yaw)
    obs = jnp.concatenate(
        [
            state.pos,
            state.z[..., None],
            quat,
            state.yaw[..., None],
            agents.goal,
            agents.size,
            agents.aid.astype(jnp.float32)[..., None],
        ],
        axis=-1,
    )
    return jnp.where(agents.valid[..., None], obs, 0.0)
