"""On-device PPO.

TPU-native replacement for the reference's PufferLib/CleanRL PPO
(reference: gpudrive/integrations/puffer/ppo.py).  The entire
rollout -> GAE -> minibatch-update iteration is one jit-compiled program:

  * rollout: ``lax.scan`` over env steps with the policy forward fused into
    the same XLA program as the simulator step — actor and learner never
    leave the chip (the reference round-trips rollouts through CPU numpy,
    ppo.py:568-573, and runs GAE in Cython; here GAE is a reverse scan).
  * auto-reset: worlds whose agents are all done blend back to the
    precomputed post-reset state inside the scan ("reset-as-select").
  * update: epochs x minibatches over the time axis (the world/agent axes
    stay sharded across devices under pjit; gradients all-reduce over the
    mesh automatically).

Hyperparameter defaults mirror baselines/ppo/config/ppo_base_puffer.yaml.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gpudrive_lab_tpu import constants as C
from gpudrive_lab_tpu.core import step as stepmod
from gpudrive_lab_tpu.core.types import Params, Scene, SimState
from gpudrive_lab_tpu.env.env_jax import ObsSpec, flat_observation
from gpudrive_lab_tpu.networks.late_fusion import (
    LateFusionPolicy,
    PolicyConfig,
    sample_logits,
)


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    """reference: ppo_base_puffer.yaml `train:` section."""

    rollout_len: int = 32
    learning_rate: float = 3e-4
    gamma: float = 0.99
    gae_lambda: float = 0.95
    update_epochs: int = 4
    num_minibatches: int = 4
    norm_adv: bool = True
    clip_coef: float = 0.2
    clip_vloss: bool = False
    vf_clip_coef: float = 0.2
    ent_coef: float = 1e-4
    vf_coef: float = 0.3
    max_grad_norm: float = 0.5
    # World-clock value the in-graph auto-reset restores.  Non-zero when
    # the env warms episodes up with init_steps of expert log playback
    # (reference: env_torch.py:403-451 + ppo_base_puffer.yaml init_steps=11);
    # the blended `fresh` state must then be the t=init_steps state and the
    # log-indexed reward shaping must restart its clock there too.
    reset_time_step: int = 0
    # Store per-step SimStates in the rollout and REMATERIALIZE flat
    # observations inside the update instead of storing them.  The obs
    # tensor dominates rollout memory ([T, W, A, 3368] f32 = 7 GB at
    # W=128, T=32 — an HBM OOM); the SimState is ~260x smaller and the obs
    # recompute is ~140 us/step.  Classic remat: trade FLOPs for HBM.
    # Alternative when HBM allows: remat_obs=False + obs_store_dtype=
    # "bfloat16" stores the obs tensor at half size and skips the
    # update's epochs-many obs recomputes entirely.
    remat_obs: bool = True
    obs_store_dtype: str = "float32"  # "bfloat16" halves rollout obs HBM
    # Obs-store layout (remat_obs=False only).  "flat" stores the single
    # concatenated [T, N, 3368] vector; "split" stores the three modality
    # buffers (ego [T, N, E] / partner [T, N, 127, 6] / road [T, N, 200, 13])
    # and feeds LateFusionPolicy's pre-split apply path — minibatch slices
    # then skip the flat-3368 unpack (misaligned slice + two reshape
    # relayouts) that probe_epoch_anatomy bisected inside each update
    # minibatch.  Bitwise-identical to "flat" (concat-then-slice is the
    # identity on each modality block).
    obs_store: str = "flat"  # "flat" | "split"
    # Learner compaction: restrict the obs/policy/GAE path to the first
    # `compact` controlled slots per world (0 = dense over all A=128 padded
    # slots).  compact_mode="flat" instead uses ONE flat cross-world agent
    # axis of `compact` rows holding exactly the batch's controlled agents
    # (in (world, slot) order) — the right layout when per-world controlled
    # counts are imbalanced (example WOMD batch: [5, 8, 46, 3] controlled
    # per world; per-world compaction pads every world to the max).  Real WOMD worlds control ~10-40 agents, so compact=64 cuts
    # the learner's compute by 2-7x with identical semantics (uncontrolled
    # rows never contribute: mask already excluded them, and step() ignores
    # their actions).  Worlds with more controlled agents than `compact`
    # would silently drop the overflow — keep it >= the scene max.
    # NOTE multi-chip: flat compaction gathers agents ACROSS worlds, so a
    # world-sharded mesh would turn every flat gather into a cross-device
    # all-gather.  Use compact_mode="world" when sharding worlds over a
    # mesh (the dryrun does); "flat" is the single-chip fast path.
    compact: int = 0
    compact_mode: str = "world"  # "world" [W, C] | "flat" [N] ego axis
    # Block-local flat compaction (the multi-chip flat fast path): partition
    # the W worlds into `compact_blocks` contiguous groups and select
    # compact//blocks controlled rows from each group's worlds only (each
    # block pads with its own first uncontrolled slots).  Row i of the flat
    # [N] axis then depends only on worlds in block i*blocks//N — with
    # compact_blocks == mesh size and worlds sharded over the mesh, every
    # flat gather stays device-local instead of becoming a cross-device
    # all-gather.  0/1 = global single-chip selection (round-3 behavior).
    compact_blocks: int = 0
    # Trace the rollout/GAE/update loops as STRAIGHT-LINE code (python loops
    # inside the jit) instead of lax.scan.  On the axon remote-TPU runtime,
    # While-loop programs execute ~200x slower than the identical unrolled
    # body (measured round 1 for the sim loop, round 2 for the train step:
    # scan-mode train at W=64 ran 29.6 s/iter warm while the summed body
    # compute is ~0.3 s).  Unrolling trades a bigger one-time XLA compile
    # (persistently cached) for a single-dispatch, While-free program.
    unroll: bool = False
    # Policy compute dtype: "bfloat16" runs the embedding/head GEMMs on the
    # MXU at full rate (~8x f32 on v5e) with f32 params and f32 logits/value
    # outputs (the flax module casts at the boundary).  The update phase is
    # GEMM-bound (road embed alone is ~180 GFLOP per 16K-sample minibatch),
    # so this is the main post-scatter-fix throughput lever.
    policy_dtype: str = "float32"
    # Rematerialize the partner/road embed+pool blocks in the update's
    # backward pass (PolicyConfig.embed_remat): the [B, E, 64] embedding
    # activations — the dominant HBM traffic of a minibatch segment — are
    # recomputed from the raw obs instead of stored.  Bitwise-identical
    # gradients (tests/test_policy_embed_remat).
    embed_remat: bool = False
    # Route the policy's partner/road embed+pool through the Pallas fused
    # kernel (networks/fused_embed.py): obs read once, pooled [B, 64] row
    # written, the [B, E, 64] activation lattice never in HBM — in fwd OR
    # bwd.  Safe here because obs are data (no gradient flows into them).
    fused_embed: bool = False
    # Row-axis minibatch slicing (flat compaction only): cut each minibatch
    # to `minibatch_rows` agents of the flat [N] axis in addition to the
    # time slice, so minibatch HBM stays bounded as W grows (the W>=1024
    # unlock — time slices alone bottom out at [1, N] = one full env step).
    # num_minibatches stays the TOTAL per epoch: it must be divisible by
    # G = N // minibatch_rows, and num_minibatches // G must divide
    # rollout_len.  0 = whole-row minibatches (time slicing only).
    minibatch_rows: int = 0
    # Shuffle the batch's time axis ONCE per epoch (one-hot matmul for the
    # obs store — exact: every output element is a single 1.0*value term)
    # and cut minibatches as CONTIGUOUS slices of the shuffled batch.
    # Sample composition, visit order, and per-minibatch rng are identical
    # to the per-minibatch jnp.take path — but the take was an
    # element-rate-limited TPU gather repeated M x epochs times over the
    # obs store, measured at ~60% of the whole train iteration (round 4).
    epoch_preshuffle: bool = False


# Leaves at least this large route the epoch-preshuffle through the one-hot
# dot_general instead of jnp.take (module-level so tests can lower it to
# force the matmul branch on small fixtures).
PRESHUFFLE_DOT_MIN_ELEMS = 1 << 20


class Transition(NamedTuple):
    obs: Any  # [W, A, D] flat obs, or None when PPOConfig.remat_obs
    action: jnp.ndarray  # [W, A] int32
    logprob: jnp.ndarray  # [W, A]
    value: jnp.ndarray  # [W, A]
    reward: jnp.ndarray  # [W, A]
    done: jnp.ndarray  # [W, A] (post-step)
    mask: jnp.ndarray  # [W, A] valid training sample (controlled & alive)
    # per-world episode outcomes, populated on the step a world finishes
    # (the analogue of the puffer wrapper's episode stats,
    # reference: env_puffer.py:303-370)
    ep_done: jnp.ndarray  # [W] bool
    ep_goal: jnp.ndarray  # [W] fraction of controlled agents at goal
    ep_collided: jnp.ndarray  # [W]
    ep_off_road: jnp.ndarray  # [W]
    env_state: Any = None  # pre-step SimState when PPOConfig.remat_obs


class EnvCarry(NamedTuple):
    state: SimState
    world_time_steps: jnp.ndarray
    rng: jnp.ndarray


def compute_gae(rewards, values, dones, last_value, gamma, gae_lambda,
                unroll=False):
    """Reverse-scan GAE over [T, ...] arrays (replaces the reference's
    Cython compute_gae, integrations/puffer/ppo.py:27-32,237-245).  Shared
    by the feed-forward and recurrent learners.  ``unroll`` traces the
    reverse recurrence as straight-line code (see PPOConfig.unroll)."""
    next_values = jnp.concatenate([values[1:], last_value[None]], axis=0)

    def scan_body(adv, xs):
        reward, value, next_value, done = xs
        delta = reward + gamma * next_value * (1.0 - done) - value
        adv = delta + gamma * gae_lambda * (1.0 - done) * adv
        return adv, adv

    if unroll:
        adv = jnp.zeros_like(last_value)
        out = []
        for t in range(rewards.shape[0] - 1, -1, -1):
            adv, _ = scan_body(
                adv, (rewards[t], values[t], next_values[t], dones[t])
            )
            out.append(adv)
        advs = jnp.stack(out[::-1])
    else:
        _, advs = jax.lax.scan(
            scan_body,
            jnp.zeros_like(last_value),
            (rewards, values, next_values, dones),
            reverse=True,
        )
    return advs, advs + values


def make_ppo_funcs(
    policy: LateFusionPolicy,
    params: Params,
    spec: ObsSpec,
    action_table: jnp.ndarray,
    reward_type: str,
    config: PPOConfig,
):
    """Build (init_fn, train_step_fn).

    train_step(scene, variables, opt_state, carry, reward_weights) ->
    (variables, opt_state, carry, metrics).  Everything jittable; shard the
    Scene/SimState leaves over the world axis for data parallelism.
    """
    from gpudrive_lab_tpu.env.env_jax import shaped_rewards

    tx = optax.chain(
        optax.clip_by_global_norm(config.max_grad_norm),
        optax.adam(config.learning_rate, eps=1e-5),
    )

    def policy_forward(variables, obs, rng, action=None):
        logits, value = policy.apply(variables, obs)
        a, logp, ent = sample_logits(rng, logits, action)
        return a, logp, ent, value

    flat_mode = config.compact and config.compact_mode == "flat"
    batch_lead = 2 if flat_mode else 3  # traj arrays: [T, N] vs [T, W, C]
    if config.minibatch_rows and not flat_mode:
        raise ValueError("minibatch_rows requires compact_mode='flat'")
    split_store = (not config.remat_obs) and config.obs_store == "split"
    if config.obs_store not in ("flat", "split"):
        raise ValueError(f"unknown obs_store {config.obs_store!r}")

    def ctrl_slots(scene):
        """Controlled-first ego-axis selection, derived inside the jit.

        world mode: [W, C] per-world slot order (stable sort, controlled
        slots first).  flat mode: ((w_idx [N], a_idx [N])) — the batch's
        controlled agents in (world, slot) order, padded with the first
        uncontrolled slots; padding rows are masked out of every loss."""
        if flat_mode:
            ctrl = scene.agents.controlled
            W, A = ctrl.shape
            B = max(config.compact_blocks, 1)
            if B > 1:
                assert W % B == 0, "compact_blocks must divide num_worlds"
                assert config.compact % B == 0, (
                    "compact_blocks must divide compact"
                )
                cb = ctrl.reshape(B, (W // B) * A)
                o = jnp.argsort(jnp.where(cb, 0, 1), axis=1, stable=True)
                o = o[:, : config.compact // B]
                base = (jnp.arange(B, dtype=o.dtype)
                        * ((W // B) * A))[:, None]
                order = (o + base).reshape(-1)
            else:
                flat = ctrl.reshape(-1)
                order = jnp.argsort(jnp.where(flat, 0, 1), stable=True)
                order = order[: config.compact]
            return order // A, order % A
        order = jnp.argsort(
            jnp.where(scene.agents.controlled, 0, 1), axis=1, stable=True
        )
        return order[:, : config.compact]

    def rollout_body(scene, variables, carry: EnvCarry, fresh: SimState,
                     reward_weights):
        controlled = scene.agents.controlled
        A = controlled.shape[1]
        cidx = ctrl_slots(scene) if config.compact else None

        def gather_c(x):  # [W, A(,d)] -> [W, C(,d)] / [N(,d)] (id when dense)
            if cidx is None:
                return x
            if flat_mode:
                return x[cidx[0], cidx[1]]
            idx = cidx.reshape(cidx.shape + (1,) * (x.ndim - 2))
            return jnp.take_along_axis(x, idx, axis=1)

        def body(carry: EnvCarry, _):
            rng, k_act = jax.random.split(carry.rng)
            obs, _, _ = flat_observation(
                scene, carry.state, params, spec, reward_weights, cidx,
                split=split_store,
            )
            a, logp, _, value = policy_forward(variables, obs, k_act)
            mask = gather_c(controlled & (carry.state.done == 0))
            if cidx is None:
                a_full = a
            elif flat_mode:
                # flat scatter: one [N] -> [W, A] placement; padding rows
                # (uncontrolled) land on expert-driven slots, inert in step()
                a_full = (
                    jnp.zeros((controlled.shape[0], A), a.dtype)
                    .at[cidx[0], cidx[1]]
                    .set(a)
                )
            else:
                # scatter compact actions back to full slots; uncontrolled
                # rows are expert-driven inside step() so zeros are inert
                a_full = (
                    jnp.zeros((a.shape[0], A), a.dtype)
                    .at[jnp.arange(a.shape[0])[:, None], cidx]
                    .set(a)
                )
            state = stepmod.step(
                scene,
                carry.state,
                jnp.zeros(a_full.shape + (C.ACTION_DIM,), jnp.float32)
                .at[..., :3]
                .set(action_table[a_full]),
                params,
            )
            # world clock: increment unless some agent finished — matches
            # the env's update order (step_dynamics advances the clock
            # before get_rewards reads it, env_jax._step_with_indices)
            any_done = jnp.any((state.done != 0) & scene.agents.valid, axis=1)
            wts_mid = jnp.where(
                any_done, carry.world_time_steps, carry.world_time_steps + 1
            )
            reward = shaped_rewards(
                scene, state, params, reward_type, reward_weights, wts_mid
            )
            done = (state.done != 0).astype(jnp.float32)
            # Auto-reset finished worlds (all valid agents done), like the
            # puffer wrapper's async reset (reference: env_puffer.py:265-386).
            world_done = jnp.all(
                (state.done != 0) | ~scene.agents.valid, axis=1
            )
            n_ctrl = jnp.maximum(jnp.sum(controlled, axis=1), 1)
            frac = lambda x: jnp.where(
                world_done, jnp.sum(x * controlled, axis=1) / n_ctrl, 0.0
            )
            t = Transition(
                obs=None if config.remat_obs
                else jax.tree.map(
                    lambda x: x.astype(config.obs_store_dtype), obs
                ),
                action=a, logprob=logp, value=value,
                reward=gather_c(reward),
                done=gather_c(done), mask=mask,
                ep_done=world_done,
                ep_goal=frac(state.reached_goal),
                ep_collided=frac(
                    jnp.clip(
                        state.collided_vehicle + state.collided_non_vehicle,
                        0, 1,
                    )
                ),
                ep_off_road=frac(jnp.clip(state.collided_road, 0, 1)),
                env_state=carry.state if config.remat_obs else None,
            )
            blend = lambda f, s: jnp.where(
                world_done.reshape((-1,) + (1,) * (s.ndim - 1)), f, s
            )
            state = jax.tree.map(blend, fresh, state)
            wts = jnp.where(world_done, config.reset_time_step, wts_mid)
            return EnvCarry(state, wts, rng), t

        return body

    def rollout(scene, variables, carry: EnvCarry, fresh: SimState,
                reward_weights):
        body = rollout_body(scene, variables, carry, fresh, reward_weights)
        if config.unroll:
            ts = []
            for _ in range(config.rollout_len):
                carry, t = body(carry, None)
                ts.append(t)
            traj = jax.tree.map(lambda *xs: jnp.stack(xs), *ts)
        else:
            carry, traj = jax.lax.scan(
                body, carry, None, length=config.rollout_len
            )
        return carry, traj

    # Single rollout step as its own jit program: the python-dispatch rollout
    # mode chains this instead of lax.scan (scanned programs compile and run
    # pathologically slowly on some remote TPU runtimes; see bench.py notes).
    @jax.jit
    def rollout_step(scene, variables, carry: EnvCarry, fresh: SimState,
                     reward_weights):
        body = rollout_body(scene, variables, carry, fresh, reward_weights)
        return body(carry, None)

    # ONE jitted program for the final stack: eager jnp.stack per leaf would
    # be ~45 separate dispatches on remote runtimes (measured: the dominant
    # cost of the loop mode before this fix).
    stack_transitions = jax.jit(
        lambda ts: jax.tree.map(lambda *xs: jnp.stack(xs), *ts)
    )

    def collect_rollout_loop(scene, variables, carry: EnvCarry,
                             fresh: SimState, reward_weights):
        ts = []
        for _ in range(config.rollout_len):
            carry, t = rollout_step(
                scene, variables, carry, fresh, reward_weights
            )
            ts.append(t)
        traj = stack_transitions(tuple(ts))
        return carry, traj

    def gae(traj, last_value):
        return compute_gae(
            traj.reward, traj.value, traj.done, last_value,
            config.gamma, config.gae_lambda, unroll=config.unroll,
        )

    def loss_fn(variables, mb, rng, scene, reward_weights, ent_coef):
        if config.remat_obs:
            # Rematerialize flat observations for this minibatch from the
            # stored SimStates ([Tm] time-sliced; vmap over the time axis).
            cidx = ctrl_slots(scene) if config.compact else None
            if flat_mode and config.minibatch_rows and "row_start" in mb:
                # Row-sliced minibatch: recompute obs only for this block's
                # agents (flat_observation takes any (w_idx, a_idx) subset).
                cidx = tuple(
                    jax.lax.dynamic_slice_in_dim(
                        c, mb["row_start"], config.minibatch_rows, 0
                    )
                    for c in cidx
                )
            obs = jax.vmap(
                lambda st: flat_observation(
                    scene, st, params, spec, reward_weights, cidx
                )[0]
            )(mb["obs_state"])
            obs = obs.reshape((-1, obs.shape[-1]))
        else:
            obs = mb["obs"]
            if config.policy_dtype == "float32":
                obs = jax.tree.map(lambda x: x.astype(jnp.float32), obs)
            # else: leave the bf16 store as-is — flax Dense(dtype=bf16)
            # casts at the GEMM boundary anyway, so upcasting here only
            # materializes a 2x-wide copy of every minibatch (bf16 ->
            # f32 -> bf16 round-trips to the identical bf16 values)
        _, newlogp, entropy, newvalue = policy_forward(
            variables, obs, rng, action=mb["action"]
        )
        logratio = newlogp - mb["logprob"]
        ratio = jnp.exp(logratio)
        m = mb["mask"].astype(jnp.float32)
        msum = jnp.maximum(m.sum(), 1.0)

        adv = mb["adv"]
        if config.norm_adv:
            mean = (adv * m).sum() / msum
            var = (((adv - mean) ** 2) * m).sum() / msum
            adv = (adv - mean) * jax.lax.rsqrt(var + 1e-8)

        pg1 = -adv * ratio
        pg2 = -adv * jnp.clip(
            ratio, 1.0 - config.clip_coef, 1.0 + config.clip_coef
        )
        pg_loss = (jnp.maximum(pg1, pg2) * m).sum() / msum

        if config.clip_vloss:
            v_clipped = mb["value"] + jnp.clip(
                newvalue - mb["value"],
                -config.vf_clip_coef,
                config.vf_clip_coef,
            )
            v_loss = (
                0.5
                * jnp.maximum(
                    (newvalue - mb["ret"]) ** 2, (v_clipped - mb["ret"]) ** 2
                )
                * m
            ).sum() / msum
        else:
            v_loss = (0.5 * (newvalue - mb["ret"]) ** 2 * m).sum() / msum

        ent_loss = (entropy * m).sum() / msum
        loss = pg_loss - ent_coef * ent_loss + config.vf_coef * v_loss
        approx_kl = (((ratio - 1.0) - logratio) * m).sum() / msum
        return loss, {
            "pg_loss": pg_loss,
            "v_loss": v_loss,
            "entropy": ent_loss,
            "approx_kl": approx_kl,
        }

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def update(scene, variables, opt_state, carry: EnvCarry, traj,
               reward_weights, ent_coef):
        last_obs, _, _ = flat_observation(
            scene, carry.state, params, spec, reward_weights,
            ctrl_slots(scene) if config.compact else None,
        )
        _, last_value = policy.apply(variables, last_obs)
        advs, rets = gae(traj, last_value)

        batch = {
            "action": traj.action,
            "logprob": traj.logprob,
            "value": traj.value,
            "adv": advs,
            "ret": rets,
            "mask": traj.mask,
        }
        if not config.remat_obs:
            batch["obs"] = traj.obs

        T = config.rollout_len
        M = config.num_minibatches
        use_rows = bool(flat_mode) and config.minibatch_rows > 0
        if use_rows:
            # Factor the M total minibatches into time groups x row blocks:
            # each minibatch is a [Tm, rows] tile of the [T, N] batch, so
            # minibatch HBM stays bounded as N (= worlds) grows.
            rows = config.minibatch_rows
            N_flat = config.compact
            assert N_flat % rows == 0, "minibatch_rows must divide compact"
            G = N_flat // rows
            assert M % G == 0, (
                "num_minibatches must be divisible by compact//minibatch_rows"
            )
            M_t = M // G
            assert T % M_t == 0, (
                "num_minibatches//(compact//minibatch_rows) must divide "
                "rollout_len"
            )
        else:
            assert T % M == 0, "num_minibatches must divide rollout_len"

        def epoch_body(carry_in, rng_e):
            variables, opt_state = carry_in

            if use_rows:
                rng_t, rng_p = jax.random.split(rng_e)
                perm_flat = jax.random.permutation(rng_t, T)
                perm = perm_flat.reshape(M_t, T // M_t)
                # visit the (time-group, row-block) grid in random order
                pairs = jax.random.permutation(rng_p, M)
                t_indices = perm[pairs // G]        # [M, Tm]
                row_starts = (pairs % G) * rows     # [M]
                pids = pairs                        # unique per minibatch
                Tm = T // M_t
                t_starts = (pairs // G) * Tm        # [M] into the shuffled T
            else:
                perm_flat = jax.random.permutation(rng_e, T)
                t_indices = perm_flat.reshape(M, T // M)
                row_starts = jnp.zeros((M,), jnp.int32)
                pids = t_indices[:, 0]
                Tm = T // M
                # shuffled batch is visited in order: slice m starts at m*Tm
                t_starts = jnp.arange(M, dtype=jnp.int32) * Tm

            if config.epoch_preshuffle:
                # One time-axis shuffle per epoch; minibatches then cut
                # contiguous [Tm(, rows)] tiles.  Identical sample grouping,
                # order and rng stream as the take path (t_indices[m] ==
                # shuffled[t_starts[m] : +Tm] by construction).
                P = jax.nn.one_hot(perm_flat, T, dtype=jnp.float32)

                def shuffle(x):
                    # dot_general branch: floating leaves only — f32
                    # accumulation of a one-hot matmul is exact for floats
                    # (each output is one 1.0*value term) but would silently
                    # corrupt int values >= 2^24 routed through f32.
                    if (x.ndim >= 2 and x.size >= PRESHUFFLE_DOT_MIN_ELEMS
                            and jnp.issubdtype(x.dtype, jnp.floating)):
                        y = jax.lax.dot_general(
                            P.astype(x.dtype),
                            x.reshape(T, -1),
                            (((1,), (0,)), ((), ())),
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32,
                        )
                        return y.astype(x.dtype).reshape(x.shape)
                    return jnp.take(x, perm_flat, axis=0)

                sbatch = {
                    k: jax.tree.map(shuffle, v) for k, v in batch.items()
                }

            def mb_body(carry_mb, xs):
                mb_idx, rstart, pid, tstart = xs
                variables, opt_state = carry_mb
                if config.epoch_preshuffle:
                    def take(x):
                        xt = jax.lax.dynamic_slice_in_dim(x, tstart, Tm, 0)
                        if use_rows:
                            xt = jax.lax.dynamic_slice_in_dim(
                                xt, rstart, rows, axis=1
                            )
                        return xt.reshape((-1,) + x.shape[batch_lead:])
                elif use_rows:
                    def take(x):
                        xt = jnp.take(x, mb_idx, axis=0)
                        xr = jax.lax.dynamic_slice_in_dim(
                            xt, rstart, rows, axis=1
                        )
                        return xr.reshape((-1,) + x.shape[batch_lead:])
                else:
                    take = lambda x: jnp.take(x, mb_idx, axis=0).reshape(
                        (-1,) + x.shape[batch_lead:]
                    )
                src = sbatch if config.epoch_preshuffle else batch
                mb = {k: jax.tree.map(take, v) for k, v in src.items()}
                if use_rows:
                    mb["row_start"] = rstart
                if config.remat_obs:
                    # keep the [Tm, W, A] layout — loss_fn vmaps the obs
                    # recompute over the time axis
                    mb["obs_state"] = jax.tree.map(
                        lambda x: jnp.take(x, mb_idx, axis=0), traj.env_state
                    )
                (loss, aux), grads = grad_fn(
                    variables, mb, jax.random.fold_in(rng_e, pid),
                    scene, reward_weights, ent_coef,
                )
                updates, opt_state = tx.update(grads, opt_state, variables)
                variables = optax.apply_updates(variables, updates)
                return (variables, opt_state), aux

            # pid keeps per-minibatch rng keys distinct; in the legacy
            # (time-only) layout it reproduces the old fold_in(mb_idx[0])
            # stream so round-3 configs stay bitwise-reproducible.
            if config.unroll:
                auxes = []
                for m in range(M):
                    (variables, opt_state), aux = mb_body(
                        (variables, opt_state),
                        (t_indices[m], row_starts[m], pids[m], t_starts[m]),
                    )
                    auxes.append(aux)
                auxes = jax.tree.map(lambda *xs: jnp.stack(xs), *auxes)
            else:
                (variables, opt_state), auxes = jax.lax.scan(
                    mb_body, (variables, opt_state),
                    (t_indices, row_starts, pids, t_starts),
                )
            return (variables, opt_state), auxes

        # Fresh key branch for the update; keep a distinct key for the next
        # rollout (reusing carry.rng for both correlated shuffles with the
        # following rollout's action noise).
        rng_epochs, rng_next = jax.random.split(carry.rng)
        rngs = jax.random.split(rng_epochs, config.update_epochs)
        if config.update_epochs == 0:
            # rollout-only decomposition mode (bench --update-epochs 0):
            # skip the optimizer entirely, report zeroed loss metrics
            auxes = {k: jnp.zeros((1,), jnp.float32)
                     for k in ("pg_loss", "v_loss", "entropy", "approx_kl")}
        elif config.unroll:
            auxes = []
            for e in range(config.update_epochs):
                (variables, opt_state), aux = epoch_body(
                    (variables, opt_state), rngs[e]
                )
                auxes.append(aux)
            auxes = jax.tree.map(lambda *xs: jnp.stack(xs), *auxes)
        else:
            (variables, opt_state), auxes = jax.lax.scan(
                epoch_body, (variables, opt_state), rngs
            )
        carry = carry._replace(rng=rng_next)

        metrics = jax.tree.map(lambda x: x.mean(), auxes)
        metrics["mean_reward"] = (traj.reward * traj.mask).sum() / jnp.maximum(
            traj.mask.sum(), 1
        )
        metrics["samples"] = traj.mask.sum()
        n_ep = jnp.maximum(traj.ep_done.sum(), 1)
        metrics["episodes"] = traj.ep_done.sum()
        metrics["perc_goal_achieved"] = traj.ep_goal.sum() / n_ep
        metrics["perc_collisions"] = traj.ep_collided.sum() / n_ep
        metrics["perc_off_road"] = traj.ep_off_road.sum() / n_ep
        return variables, opt_state, carry, metrics

    def train_step(scene, variables, opt_state, carry: EnvCarry,
                   fresh: SimState, reward_weights, ent_coef=None):
        """Fully-jittable iteration: scanned rollout + update (jit the whole
        thing on backends where lax.scan performs well).  ``ent_coef``
        optionally overrides the config value at runtime (a traced scalar —
        entropy-floor scheduling without recompiles)."""
        if ent_coef is None:
            ent_coef = jnp.float32(config.ent_coef)
        carry, traj = rollout(scene, variables, carry, fresh, reward_weights)
        return update(scene, variables, opt_state, carry, traj,
                      reward_weights, ent_coef)

    update_jit = jax.jit(update)

    def train_step_loop(scene, variables, opt_state, carry: EnvCarry,
                        fresh: SimState, reward_weights, ent_coef=None):
        """Python-dispatch rollout + jitted update: use when the backend
        executes scanned bodies poorly (e.g. remote TPU runtimes)."""
        if ent_coef is None:
            ent_coef = jnp.float32(config.ent_coef)
        carry, traj = collect_rollout_loop(
            scene, variables, carry, fresh, reward_weights
        )
        return update_jit(
            scene, variables, opt_state, carry, traj, reward_weights,
            ent_coef,
        )

    # ---- fully-dispatched mode: the minibatch loop is python too ---------
    # The scan-based update compiles epochs x minibatches of obs-remat +
    # fwd/bwd into ONE program — minutes of XLA time on the remote runtime.
    # Here one small per-minibatch program compiles once and is re-dispatched
    # E*M times per iteration (benchmark doctrine: CLAUDE.md, scanned bodies
    # execute poorly over the tunnel).

    def _prepare_batch(scene, variables, carry, traj, reward_weights):
        last_obs, _, _ = flat_observation(
            scene, carry.state, params, spec, reward_weights,
            ctrl_slots(scene) if config.compact else None,
        )
        _, last_value = policy.apply(variables, last_obs)
        advs, rets = gae(traj, last_value)
        batch = {
            "action": traj.action,
            "logprob": traj.logprob,
            "value": traj.value,
            "adv": advs,
            "ret": rets,
            "mask": traj.mask,
        }
        if not config.remat_obs:
            batch["obs"] = traj.obs
        n_ep = jnp.maximum(traj.ep_done.sum(), 1)
        base = {
            "mean_reward": (traj.reward * traj.mask).sum()
            / jnp.maximum(traj.mask.sum(), 1),
            "samples": traj.mask.sum(),
            "episodes": traj.ep_done.sum(),
            "perc_goal_achieved": traj.ep_goal.sum() / n_ep,
            "perc_collisions": traj.ep_collided.sum() / n_ep,
            "perc_off_road": traj.ep_off_road.sum() / n_ep,
        }
        return batch, base

    prepare_jit = jax.jit(_prepare_batch)

    def _mb_update(variables, opt_state, batch, env_state, mb_idx, rng,
                   scene, reward_weights, ent_coef):
        take = lambda x: jnp.take(x, mb_idx, axis=0).reshape(
            (-1,) + x.shape[batch_lead:]
        )
        mb = {k: jax.tree.map(take, v) for k, v in batch.items()}
        if config.remat_obs:
            mb["obs_state"] = jax.tree.map(
                lambda x: jnp.take(x, mb_idx, axis=0), env_state
            )
        (loss, aux), grads = grad_fn(variables, mb, rng, scene,
                                     reward_weights, ent_coef)
        updates, opt_state = tx.update(grads, opt_state, variables)
        variables = optax.apply_updates(variables, updates)
        return variables, opt_state, aux

    mb_update_jit = jax.jit(_mb_update, donate_argnums=(0, 1))

    _agg_auxes = jax.jit(
        lambda auxes: jax.tree.map(
            lambda *xs: jnp.mean(jnp.stack(xs)), *auxes
        )
    )

    @jax.jit
    def _perms_and_keys(rng):
        """All epoch permutations + minibatch keys in ONE dispatch (eager
        per-minibatch fold_in would cost a tunnel round-trip each)."""
        E, T, M = config.update_epochs, config.rollout_len, config.num_minibatches
        rng_epochs, rng_next = jax.random.split(rng)
        rngs = jax.random.split(rng_epochs, E)
        perms = jnp.stack(
            [jax.random.permutation(r, T) for r in rngs]
        ).reshape(E, M, T // M)
        keys = jax.vmap(lambda r: jax.random.split(r, M))(rngs)  # [E, M, 2]
        return perms, keys, rng_next

    def train_step_dispatch(scene, variables, opt_state, carry: EnvCarry,
                            fresh: SimState, reward_weights, ent_coef=None):
        """Everything python-dispatched: rollout step-by-step, then E*M
        re-dispatches of the per-minibatch update program."""
        import numpy as np

        if ent_coef is None:
            ent_coef = jnp.float32(config.ent_coef)
        carry, traj = collect_rollout_loop(
            scene, variables, carry, fresh, reward_weights
        )
        batch, base = prepare_jit(scene, variables, carry, traj,
                                  reward_weights)
        perms, keys, rng_next = _perms_and_keys(carry.rng)
        perms = np.asarray(perms)
        keys = np.asarray(keys)
        carry = carry._replace(rng=rng_next)
        auxes = []
        for e in range(config.update_epochs):
            for m in range(config.num_minibatches):
                variables, opt_state, aux = mb_update_jit(
                    variables, opt_state, batch, traj.env_state,
                    perms[e, m], keys[e, m], scene, reward_weights,
                    ent_coef,
                )
                auxes.append(aux)
        # ONE jitted aggregation + lazy device scalars: converting each aux
        # scalar with np.asarray would be E*M*|aux| blocking round trips
        # (measured: tens of seconds per iteration over the tunnel).
        metrics = _agg_auxes(tuple(auxes))
        metrics.update(base)
        return variables, opt_state, carry, metrics

    def init_fn(rng, scene, example_obs):
        variables = policy.init(rng, example_obs)
        opt_state = tx.init(variables)
        return variables, opt_state

    return init_fn, train_step, train_step_loop, train_step_dispatch
