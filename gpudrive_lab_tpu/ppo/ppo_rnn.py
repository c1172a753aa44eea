"""Recurrent PPO (LSTM policy with BPTT).

The recurrent counterpart of ppo.py, covering the reference's optional
use_rnn/bptt_horizon path (reference: integrations/puffer/ppo.py:59-73,
156-163, Experience LSTM state slots :530-666).  Differences from the
feed-forward learner:

  * the rollout carries per-agent LSTM state, zeroed on episode end;
  * the update REPLAYS the sequence through the network (CleanRL-style BPTT
    over the full rollout) with minibatches over the world axis, so
    recurrent credit assignment stays exact and worlds stay device-sharded.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from gpudrive_lab_tpu import constants as C
from gpudrive_lab_tpu.core import step as stepmod
from gpudrive_lab_tpu.core.types import Params, Scene, SimState
from gpudrive_lab_tpu.env.env_jax import ObsSpec, flat_observation, shaped_rewards
from gpudrive_lab_tpu.networks.late_fusion import (
    LateFusionLSTMPolicy,
    sample_logits,
)
from gpudrive_lab_tpu.ppo.ppo import PPOConfig, compute_gae


class RnnCarry(NamedTuple):
    state: SimState
    lstm: tuple  # ((W, A, H), (W, A, H))
    world_time_steps: jnp.ndarray
    rng: jnp.ndarray
    # worlds auto-reset at the END of the previous step; their LSTM state
    # must be zeroed at the START of the next step (and identically during
    # the BPTT replay)
    just_reset: jnp.ndarray  # [W] bool


class RnnTransition(NamedTuple):
    obs: jnp.ndarray
    reset_pre: jnp.ndarray  # carry-reset signal BEFORE the step
    action: jnp.ndarray
    logprob: jnp.ndarray
    value: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray
    mask: jnp.ndarray
    # per-world episode stats at auto-reset (mirrors ppo.Transition so RNN
    # campaigns report goal/collision rates, not just losses)
    ep_done: jnp.ndarray
    ep_goal: jnp.ndarray
    ep_collided: jnp.ndarray
    ep_off_road: jnp.ndarray


def make_rnn_ppo_funcs(
    policy: LateFusionLSTMPolicy,
    params: Params,
    spec: ObsSpec,
    action_table: jnp.ndarray,
    reward_type: str,
    config: PPOConfig,
):
    tx = optax.chain(
        optax.clip_by_global_norm(config.max_grad_norm),
        optax.adam(config.learning_rate, eps=1e-5),
    )

    # Flat cross-world compaction (the feed-forward learner's fast path,
    # ppo.py ctrl_slots): the LSTM state, obs, and BPTT replay all live on
    # ONE flat [N] ego axis holding exactly the batch's controlled agents.
    # Uncontrolled agents never act and never need recurrent state, and the
    # BPTT rows are independent sequences, so row minibatching stays exact.
    flat_mode = bool(config.compact) and config.compact_mode == "flat"

    def ctrl_slots(scene):
        ctrl = scene.agents.controlled.reshape(-1)
        order = jnp.argsort(jnp.where(ctrl, 0, 1), stable=True)
        order = order[: config.compact]
        A = scene.agents.controlled.shape[1]
        return order // A, order % A

    def rollout(scene, variables, carry: RnnCarry, fresh: SimState, weights):
        controlled = scene.agents.controlled
        A = controlled.shape[1]
        cidx = ctrl_slots(scene) if flat_mode else None

        def gather_c(x):
            return x[cidx[0], cidx[1]] if flat_mode else x

        def body(carry: RnnCarry, _):
            rng, k = jax.random.split(carry.rng)
            obs, _, _ = flat_observation(
                scene, carry.state, params, spec, weights, cidx
            )
            if flat_mode:
                reset_pre = jnp.maximum(
                    gather_c((carry.state.done != 0).astype(jnp.float32)),
                    carry.just_reset[cidx[0]].astype(jnp.float32),
                )
            else:
                reset_pre = jnp.maximum(
                    (carry.state.done != 0).astype(jnp.float32),
                    carry.just_reset[:, None].astype(jnp.float32),
                )
            lstm, logits, value = policy.apply(
                variables, obs, carry.lstm, reset_pre
            )
            a, logp, _ = sample_logits(k, logits)
            mask = gather_c(controlled & (carry.state.done == 0))
            if flat_mode:
                a_full = (
                    jnp.zeros((controlled.shape[0], A), a.dtype)
                    .at[cidx[0], cidx[1]]
                    .set(a)
                )
            else:
                a_full = a
            act = jnp.zeros(a_full.shape + (C.ACTION_DIM,), jnp.float32)
            act = act.at[..., :3].set(action_table[a_full])
            state = stepmod.step(scene, carry.state, act, params)
            # world clock: increment unless some agent finished, as the env
            # does before reward shaping (env_jax._step_with_indices)
            any_done = jnp.any(
                (state.done != 0) & scene.agents.valid, axis=1
            )
            wts_mid = jnp.where(
                any_done, carry.world_time_steps, carry.world_time_steps + 1
            )
            reward = shaped_rewards(
                scene, state, params, reward_type, weights, wts_mid
            )
            done = (state.done != 0).astype(jnp.float32)
            world_done = jnp.all(
                (state.done != 0) | ~scene.agents.valid, axis=1
            )
            n_ctrl = jnp.maximum(jnp.sum(controlled, axis=1), 1)
            frac = lambda x: jnp.where(
                world_done, jnp.sum(x * controlled, axis=1) / n_ctrl, 0.0
            )
            t = RnnTransition(
                obs=obs.astype(config.obs_store_dtype), reset_pre=reset_pre,
                action=a, logprob=logp, value=value,
                reward=gather_c(reward), done=gather_c(done), mask=mask,
                ep_done=world_done,
                ep_goal=frac(state.reached_goal),
                ep_collided=frac(
                    jnp.clip(
                        state.collided_vehicle + state.collided_non_vehicle,
                        0, 1,
                    )
                ),
                ep_off_road=frac(jnp.clip(state.collided_road, 0, 1)),
            )
            blend = lambda f, s: jnp.where(
                world_done.reshape((-1,) + (1,) * (s.ndim - 1)), f, s
            )
            state = jax.tree.map(blend, fresh, state)
            wts = jnp.where(world_done, 0, wts_mid)
            return RnnCarry(state, lstm, wts, rng, world_done), t

        if config.unroll:
            ts = []
            for _ in range(config.rollout_len):
                carry, t = body(carry, None)
                ts.append(t)
            return carry, jax.tree.map(lambda *xs: jnp.stack(xs), *ts)
        return jax.lax.scan(body, carry, None, length=config.rollout_len)

    def gae(traj, last_value):
        return compute_gae(
            traj.reward, traj.value, traj.done, last_value,
            config.gamma, config.gae_lambda,
        )

    def loss_fn(variables, mb, init_lstm, ent_coef):
        """BPTT replay over the whole rollout for a world minibatch.
        mb arrays: [T, Wm, A, ...]; init_lstm: ((Wm, A, H), (Wm, A, H)).
        The stored reset_pre reproduces the rollout's carry zeroing exactly
        (agent done OR world auto-reset at the previous step).  ent_coef is
        a RUNTIME scalar so a host-side entropy-floor controller (the FF
        trainer's, ppo/train.py) can adapt it without recompiling — the
        first 50M-step BPTT campaign collapsed to zero-entropy do-nothing
        without it (docs/PERFORMANCE.md round 5)."""

        def scan_body(lstm, xs):
            obs, reset_pre, action = xs
            lstm, logits, value = policy.apply(
                variables, obs.astype(jnp.float32), lstm, reset_pre
            )
            logp_all = jax.nn.log_softmax(logits)
            logp = jnp.take_along_axis(
                logp_all, action[..., None].astype(jnp.int32), axis=-1
            )[..., 0]
            ent = -jnp.sum(jnp.exp(logp_all) * logp_all, axis=-1)
            return lstm, (logp, ent, value)

        if config.unroll:
            T = mb["obs"].shape[0]
            lstm, outs = init_lstm, []
            for t in range(T):
                lstm, o = scan_body(
                    lstm, (mb["obs"][t], mb["reset_pre"][t], mb["action"][t])
                )
                outs.append(o)
            newlogp, entropy, newvalue = jax.tree.map(
                lambda *xs: jnp.stack(xs), *outs
            )
        else:
            _, (newlogp, entropy, newvalue) = jax.lax.scan(
                scan_body, init_lstm,
                (mb["obs"], mb["reset_pre"], mb["action"]),
            )

        m = mb["mask"].astype(jnp.float32)
        msum = jnp.maximum(m.sum(), 1.0)
        logratio = newlogp - mb["logprob"]
        ratio = jnp.exp(logratio)
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
        v_loss = (0.5 * (newvalue - mb["ret"]) ** 2 * m).sum() / msum
        ent_loss = (entropy * m).sum() / msum
        loss = pg_loss - ent_coef * ent_loss + config.vf_coef * v_loss
        approx_kl = (((ratio - 1.0) - logratio) * m).sum() / msum
        return loss, {
            "pg_loss": pg_loss, "v_loss": v_loss, "entropy": ent_loss,
            "approx_kl": approx_kl,
        }

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def train_step(scene, variables, opt_state, carry: RnnCarry,
                   fresh: SimState, weights, ent_coef=None):
        if ent_coef is None:  # trace-time default: the static config value
            ent_coef = jnp.float32(config.ent_coef)
        init_lstm = carry.lstm
        carry, traj = rollout(scene, variables, carry, fresh, weights)
        cidx = ctrl_slots(scene) if flat_mode else None
        last_obs, _, _ = flat_observation(
            scene, carry.state, params, spec, weights, cidx
        )
        if flat_mode:
            reset_last = jnp.maximum(
                (carry.state.done[cidx[0], cidx[1]] != 0).astype(jnp.float32),
                carry.just_reset[cidx[0]].astype(jnp.float32),
            )
        else:
            reset_last = jnp.maximum(
                (carry.state.done != 0).astype(jnp.float32),
                carry.just_reset[:, None].astype(jnp.float32),
            )
        _, _, last_value = policy.apply(
            variables, last_obs, carry.lstm, reset_last
        )
        advs, rets = gae(traj, last_value)
        batch = {
            "obs": traj.obs, "reset_pre": traj.reset_pre, "action": traj.action,
            "logprob": traj.logprob, "value": traj.value, "adv": advs,
            "ret": rets, "mask": traj.mask,
        }
        # Minibatch over axis 1: worlds [T, W, A, ...] in dense mode, flat
        # ego rows [T, N, ...] in flat mode — BPTT rows are independent
        # sequences, so row minibatching is exact in both layouts.
        B = traj.obs.shape[1]
        M = min(config.num_minibatches, B)
        assert B % M == 0, "minibatch axis must divide num_minibatches"

        def epoch_body(carry_in, rng_e):
            variables, opt_state = carry_in
            perm = jax.random.permutation(rng_e, B)

            def mb_body(carry_mb, w_idx):
                variables, opt_state = carry_mb
                mb = {k: jnp.take(v, w_idx, axis=1) for k, v in batch.items()}
                lstm0 = jax.tree.map(
                    lambda x: jnp.take(x, w_idx, axis=0), init_lstm
                )
                (loss, aux), grads = grad_fn(variables, mb, lstm0, ent_coef)
                updates, opt_state = tx.update(grads, opt_state, variables)
                variables = optax.apply_updates(variables, updates)
                return (variables, opt_state), aux

            mb_indices = perm.reshape(M, B // M)
            if config.unroll:
                auxes = []
                for m in range(M):
                    (variables, opt_state), aux = mb_body(
                        (variables, opt_state), mb_indices[m]
                    )
                    auxes.append(aux)
                auxes = jax.tree.map(lambda *xs: jnp.stack(xs), *auxes)
            else:
                (variables, opt_state), auxes = jax.lax.scan(
                    mb_body, (variables, opt_state), mb_indices
                )
            return (variables, opt_state), auxes

        rng_epochs, rng_next = jax.random.split(carry.rng)
        rngs = jax.random.split(rng_epochs, config.update_epochs)
        if config.unroll:
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
        metrics["samples"] = traj.mask.sum()
        metrics["mean_reward"] = (traj.reward * traj.mask).sum() / (
            jnp.maximum(traj.mask.sum(), 1)
        )
        n_ep = jnp.maximum(traj.ep_done.sum(), 1)
        metrics["episodes"] = traj.ep_done.sum()
        metrics["perc_goal_achieved"] = traj.ep_goal.sum() / n_ep
        metrics["perc_collisions"] = traj.ep_collided.sum() / n_ep
        metrics["perc_off_road"] = traj.ep_off_road.sum() / n_ep
        return variables, opt_state, carry, metrics

    def init_fn(rng, num_worlds, example_obs):
        lstm0 = policy.initialize_carry((1,))
        variables = policy.init(
            rng, example_obs,
            policy.initialize_carry((example_obs.shape[0],)),
            jnp.zeros(example_obs.shape[0]),
        )
        opt_state = tx.init(variables)
        lstm = policy.initialize_carry(
            (config.compact,) if flat_mode else (num_worlds, C.MAX_AGENTS)
        )
        return variables, opt_state, lstm

    return init_fn, train_step
