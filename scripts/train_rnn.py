"""Recurrent-PPO (LSTM/BPTT) training CLI.

Exercises the reference's optional use_rnn path for real (reference:
integrations/puffer/ppo.py:59-73,156-163 — bptt_horizon config), producing
a learning-curve JSONL so the BPTT learner is proven beyond shape tests.

Run (TPU): python scripts/train_rnn.py --num-worlds 16 --total-timesteps 200000
Run (CPU smoke): python scripts/train_rnn.py --platform cpu --num-worlds 2 \
    --total-timesteps 2000 --rollout-len 8
"""

from __future__ import annotations

import argparse
import json
import pickle
import time
from pathlib import Path


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-dir",
                   default="/root/reference/data/processed/examples")
    p.add_argument("--num-worlds", type=int, default=16)
    p.add_argument("--total-timesteps", type=int, default=200_000)
    p.add_argument("--rollout-len", type=int, default=32)
    p.add_argument("--num-minibatches", type=int, default=4,
                   help="world-axis minibatches (must divide num-worlds)")
    p.add_argument("--update-epochs", type=int, default=2)
    p.add_argument("--lstm-hidden", type=int, default=128)
    p.add_argument("--ent-coef", type=float, default=1e-3)
    p.add_argument("--entropy-floor", type=float, default=0.0,
                   help="adaptive entropy-coefficient controller (the FF "
                        "campaign's, ppo/train.py): boost ent_coef x1.5 "
                        "while entropy < floor, relax /1.2 above 2x floor. "
                        "0 disables.  The un-floored 50M BPTT campaign "
                        "collapsed to zero-entropy do-nothing (round 5).")
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--init-steps", type=int, default=11)
    p.add_argument("--compact", type=int, default=0,
                   help="flat cross-world compaction: N flat ego rows "
                        "holding exactly the batch's controlled agents "
                        "(0 = dense [W, A] layout)")
    p.add_argument("--policy-dtype", choices=["f32", "bf16"], default="f32")
    p.add_argument("--obs-store", choices=["f32", "bf16"], default="f32")
    p.add_argument("--unroll", action="store_true",
                   help="trace rollout/BPTT/minibatch loops as straight-line "
                        "code (single While-free program)")
    p.add_argument("--agent-bucket", default=None,
                   help="'auto' buckets the sim agent axis to the batch max")
    p.add_argument("--checkpoint-path", default="runs/rnn")
    p.add_argument("--continue-training", action="store_true")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--platform", default=None)
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp
    import numpy as np

    import gpudrive_lab_tpu

    gpudrive_lab_tpu.enable_compile_cache()

    from gpudrive_lab_tpu.core import step as stepmod
    from gpudrive_lab_tpu.env.config import EnvConfig
    from gpudrive_lab_tpu.env.dataset import SceneDataLoader
    from gpudrive_lab_tpu.env.env_jax import GPUDriveTPUEnv
    from gpudrive_lab_tpu.networks.late_fusion import (
        LateFusionLSTMPolicy,
        PolicyConfig,
    )
    from gpudrive_lab_tpu.ppo.ppo import PPOConfig
    from gpudrive_lab_tpu.ppo.ppo_rnn import RnnCarry, make_rnn_ppo_funcs

    loader = SceneDataLoader(
        root=args.data_dir, batch_size=args.num_worlds, dataset_size=1000,
        sample_with_replacement=True, seed=args.seed,
    )
    env = GPUDriveTPUEnv(
        EnvConfig(
            num_worlds=args.num_worlds,
            reward_type="weighted_combination",
            collision_weight=-0.75, off_road_weight=-0.75,
            goal_achieved_weight=1.0,
            dynamics_model="classic", collision_behavior="ignore",
            init_steps=args.init_steps,
            agent_bucket=args.agent_bucket,
        ),
        data_loader=loader,
    )
    import jax.numpy as _jnp

    pc = PolicyConfig(
        action_dim=env.action_space_n,
        dtype=_jnp.bfloat16 if args.policy_dtype == "bf16" else _jnp.float32,
    )
    policy = LateFusionLSTMPolicy(pc, lstm_hidden=args.lstm_hidden)
    ppo_cfg = PPOConfig(
        rollout_len=args.rollout_len,
        num_minibatches=args.num_minibatches,
        update_epochs=args.update_epochs,
        ent_coef=args.ent_coef,
        learning_rate=args.lr,
        compact=args.compact,
        compact_mode="flat" if args.compact else "world",
        obs_store_dtype="bfloat16" if args.obs_store == "bf16"
        else "float32",
        unroll=args.unroll,
    )
    if args.compact:
        from gpudrive_lab_tpu.ppo.train import check_compact_capacity

        check_compact_capacity(env, args.compact, "flat")
    init_fn, train_step = make_rnn_ppo_funcs(
        policy, env.params, env.spec, env.action_keys,
        env.config.reward_type, ppo_cfg,
    )
    variables, opt_state, lstm = init_fn(
        jax.random.PRNGKey(args.seed), env.num_worlds,
        jnp.zeros((1, pc.obs_dim)),
    )
    fresh = jax.jit(stepmod.reset, static_argnames="params")(
        env.scene, None, env.params
    )
    # Start from the env's warmed-up state (init_steps expert playback).
    carry = RnnCarry(
        state=jax.tree.map(jnp.copy, env.state),
        lstm=lstm,
        world_time_steps=jnp.asarray(env.world_time_steps),
        rng=jax.random.PRNGKey(args.seed + 1),
        just_reset=jnp.zeros(env.num_worlds, bool),
    )

    ckpt_dir = Path(args.checkpoint_path)
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    global_step = 0
    if args.continue_training and (ckpt_dir / "policy.pkl").exists():
        with open(ckpt_dir / "policy.pkl", "rb") as f:
            ckpt = pickle.load(f)
        variables = jax.tree.map(jnp.asarray, ckpt["variables"])
        opt_state = jax.tree.map(jnp.asarray, ckpt["opt_state"])
        global_step = int(ckpt.get("global_step", 0))
        print(json.dumps({"resumed_from": global_step}), flush=True)

    train_fn = jax.jit(train_step)
    log_path = ckpt_dir / "rnn.metrics.jsonl"
    logf = open(log_path, "a")
    iteration = 0
    t_start = time.time()
    ent_coef = args.ent_coef
    while global_step < args.total_timesteps:
        variables, opt_state, carry, metrics = train_fn(
            env.scene, variables, opt_state, carry, fresh,
            env.reward_weights, jnp.float32(ent_coef),
        )
        m = {k: float(np.asarray(v)) for k, v in metrics.items()}
        global_step += int(m.pop("samples"))
        if args.entropy_floor > 0.0:
            if m["entropy"] < args.entropy_floor:
                ent_coef = min(ent_coef * 1.5, 0.1)
            elif m["entropy"] > 2.0 * args.entropy_floor:
                ent_coef = max(ent_coef / 1.2, args.ent_coef)
            m["ent_coef"] = ent_coef
        iteration += 1
        if iteration % 5 == 0 or global_step >= args.total_timesteps:
            rec = dict(
                _t=round(time.time(), 3),
                iteration=iteration,
                global_step=global_step,
                sps=round(global_step / (time.time() - t_start), 1),
                **{k: round(v, 5) for k, v in m.items()},
            )
            logf.write(json.dumps(rec) + "\n")
            logf.flush()
            print(json.dumps(rec), flush=True)
        if iteration % 25 == 0 or global_step >= args.total_timesteps:
            with open(ckpt_dir / "policy.pkl", "wb") as f:
                pickle.dump(
                    {
                        "variables": jax.tree.map(np.asarray, variables),
                        "opt_state": jax.tree.map(np.asarray, opt_state),
                        "global_step": global_step,
                        "arch": {"lstm_hidden": args.lstm_hidden,
                                 "action_dim": pc.action_dim},
                    },
                    f,
                )
    print(json.dumps({"final_global_step": global_step}))


if __name__ == "__main__":
    main()
