"""VERDICT r4 item 7 — attack the 330K rollout-only floor.

Hypothesis under test: the serialized 32-step rollout leaves the device
idle between python dispatches, so TWO INDEPENDENT world-shard programs
(each W/2 worlds, own env state, own packed buffers) dispatched interleaved
WITHOUT blocking should overlap transfer/latency with compute and beat one
fused W-world program.  Counter-hypothesis (the round-4 doctrine): the body
is real device compute that scales sublinearly in W, so splitting W in half
costs more per-sample than any latency it hides, and the dense fused
program stays the fast path.

Measures rollout-only SPS (update_epochs=0) at the production flat/bf16/dot
configuration:
  single: one trainer at --worlds
  dual:   two trainers at --worlds/2, dispatches interleaved A,B,A,B...,
          blocked only at the end of each timed repetition
Methodology: consumed samples scalar per shard, fresh keys per repetition,
best-of-N (docs/PERFORMANCE.md).
"""

from __future__ import annotations

import argparse
import json
import time


def build(worlds, args, seed):
    import jax.numpy as jnp

    from gpudrive_lab_tpu.env.config import EnvConfig
    from gpudrive_lab_tpu.env.dataset import SceneDataLoader
    from gpudrive_lab_tpu.env.env_jax import GPUDriveTPUEnv
    from gpudrive_lab_tpu.ppo.ppo import PPOConfig
    from gpudrive_lab_tpu.ppo.train import build_trainer

    loader = SceneDataLoader(
        root=args.scenes_dir, batch_size=worlds, dataset_size=1000,
        sample_with_replacement=True, seed=seed,
    )
    cfg = EnvConfig(
        num_worlds=worlds, reward_type="weighted_combination",
        collision_weight=-0.75, off_road_weight=-0.75,
        goal_achieved_weight=1.0, dynamics_model="classic",
        collision_behavior="ignore", init_steps=11, road_gather="dot",
        agent_bucket=64,
    )
    env = GPUDriveTPUEnv(cfg, data_loader=loader)
    ppo_cfg = PPOConfig(
        rollout_len=args.rollout_len, num_minibatches=16, update_epochs=0,
        obs_store_dtype="bfloat16", compact=args.compact * worlds // args.worlds,
        compact_mode="flat", policy_dtype="bfloat16",
    )
    policy, variables, opt_state, carry, fresh, train_fn = build_trainer(
        env, ppo_cfg, seed=seed, rollout_mode="unroll", packed_io=True,
    )
    return env, train_fn


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--worlds", type=int, default=256)
    p.add_argument("--compact", type=int, default=4096)
    p.add_argument("--rollout-len", type=int, default=32)
    p.add_argument("--iters", type=int, default=6)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--modes", default="single,dual")
    p.add_argument("--scenes-dir",
                   default="/root/reference/data/processed/examples")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from gpudrive_lab_tpu import enable_compile_cache

    enable_compile_cache()

    results = {}
    for mode in args.modes.split(","):
        try:
            t0 = time.time()
            if mode == "single":
                shards = [build(args.worlds, args, seed=0)]
            else:
                shards = [build(args.worlds // 2, args, seed=s)
                          for s in range(2)]
            rows = [tf.metric_names.index("samples") for _, tf in shards]

            def run(key_base):
                """One timed window: iters interleaved dispatches per shard,
                block only on the final accumulated scalars."""
                accs = [jnp.float32(0) for _ in shards]
                for _ in range(args.iters):
                    for i, (env, tf) in enumerate(shards):
                        mvec = tf.step_raw(
                            env.reward_weights, jnp.float32(1e-3)
                        )
                        accs[i] = accs[i] + mvec[rows[i]].sum()
                for a in accs:
                    jax.block_until_ready(a)
                return sum(float(a) for a in accs)

            for i, (env, tf) in enumerate(shards):
                tf.replace_carry(rng=jax.random.PRNGKey(100 + i))
            run(0)  # compile + warm
            compile_s = time.time() - t0

            best_sps = 0.0
            for rep in range(args.repeats):
                for i, (env, tf) in enumerate(shards):
                    tf.replace_carry(rng=jax.random.PRNGKey(1 + 10 * rep + i))
                t0 = time.time()
                samples = run(rep)
                dt = time.time() - t0
                best_sps = max(best_sps, samples / dt)
            results[mode] = {
                "sps": round(best_sps), "compile_s": round(compile_s, 1),
            }
            del shards
        except Exception as e:  # noqa: BLE001 — record the failure mode
            results[mode] = {"error": f"{type(e).__name__}: {e}"[:300]}
        print(json.dumps({"mode": mode, **results[mode]}), flush=True)

    print(json.dumps({
        "metric": "rollout_overlap_probe",
        "worlds": args.worlds,
        "results": results,
    }))


if __name__ == "__main__":
    main()
