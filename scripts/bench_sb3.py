"""SB3-stack training-throughput bench (VERDICT r4 item 9).

Measures the Masked-rollout-buffer IPPO stack (env/wrappers/sb3_learner.py)
end-to-end — the counterpart of the reference's SB3 integration row
("Training SPS 25-50K", reference: README.md:175-177) — and prints the same
one-line JSON schema as bench.py.

Methodology: this stack python-dispatches act/step per env step (that is its
design, mirroring the reference's SB3 loop), so plain wall-clock timing is
honest — every dispatch consumes fresh observations, nothing memoizes.  The
first learn window is discarded (XLA compiles); `--windows` further windows
are timed.  SPS counts VALID (live controlled-agent) samples, the same
filtering the reference's MaskedRolloutBuffer applies.
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--worlds", type=int, default=32)
    p.add_argument("--scenes-dir",
                   default="/root/reference/data/processed/examples")
    p.add_argument("--n-steps", type=int, default=91,
                   help="rollout length (reference sb3 default: one episode)")
    p.add_argument("--n-epochs", type=int, default=5)
    p.add_argument("--batch-size", type=int, default=1024)
    p.add_argument("--windows", type=int, default=2,
                   help="timed learn windows after the compile window")
    p.add_argument("--platform", default=None, help="cpu to force local CPU")
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from gpudrive_lab_tpu.env.config import EnvConfig
    from gpudrive_lab_tpu.env.dataset import SceneDataLoader
    from gpudrive_lab_tpu.env.wrappers.sb3_learner import IPPO, IPPOConfig
    from gpudrive_lab_tpu.env.wrappers.sb3_wrapper import SB3MultiAgentEnv
    from gpudrive_lab_tpu import enable_compile_cache

    enable_compile_cache()
    loader = SceneDataLoader(
        root=args.scenes_dir, batch_size=args.worlds,
        dataset_size=max(args.worlds, 4),
    )
    env = SB3MultiAgentEnv(EnvConfig(num_worlds=args.worlds), loader)
    learner = IPPO(env, IPPOConfig(
        n_steps=args.n_steps, batch_size=args.batch_size,
        n_epochs=args.n_epochs,
    ))

    # window 0: compile + warm caches, untimed
    learner.collect_rollouts()
    learner.train()
    start_steps = learner.num_timesteps

    t0 = time.time()
    window_metrics = []
    for _ in range(args.windows):
        learner.collect_rollouts()
        m = learner.train()
        window_metrics.append(m)
    elapsed = time.time() - t0
    samples = learner.num_timesteps - start_steps
    sps = samples / elapsed

    print(json.dumps({
        "mode": "sb3_ippo_train",
        "worlds": args.worlds,
        "num_envs": env.num_envs,
        "n_steps": args.n_steps,
        "windows": args.windows,
        "valid_samples": samples,
        "elapsed_s": round(elapsed, 3),
        "backend": jax.default_backend(),
        "v_loss": round(window_metrics[-1].get("v_loss", float("nan")), 4),
    }))
    # reference SB3 band midpoint (37.5K SPS) as the comparison point
    print(json.dumps({
        "metric": "sb3_train_sps",
        "value": round(sps, 1),
        "unit": "valid-agent-steps/s",
        "vs_baseline": round(sps / 37500.0, 4),
    }))


if __name__ == "__main__":
    main()
