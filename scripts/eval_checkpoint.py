"""Closed-loop evaluation of a PPO checkpoint: deterministic (argmax)
rollouts over full episodes, reporting goal / collision / off-road rates
over controlled agents (reference: baselines/il/test/simulation.py closed-
loop harness and env_puffer.py episode stats).

Run: python scripts/eval_checkpoint.py --checkpoint runs/campaign/policy.pkl
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--scenes-dir",
                   default="/root/reference/data/processed/examples")
    p.add_argument("--num-worlds", type=int, default=8,
                   help="scene paths are tiled to this many worlds")
    p.add_argument("--episodes", type=int, default=1,
                   help="independent episodes (fresh resets) to average")
    p.add_argument("--stochastic", action="store_true",
                   help="sample actions instead of argmax")
    p.add_argument("--init-steps", type=int, default=11,
                   help="expert log-playback warmup applied at reset; "
                        "default matches the campaign / reference config")
    p.add_argument("--platform", default=None)
    p.add_argument("--keep-non-vehicles", action="store_true",
                   help="create pedestrian/cyclist agents (match a "
                        "campaign trained with --keep-non-vehicles)")
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from gpudrive_lab_tpu.agents import PolicyActor
    from gpudrive_lab_tpu.env.config import EnvConfig
    from gpudrive_lab_tpu.env.env_jax import GPUDriveTPUEnv
    from gpudrive_lab_tpu.networks.late_fusion import PolicyConfig
    from gpudrive_lab_tpu.utils.multi_policy_rollout import (
        multi_policy_rollout,
    )

    paths = sorted(
        os.path.join(args.scenes_dir, f)
        for f in os.listdir(args.scenes_dir)
        if f.endswith(".json")
    )
    if not paths:
        raise SystemExit(f"no scene .json files found in {args.scenes_dir}")
    paths = (paths * ((args.num_worlds // len(paths)) + 1))[: args.num_worlds]
    # Mirror the training env configuration (ppo/train.py main): the
    # checkpoint's action head is sized for the classic 13x7 action grid.
    env = GPUDriveTPUEnv(
        EnvConfig(
            num_worlds=args.num_worlds,
            reward_type="weighted_combination",
            collision_weight=-0.75,
            off_road_weight=-0.75,
            goal_achieved_weight=1.0,
            dynamics_model="classic",
            collision_behavior="ignore",
            init_steps=args.init_steps,
            remove_non_vehicles=not args.keep_non_vehicles,
        ),
        scene_paths=paths,
    )

    ck = args.checkpoint
    if (
        ck.endswith((".pt", ".bin", ".safetensors"))
        or (os.path.isdir(ck) and os.path.exists(os.path.join(ck, "model.safetensors")))
        or (not os.path.exists(ck) and "/" in ck)
    ):
        # A reference-trained torch NeuralNet checkpoint (local file, hub
        # layout dir, or HF repo id) — convert to flax and eval it in the
        # TPU sim (reference: examples/experimental/eval_utils.py:15,56).
        from gpudrive_lab_tpu.networks.convert import load_pretrained

        _, variables, pc = load_pretrained(ck)
        assert pc.action_dim == env.action_space_n, (
            f"checkpoint action_dim {pc.action_dim} != env "
            f"{env.action_space_n}"
        )
        actor = PolicyActor(
            None,
            variables=variables,
            policy_config=pc,
            deterministic=not args.stochastic,
        )
    else:
        actor = PolicyActor(
            None,
            checkpoint_path=ck,
            policy_config=PolicyConfig(action_dim=env.action_space_n),
            deterministic=not args.stochastic,
        )
    mask = np.asarray(env.cont_agent_mask)

    episodes = args.episodes
    if not args.stochastic and episodes > 1:
        # argmax actions + deterministic reset -> every episode would be
        # bit-identical; don't waste rollouts pretending to average
        print(json.dumps({"note": "deterministic mode: episodes forced to 1"}))
        episodes = 1

    per_ep = []
    for ep in range(episodes):
        actor._rng = jax.random.PRNGKey(ep)
        m = multi_policy_rollout(env, {"policy": actor}, {"policy": mask})
        per_ep.append(m["policy"])

    agg = {
        k: float(np.mean([m[k] for m in per_ep]))
        for k in ("goal_achieved", "collided", "off_road")
    }
    agg.update(
        episodes=episodes,
        controlled_agents=int(mask.sum()),
        num_worlds=args.num_worlds,
        deterministic=not args.stochastic,
        checkpoint=args.checkpoint,
    )
    print(json.dumps(agg))


if __name__ == "__main__":
    main()
