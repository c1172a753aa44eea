"""Tutorial 3: roll out (mixed) policies and render.

Mirror of the reference's viz_rollouts / show_agent_behaviors examples
(reference: examples/experimental/).
"""

import argparse

import numpy as np

from gpudrive_lab_tpu.agents import PolicyActor, RandomActor
from gpudrive_lab_tpu.env.config import EnvConfig
from gpudrive_lab_tpu.env.env_jax import GPUDriveTPUEnv
from gpudrive_lab_tpu.networks.late_fusion import (
    LateFusionPolicy,
    PolicyConfig,
)
from gpudrive_lab_tpu.utils.multi_policy_rollout import multi_policy_rollout


def main():
    p = argparse.ArgumentParser()
    p.add_argument(
        "--scenes-dir", default="/root/reference/data/processed/examples"
    )
    p.add_argument("--checkpoint", default=None,
                   help="pickle from ppo/train; random policy if omitted")
    args = p.parse_args()

    import os

    paths = sorted(
        os.path.join(args.scenes_dir, f)
        for f in os.listdir(args.scenes_dir)
        if f.endswith(".json")
    )[:2]
    env = GPUDriveTPUEnv(EnvConfig(num_worlds=2), scene_paths=paths)

    ctrl = np.asarray(env.cont_agent_mask)
    ids = np.nonzero(ctrl.reshape(-1))[0]
    half = len(ids) // 2
    m1 = np.zeros(ctrl.size, bool)
    m1[ids[:half]] = True
    m2 = np.zeros(ctrl.size, bool)
    m2[ids[half:]] = True

    if args.checkpoint:
        actor_a = PolicyActor(
            None, checkpoint_path=args.checkpoint,
            policy_config=PolicyConfig(action_dim=env.action_space_n),
        )
    else:
        actor_a = RandomActor(None, env.action_space_n, seed=1)
    actor_b = RandomActor(None, env.action_space_n, seed=2)

    metrics = multi_policy_rollout(
        env,
        {"policy_a": actor_a, "policy_b": actor_b},
        {"policy_a": m1.reshape(ctrl.shape), "policy_b": m2.reshape(ctrl.shape)},
    )
    for name, m in metrics.items():
        print(name, {k: round(v, 3) for k, v in m.items()})

    import matplotlib.pyplot as plt

    img = env.render(0, zoom_radius=80)
    plt.imsave("/tmp/rollout.png", img)
    print("wrote /tmp/rollout.png")


if __name__ == "__main__":
    main()
