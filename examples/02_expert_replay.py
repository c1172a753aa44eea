"""Tutorial 2: replay logged experts and validate goal-reaching.

Mirror of the reference's expert-replay tutorial; also demonstrates the
inverse-dynamics actions (reference: examples/tutorials/04).
"""

import argparse

import jax.numpy as jnp
import numpy as np

from gpudrive_lab_tpu.env.config import EnvConfig
from gpudrive_lab_tpu.env.env_jax import GPUDriveTPUEnv, _slice_t


def main():
    p = argparse.ArgumentParser()
    p.add_argument(
        "--scene", default="/root/reference/tests/pytest_data/test.json"
    )
    p.add_argument("--controlled", type=int, default=0,
                   help="0 = all-expert replay; N = N agents replay their "
                        "inverse actions through the dynamics model")
    args = p.parse_args()

    env = GPUDriveTPUEnv(
        EnvConfig(
            num_worlds=1,
            dynamics_model="delta_local",
            max_controlled_agents=args.controlled,
            dist_to_goal_threshold=1.0,
        ),
        scene_paths=[args.scene],
    )
    expert_actions, log_pos, log_vel, log_yaw, valids = env.get_expert_actions()
    env.reset()
    for t in range(env.episode_len):
        env.step_dynamics(_slice_t(expert_actions, t))
        if np.asarray(env.get_dones()).all():
            break
    infos = env.get_infos()
    valid = np.asarray(env.scene.agents.valid)
    print("agents:", valid.sum())
    print("reached goal:", int((np.asarray(infos["goal_achieved"]) * valid).sum()))
    print("collisions:", int((np.asarray(infos["collided"]) * valid).sum()
                             + (np.asarray(infos["off_road"]) * valid).sum()))


if __name__ == "__main__":
    main()
