"""Tutorial 1: load scenes, step the simulator, inspect observations.

Mirror of the reference's tutorials 01-03 (reference: examples/tutorials/).
Run: python examples/01_simulate.py [--scenes-dir DIR]
"""

import argparse

import jax.numpy as jnp
import numpy as np

from gpudrive_lab_tpu.env.config import EnvConfig
from gpudrive_lab_tpu.env.dataset import SceneDataLoader
from gpudrive_lab_tpu.env.env_jax import GPUDriveTPUEnv


def main():
    p = argparse.ArgumentParser()
    p.add_argument(
        "--scenes-dir", default="/root/reference/data/processed/examples"
    )
    args = p.parse_args()

    loader = SceneDataLoader(
        root=args.scenes_dir, batch_size=2, dataset_size=100
    )
    env = GPUDriveTPUEnv(EnvConfig(num_worlds=2), data_loader=loader)

    obs = env.reset()
    print("scenes:", env.get_env_filenames())
    print("obs shape:", obs.shape)  # [worlds, agents, 3368]
    print("controlled per world:", np.asarray(env.cont_agent_mask).sum(1))

    rng = np.random.default_rng(0)
    for t in range(10):
        actions = rng.integers(0, env.action_space_n, (2, 128))
        env.step_dynamics(jnp.asarray(actions))
    print("rewards:", float(np.asarray(env.get_rewards()).sum()))
    infos = env.get_infos()
    print("collisions so far:", int(np.asarray(infos["collided"]).sum()))

    # named views over the raw observation collectors
    from gpudrive_lab_tpu.core import observations as obsmod
    from gpudrive_lab_tpu.datatypes.observation import LocalEgoState

    ego = LocalEgoState.from_array(
        np.asarray(obsmod.self_observation(env.scene, env.state))
    )
    print("max speed on the road:", float(np.asarray(ego.speed).max()))

    img = env.render(0, zoom_radius=80)
    try:
        import matplotlib.pyplot as plt

        plt.imsave("/tmp/sim_state.png", img)
        print("wrote /tmp/sim_state.png")
    except Exception:
        pass


if __name__ == "__main__":
    main()
