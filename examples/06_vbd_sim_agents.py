"""Tutorial 6: VBD diffusion sim agents driving uncontrolled traffic.

Mirror of the reference's pretrained-sim-agent tutorial
(reference: examples/tutorials/04_use_pretrained_sim_agent.ipynb), which
loads a VBD checkpoint and lets the diffusion model denoise future
trajectories for the non-policy agents.  No converted pretrained weights
ship with this repo yet (roadmap), so this example runs a *freshly
initialized* denoiser end-to-end: sample batch construction -> reverse
diffusion -> trajectory source -> `env.set_vbd_trajectories` -> VBD obs
block + distance-to-trajectory reward.  Swap ``init_variables`` for a real
checkpoint via ``--checkpoint`` once one exists.
"""

import argparse
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from gpudrive_lab_tpu.env.config import EnvConfig
from gpudrive_lab_tpu.env.env_jax import GPUDriveTPUEnv
from gpudrive_lab_tpu.vbd.integration import VBDTrajectorySource
from gpudrive_lab_tpu.vbd.model import DDPMScheduler, VBDConfig, VBDModel


def build_source(checkpoint: str | None, seed: int = 0):
    """A TrajectorySource backed by the flax VBD denoiser."""
    cfg = VBDConfig(
        future_len=20, agents_len=8, action_len=5, diffusion_steps=4,
        encoder_layers=1, hidden_dim=64, num_heads=2,
    )
    model = VBDModel(cfg)
    if checkpoint and os.path.exists(checkpoint):
        with open(checkpoint, "rb") as f:
            variables = pickle.load(f)
    else:
        # untrained weights — demonstrates the pipeline, not driving quality
        B, A, H = 1, cfg.agents_len, 11
        dummy = {
            "agents_history": jnp.zeros((B, A, H, 8)),
            "agents_id": jnp.arange(A)[None],
            "agents_interested": jnp.ones((B, A), jnp.int32),
            "polylines": jnp.zeros((B, 8, 10, 5)),
            "anchors": jnp.zeros((B, A, 2, 2)),
        }
        x = jnp.zeros((B, A, cfg.action_blocks, 2))
        t = jnp.zeros((B, A), jnp.int32)
        variables = model.init(jax.random.PRNGKey(seed), dummy, x, t)
    scheduler = DDPMScheduler(cfg.diffusion_steps)
    return VBDTrajectorySource(model, variables, scheduler, cfg, seed=seed)


def main():
    p = argparse.ArgumentParser()
    p.add_argument(
        "--scenes-dir", default="/root/reference/data/processed/examples"
    )
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--steps", type=int, default=10)
    args = p.parse_args()

    from gpudrive_lab_tpu.env.dataset import SceneDataLoader

    loader = SceneDataLoader(root=args.scenes_dir, batch_size=1,
                             dataset_size=1)
    env = GPUDriveTPUEnv(
        EnvConfig(num_worlds=1, reward_type="distance_to_vdb_trajs",
                  use_vbd=True, vbd_in_obs=True),
        data_loader=loader,
    )
    env.reset()

    # denoise once for the episode; re-call after swap_data_batch()
    env.set_vbd_trajectories(build_source(args.checkpoint))

    expert_actions = env.get_expert_actions()[0]  # [W, A, T, 10]
    for t in range(args.steps):
        # everyone follows the logged experts; the reward now measures
        # distance to the *denoised* trajectories instead
        env.step_dynamics(expert_actions[:, :, t])
        r = np.asarray(env.get_rewards())
        print(f"step {t:2d}  mean vbd-distance reward "
              f"{r[np.asarray(env.cont_agent_mask)].mean():+.3f}")

    # the 455-dim egocentric VBD obs block is appended when enabled
    obs = env.get_obs()
    print("obs dim with VBD block:", obs.shape[-1])


if __name__ == "__main__":
    main()
