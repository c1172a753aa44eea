"""Tutorial 9: evaluate a released reference policy in the TPU sim.

Counterpart of the reference's pretrained-policy workflow (reference:
README.md:207-231 ``NeuralNet.from_pretrained(...)`` and
examples/experimental/eval_utils.py:15,56): load a torch ``NeuralNet``
checkpoint (HF hub id, local dir, or file), convert it to the flax
``LateFusionPolicy``, roll it closed-loop, and render a frame.

    python examples/09_pretrained_policy.py --checkpoint model.safetensors
    python examples/09_pretrained_policy.py \
        --checkpoint daphne-cornelisse/policy_S10_000_02_27  # needs network

Without --checkpoint it synthesizes a random NeuralNet-layout checkpoint so
the full conversion + rollout pipeline still runs offline.
"""

import argparse
import os
import tempfile

import numpy as np


def synth_checkpoint() -> str:
    """A random state_dict in the torch NeuralNet layout (for offline demo).
    reference: gpudrive/networks/late_fusion.py:117-167 module names."""
    from safetensors.numpy import save_file

    rng = np.random.default_rng(0)
    sd = {}

    def lin(o, i, name):
        sd[f"{name}.weight"] = rng.normal(0, 0.05, (o, i)).astype(np.float32)
        sd[f"{name}.bias"] = np.zeros(o, np.float32)

    for name, ind in (
        ("ego_embed", 6), ("partner_embed", 6), ("road_map_embed", 13)
    ):
        lin(64, ind, f"{name}.0")
        sd[f"{name}.1.weight"] = np.ones(64, np.float32)
        sd[f"{name}.1.bias"] = np.zeros(64, np.float32)
        lin(64, 64, f"{name}.4")
    lin(128, 192, "shared_embed.0")
    lin(91, 128, "actor")
    lin(1, 128, "critic")
    d = tempfile.mkdtemp()
    save_file(sd, os.path.join(d, "model.safetensors"))
    return d


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", default=None,
                   help="HF repo id, dir with model.safetensors, or file; "
                        "default synthesizes random weights (offline demo)")
    p.add_argument("--scenes-dir",
                   default="/root/reference/data/processed/examples")
    p.add_argument("--num-worlds", type=int, default=2)
    p.add_argument("--steps", type=int, default=91)
    p.add_argument("--out", default="/tmp/pretrained_rollout.png")
    p.add_argument("--platform", default=None)
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from gpudrive_lab_tpu.agents import PolicyActor
    from gpudrive_lab_tpu.env.config import EnvConfig
    from gpudrive_lab_tpu.env.env_jax import GPUDriveTPUEnv
    from gpudrive_lab_tpu.networks.convert import load_pretrained
    from gpudrive_lab_tpu.utils.multi_policy_rollout import (
        multi_policy_rollout,
    )

    ckpt = args.checkpoint or synth_checkpoint()
    policy, variables, pc = load_pretrained(ckpt)
    print(f"loaded {ckpt}: action_dim={pc.action_dim}, "
          f"hidden={pc.hidden_dim}")

    paths = sorted(
        os.path.join(args.scenes_dir, f)
        for f in os.listdir(args.scenes_dir)
        if f.endswith(".json")
    )[: args.num_worlds]
    env = GPUDriveTPUEnv(
        EnvConfig(num_worlds=len(paths), init_steps=11), scene_paths=paths
    )
    actor = PolicyActor(
        None, variables=variables, policy_config=pc, deterministic=True
    )
    mask = np.asarray(env.cont_agent_mask)
    metrics = multi_policy_rollout(
        env, {"pretrained": actor}, {"pretrained": mask},
        max_steps=args.steps,
    )["pretrained"]
    print({k: round(float(v), 3) for k, v in metrics.items()})

    img = env.render(0, zoom_radius=80)
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.imsave(args.out, img)
        print(f"frame written to {args.out}")
    except Exception as e:  # pragma: no cover
        print(f"render skipped: {e}")


if __name__ == "__main__":
    main()
