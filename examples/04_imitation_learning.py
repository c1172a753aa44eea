"""Tutorial 4: the imitation-learning pipeline end to end.

Generate expert state-action pairs by log replay, train the attention BC
policy with the GMM loss, and evaluate closed-loop in the simulator
(reference: examples/tutorials on IL + baselines/il/il.py).
"""

import argparse
import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np

from gpudrive_lab_tpu.env.config import EnvConfig
from gpudrive_lab_tpu.env.env_jax import GPUDriveTPUEnv
from gpudrive_lab_tpu.il.data_generation import generate_state_action_pairs
from gpudrive_lab_tpu.il.dataset import ExpertDataset
from gpudrive_lab_tpu.il.networks import BCConfig, EarlyFusionAttnBCNet
from gpudrive_lab_tpu.il.train import (
    BCTrainConfig,
    evaluate_closed_loop,
    make_bc_train_step,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scene", default="/root/reference/tests/pytest_data/test.json")
    p.add_argument("--epochs", type=int, default=3)
    args = p.parse_args()

    env_cfg = EnvConfig(
        num_worlds=1, dynamics_model="delta_local",
        max_controlled_agents=0,  # all-expert for data generation
    )
    env = GPUDriveTPUEnv(env_cfg, scene_paths=[args.scene])
    data = generate_state_action_pairs(env)
    data["controlled_mask"] = data["valid_mask"]
    ds = ExpertDataset(data, rollout_len=3)
    print(f"dataset: {len(ds)} samples")

    bc_cfg = BCConfig(num_stack=3, network_dim=64, num_head=4,
                      num_fusion_layers=1)
    model = EarlyFusionAttnBCNet(bc_cfg)
    ex = ds.batch(np.arange(2))
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(ex["obs"]),
        jnp.asarray(ex["partner_mask"]), jnp.asarray(ex["road_mask"]),
    )
    cfg = BCTrainConfig(batch_size=64, epochs=args.epochs, rollout_len=3)
    tx, train_step = make_bc_train_step(model, cfg)
    opt = tx.init(variables)
    rng = np.random.default_rng(0)
    for epoch in range(cfg.epochs):
        losses = []
        for b in ds.iter_batches(cfg.batch_size, rng):
            jb = {k: jnp.asarray(v) for k, v in b.items()}
            variables, opt, loss = train_step(variables, opt, jb)
            losses.append(float(np.asarray(loss)))
        print(f"epoch {epoch}: gmm nll {np.mean(losses):.3f}")

    eval_env = GPUDriveTPUEnv(
        dataclasses.replace(env_cfg, max_controlled_agents=128),
        scene_paths=[args.scene],
    )
    print(json.dumps(evaluate_closed_loop(eval_env, model, variables, bc_cfg)))


if __name__ == "__main__":
    main()
