"""Behavior-cloning trainer.

Mirror of the reference's IL loop (reference: baselines/il/il.py:182-367):
AdamW over the attention BC net with GMM negative log-likelihood (plus
optional smooth-L1), periodic closed-loop evaluation in the simulator
(goal-reached / collision rates, reference: baselines/il/test/simulation.py).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import pickle
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gpudrive_lab_tpu.env.config import EnvConfig
from gpudrive_lab_tpu.env.dataset import SceneDataLoader
from gpudrive_lab_tpu.env.env_jax import GPUDriveTPUEnv
from gpudrive_lab_tpu.il.data_generation import generate_state_action_pairs
from gpudrive_lab_tpu.il.dataset import ExpertDataset
from gpudrive_lab_tpu.il.networks import (
    BCConfig,
    EarlyFusionAttnBCNet,
    gmm_log_prob,
    gmm_sample,
)


@dataclasses.dataclass
class BCTrainConfig:
    lr: float = 3e-4
    weight_decay: float = 1e-4
    batch_size: int = 256
    epochs: int = 10
    rollout_len: int = 5
    loss: str = "gmm"  # gmm | l1


def make_bc_train_step(model: EarlyFusionAttnBCNet, config: BCTrainConfig):
    tx = optax.adamw(config.lr, weight_decay=config.weight_decay)

    def loss_fn(variables, batch):
        _, (means, variances, weights) = model.apply(
            variables, batch["obs"], batch["partner_mask"], batch["road_mask"]
        )
        actions = batch["actions"][:, 0]  # pred_len=1
        if config.loss == "gmm":
            ll = gmm_log_prob(actions, means, variances, weights)
            loss = -ll.mean()
        else:
            pred = gmm_sample(None, means, variances, weights, True)
            diff = jnp.abs(pred - actions)
            loss = jnp.where(diff < 1.0, 0.5 * diff * diff, diff - 0.5).mean()
        return loss

    @jax.jit
    def train_step(variables, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(variables, batch)
        updates, opt_state = tx.update(grads, opt_state, variables)
        variables = optax.apply_updates(variables, updates)
        return variables, opt_state, loss

    return tx, train_step


def evaluate_closed_loop(env: GPUDriveTPUEnv, model, variables,
                         bc_config: BCConfig, max_steps: int = 91):
    """Drive controlled agents with the BC policy and report metrics
    (reference: baselines/il/test/simulation.py closed-loop eval)."""
    obs = env.reset()
    rng = jax.random.PRNGKey(0)
    apply = jax.jit(model.apply)
    ns = bc_config.num_stack
    W, A = env.num_worlds, env.max_agent_count
    frames = [np.asarray(obs)] * ns
    for _ in range(max_steps):
        stacked = np.concatenate(frames[-ns:], axis=-1).reshape(W * A, -1)
        pm = np.asarray(env.get_partner_mask()).reshape(W * A, -1) != 0
        rm = np.asarray(env.get_road_mask()).reshape(W * A, -1)
        _, (means, variances, weights) = apply(
            variables, jnp.asarray(stacked), jnp.asarray(pm), jnp.asarray(rm)
        )
        rng, k = jax.random.split(rng)
        act = gmm_sample(k, means, variances, weights)
        act3 = np.asarray(act).reshape(W, A, 3)
        env.step_dynamics(jnp.asarray(act3))
        obs = env.get_obs()
        frames.append(np.asarray(obs))
        if np.asarray(env.get_dones()).all():
            break
    infos = env.get_infos()
    ctrl = np.asarray(env.cont_agent_mask)
    n = max(ctrl.sum(), 1)
    return {
        "goal_rate": float((np.asarray(infos["goal_achieved"]) * ctrl).sum() / n),
        "collision_rate": float((np.asarray(infos["collided"]) * ctrl).sum() / n),
        "off_road_rate": float((np.asarray(infos["off_road"]) * ctrl).sum() / n),
    }


def _concat_data_batches(parts: list[dict]) -> dict:
    """Concatenate per-scene-batch rollout dicts along the world axis.

    [T, W, ...] arrays concat on axis 1; [W, A] masks on axis 0."""
    out = {}
    for k in parts[0]:
        axis = 0 if k in ("controlled_mask", "valid_mask") else 1
        out[k] = np.concatenate([p[k] for p in parts], axis=axis)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-dir", default="/root/reference/data/processed/examples")
    p.add_argument("--num-worlds", type=int, default=2)
    p.add_argument("--num-batches", type=int, default=1,
                   help="scene batches to roll out for expert data "
                        "(num_worlds scenes each, advanced with "
                        "swap_data_batch — the IL scaling axis)")
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--agent-bucket", type=int, default=None,
                   help="pad the agent axis to this bucket (memory lever "
                        "for large scene pools; obs width tracks it)")
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--eval-heldout", action="store_true",
                   help="also evaluate closed-loop on the NEXT (unseen) "
                        "scene batch from the loader")
    p.add_argument("--out", default="runs/bc_policy.pkl")
    p.add_argument("--platform", default=None,
                   help="force a jax platform (e.g. 'cpu' for local smoke)")
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    loader = SceneDataLoader(
        root=args.data_dir, batch_size=args.num_worlds, dataset_size=100000
    )
    env_cfg = EnvConfig(
        num_worlds=args.num_worlds,
        dynamics_model="delta_local",
        collision_behavior="ignore",
        max_controlled_agents=0,  # all-expert for data generation
        agent_bucket=args.agent_bucket,
    )
    env = GPUDriveTPUEnv(env_cfg, data_loader=loader)
    parts = [generate_state_action_pairs(env)]
    first_batch_paths = list(env.scene_paths)
    trained_paths = set(first_batch_paths)
    for b in range(1, args.num_batches):
        env.swap_data_batch()
        trained_paths.update(env.scene_paths)
        parts.append(generate_state_action_pairs(env))
        print(f"data batch {b + 1}/{args.num_batches} collected", flush=True)
    data = _concat_data_batches(parts)
    del parts
    # For BC training, treat every valid agent's log as supervision.
    data["controlled_mask"] = data["valid_mask"]
    cfg = BCTrainConfig(batch_size=args.batch_size, epochs=args.epochs,
                        lr=args.lr)
    ds = ExpertDataset(data, rollout_len=cfg.rollout_len)
    print(f"dataset: {len(ds)} samples "
          f"({args.num_batches * args.num_worlds} scenes)")

    # NB: the flat-obs ABI is fixed at 127 partner slots even when the sim's
    # agent axis is bucketed (env_jax pads raw rows with id=-2 fillers), so
    # BCConfig keeps its defaults regardless of --agent-bucket.
    bc_cfg = BCConfig(num_stack=cfg.rollout_len)
    model = EarlyFusionAttnBCNet(bc_cfg)
    rng = np.random.default_rng(0)
    example = ds.batch(np.arange(2))
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(example["obs"]),
        jnp.asarray(example["partner_mask"]),
        jnp.asarray(example["road_mask"]),
    )
    tx, train_step = make_bc_train_step(model, cfg)
    opt_state = tx.init(variables)

    t0 = time.time()
    for epoch in range(cfg.epochs):
        losses = []
        for batch in ds.iter_batches(cfg.batch_size, rng):
            jb = {k: jnp.asarray(v) for k, v in batch.items()}
            variables, opt_state, loss = train_step(variables, opt_state, jb)
            losses.append(float(np.asarray(loss)))
        print(
            json.dumps(
                dict(epoch=epoch, loss=round(float(np.mean(losses)), 4),
                     elapsed=round(time.time() - t0, 1))
            ),
            flush=True,
        )

    import os

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "wb") as f:
        pickle.dump(
            {"variables": jax.tree.map(np.asarray, variables),
             "config": dataclasses.asdict(bc_cfg)},
            f,
        )
    # Closed-loop eval needs an env where the policy actually controls
    # agents (the data-generation env was all-expert).  In-distribution
    # eval runs on the FIRST training batch; --eval-heldout additionally
    # pulls the next, never-trained-on batch from the same loader.
    eval_cfg = dataclasses.replace(env_cfg, max_controlled_agents=128)
    eval_env = GPUDriveTPUEnv(eval_cfg, scene_paths=first_batch_paths)
    metrics = evaluate_closed_loop(eval_env, model, variables, bc_cfg)
    print(json.dumps({"split": "train", **metrics}))
    if args.eval_heldout:
        # The loader may be exhausted (small data dirs) or may have wrapped
        # around during multi-batch collection — either way a "heldout" label
        # would be a lie, so skip with a warning rather than crash or mislabel.
        try:
            heldout_paths = next(env.data_iterator)
        except StopIteration:
            print(json.dumps({"split": "heldout",
                              "skipped": "data loader exhausted"}))
            heldout_paths = None
        if heldout_paths is not None:
            overlap = trained_paths.intersection(heldout_paths)
            if overlap:
                print(json.dumps({
                    "split": "heldout",
                    "skipped": f"{len(overlap)} of {len(heldout_paths)} "
                               "candidate scenes were trained on "
                               "(loader wrapped around)"}))
            else:
                heldout_env = GPUDriveTPUEnv(eval_cfg,
                                             scene_paths=heldout_paths)
                metrics = evaluate_closed_loop(heldout_env, model,
                                               variables, bc_cfg)
                print(json.dumps({"split": "heldout", **metrics}))


if __name__ == "__main__":
    main()
