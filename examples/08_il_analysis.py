"""IL policy analysis: importance weights, linear-probe intervention, replay.

Mirror of the fork's analysis scripts (reference:
baselines/il/test/importance_weight.py, intervention.py, simulation.py):

  1. generate expert data and quick-train a BC policy,
  2. roll it out closed-loop collecting attention importance and tokens,
  3. train ego/partner future-position probes on the frozen tokens,
  4. run the intervention experiment (push a partner-probe class direction
     into the ego token and watch the ego prediction move),
  5. write the overlay figures: per-head importance, probe grid with
     predicted paths, policy-vs-log replay comparison.

Run: python examples/08_il_analysis.py --scenes-dir <dir> --out runs/il_analysis
"""

import argparse
import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scenes-dir",
                   default="/root/reference/data/processed/examples")
    p.add_argument("--num-worlds", type=int, default=2)
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--future-step", type=int, default=10)
    p.add_argument("--rollout-steps", type=int, default=30)
    p.add_argument("--intervention-label", type=int, default=10)
    p.add_argument("--out", default="runs/il_analysis")
    args = p.parse_args()
    if not os.path.isdir(args.scenes_dir):
        args.scenes_dir = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "..", "tests", "data"
        )

    from gpudrive_lab_tpu.env.config import EnvConfig
    from gpudrive_lab_tpu.env.dataset import SceneDataLoader
    from gpudrive_lab_tpu.env.env_jax import GPUDriveTPUEnv
    from gpudrive_lab_tpu.il import analysis
    from gpudrive_lab_tpu.il.data_generation import generate_state_action_pairs
    from gpudrive_lab_tpu.il.dataset import ExpertDataset
    from gpudrive_lab_tpu.il.linear_probing import ProbeConfig
    from gpudrive_lab_tpu.il.networks import BCConfig, EarlyFusionAttnBCNet
    from gpudrive_lab_tpu.il.train import BCTrainConfig, make_bc_train_step

    os.makedirs(args.out, exist_ok=True)
    loader = SceneDataLoader(
        root=args.scenes_dir, batch_size=args.num_worlds, dataset_size=100
    )
    env_cfg = EnvConfig(
        num_worlds=args.num_worlds, dynamics_model="delta_local",
        collision_behavior="ignore", max_controlled_agents=0,
    )
    env = GPUDriveTPUEnv(env_cfg, data_loader=loader)
    data = generate_state_action_pairs(env)
    data["controlled_mask"] = data["valid_mask"]
    cfg = BCTrainConfig(epochs=args.epochs, batch_size=128)
    ds = ExpertDataset(data, rollout_len=cfg.rollout_len)
    print(f"dataset: {len(ds)} samples")

    bc_cfg = BCConfig(num_stack=cfg.rollout_len)
    model = EarlyFusionAttnBCNet(bc_cfg)
    ex = ds.batch(np.arange(2))
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(ex["obs"]),
        jnp.asarray(ex["partner_mask"]), jnp.asarray(ex["road_mask"]),
    )
    tx, train_step = make_bc_train_step(model, cfg)
    opt_state = tx.init(variables)
    rng = np.random.default_rng(0)
    for epoch in range(cfg.epochs):
        losses = []
        for batch in ds.iter_batches(cfg.batch_size, rng):
            jb = {k: jnp.asarray(v) for k, v in batch.items()}
            variables, opt_state, loss = train_step(variables, opt_state, jb)
            losses.append(float(np.asarray(loss)))
        print(json.dumps({"epoch": epoch, "bc_loss": round(np.mean(losses), 4)}))

    # ---- probes on frozen tokens ------------------------------------------
    tokens = analysis.extract_token_dataset(model, variables, ds)
    labels = analysis.probe_labels_from_positions(ds, args.future_step)
    t, w, a = ds.index.T
    partner_valid = ds.data["partner_mask"][t, w, a] == 0
    ego_probe, other_probe, probe_metrics = analysis.train_position_probes(
        tokens, labels, partner_valid, ProbeConfig(epochs=2)
    )
    print(json.dumps({"probes": probe_metrics}))

    # ---- closed-loop rollout with analysis collection ---------------------
    eval_env = GPUDriveTPUEnv(
        dataclasses.replace(env_cfg, max_controlled_agents=128),
        scene_paths=env.scene_paths,
    )
    result = analysis.closed_loop_rollout(
        eval_env, model, variables, bc_cfg, max_steps=args.rollout_steps,
        collect_importance=True, collect_tokens=True, collect_states=True,
    )
    print(json.dumps({"closed_loop": result.metrics}))

    # ---- intervention ------------------------------------------------------
    ctrl = np.asarray(eval_env.cont_agent_mask)
    ego_rows = np.argmax(ctrl, axis=1)  # first controlled agent per world
    w_idx = 0
    ego_tok_t = result.ego_tokens[:, w_idx, ego_rows[w_idx]]  # [T, D]
    iv = analysis.intervention_effect(
        ego_probe, other_probe, ego_tok_t, args.intervention_label
    )
    changed = float((iv["ego_pred"] != iv["ego_pred_prime"]).mean())
    print(json.dumps({"intervention_changed_frac": changed}))

    # ---- overlay figures ---------------------------------------------------
    import matplotlib.pyplot as plt

    vis = eval_env.vis
    state = eval_env.state
    imgs = vis.plot_importance_weight(
        state, w_idx, result.importance[-1, w_idx], int(ego_rows[w_idx]),
        zoom_radius=50.0,
    )
    for h, img in enumerate(imgs):
        plt.imsave(os.path.join(args.out, f"importance_head{h}.png"), img)

    ro_tok_t = result.ro_tokens[-1, w_idx, ego_rows[w_idx]]  # [A-1, D]
    partner_cells = analysis.predict_partner_cells(other_probe, ro_tok_t)
    horizon = range(1, 4)
    img = vis.plot_linear_probing(
        state, w_idx, int(ego_rows[w_idx]),
        ego_pred=[iv["ego_pred"][-1]] * len(list(horizon)),
        ego_pred_prime=[iv["ego_pred_prime"][-1]] * 3,
        partner_pred=[int(partner_cells[0])] * 3,
    )
    plt.imsave(os.path.join(args.out, "linear_probing.png"), img)

    img = vis.plot_log_replay_comparison(result.positions, w_idx)
    plt.imsave(os.path.join(args.out, "log_replay_comparison.png"), img)
    print(f"figures written to {args.out}")


if __name__ == "__main__":
    main()
