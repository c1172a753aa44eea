"""Headless throughput benchmark.

TPU-native analogue of the reference's headless driver
(reference: src/headless.cpp:125-155): steps a batch of worlds with random
discrete actions and reports **agent-normalized steps/s** =
steps x sum(per-world created agents) / wall time — the reference's headline
metric ("1M FPS", README.md:10).

The benched program is one jit-compiled scan iteration per step: random
action draw -> fused sim step (movement/collision/reward/done) -> observation
collection (self + partner + K-nearest road graph, the default RL obs path)
-> reset-as-select for finished worlds.  Obs are carried to force their
materialization, matching the reference where obs collectors write out every
step.

Prints ONE JSON line:
  {"metric": "agent_steps_per_sec", "value": N, "unit": "agent-steps/s",
   "vs_baseline": N / 1e6}
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np


def bench_train(args):
    """End-to-end PPO training throughput (VERDICT r1 item 2): the measured
    metric is CONTROLLED-AGENT SAMPLES consumed by the learner per second of
    wall time over full train iterations (python-dispatch rollout + jitted
    GAE/minibatch update) — directly comparable to the reference's
    PufferLib "Training SPS" of 100-300K (reference: README.md:178).

    Methodology as the sim bench: consumed scalar accumulator, fresh PRNG
    chain per repetition, best-of-N."""
    import jax
    import jax.numpy as jnp

    from gpudrive_lab_tpu.env.config import EnvConfig
    from gpudrive_lab_tpu.env.dataset import SceneDataLoader
    from gpudrive_lab_tpu.env.env_jax import GPUDriveTPUEnv
    from gpudrive_lab_tpu.ppo.ppo import PPOConfig
    from gpudrive_lab_tpu.ppo.train import build_trainer

    worlds = args.worlds or (2 if args.smoke else 128)
    if not os.path.isdir(args.scenes_dir):
        args.scenes_dir = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "tests", "data"
        )
    loader = SceneDataLoader(
        root=args.scenes_dir, batch_size=worlds, dataset_size=1000,
        sample_with_replacement=True, seed=0,
    )
    cfg = EnvConfig(
        num_worlds=worlds,
        reward_type="weighted_combination",
        collision_weight=-0.75, off_road_weight=-0.75,
        goal_achieved_weight=1.0,
        dynamics_model="classic", collision_behavior="ignore",
        init_steps=args.init_steps,
        road_gather=args.road_gather,
        approx_top_k=args.train_approx_top_k,
        use_tile_collision={"auto": None, "on": True, "off": False}[args.tiles],
        agent_bucket=(
            int(args.agent_bucket)
            if args.agent_bucket and args.agent_bucket != "auto"
            else args.agent_bucket
        ),
    )
    env = GPUDriveTPUEnv(cfg, data_loader=loader, max_roads=args.max_roads)
    t0 = time.time()
    ppo_cfg = PPOConfig(
        rollout_len=args.rollout_len,
        num_minibatches=args.num_minibatches,
        update_epochs=args.update_epochs,
        remat_obs=args.obs_store == "remat",
        obs_store_dtype="bfloat16" if args.obs_store.endswith("bf16")
        else "float32",
        obs_store="split" if args.obs_store.startswith("split") else "flat",
        compact=args.compact,
        compact_mode=args.compact_mode,
        compact_blocks=args.compact_blocks,
        policy_dtype="bfloat16" if args.policy_dtype == "bf16"
        else "float32",
        minibatch_rows=args.minibatch_rows,
        epoch_preshuffle=args.epoch_preshuffle,
        embed_remat=args.embed_remat,
        fused_embed=args.fused_embed,
    )
    policy, variables, opt_state, carry, fresh, train_fn = build_trainer(
        env, ppo_cfg, seed=0, rollout_mode=args.rollout_mode,
        iters_per_dispatch=args.iters_per_dispatch,
        packed_io=args.packed_io,
    )
    iters = 2 if args.smoke else args.train_iters

    # Pass ent_coef as a runtime f32 scalar exactly like the train CLI does:
    # the traced program is then IDENTICAL to the campaign's (same shapes,
    # same runtime args), so these bench runs warm the campaign's entry in
    # the persistent XLA compile cache — and measure the real program, not a
    # constant-folded variant.
    ent = jnp.float32(args.ent_coef)

    if args.packed_io:
        # train_fn is a PackedTrainer: state stays on-device as per-dtype
        # packed buffers; the bench only accumulates the consumed-samples
        # scalar from the metrics vector.  The per-repetition rng reseed
        # happens in reseed(), OUTSIDE the timed region — replace_carry
        # round-trips the full ~227-leaf state (2 dispatches), the very
        # overhead packed-io exists to avoid.
        samples_row = train_fn.metric_names.index("samples")

        def reseed(carry, key):
            train_fn.replace_carry(rng=key)
            return carry

        def run(variables, opt_state, carry, key=None):
            samples = jnp.float32(0)
            for _ in range(iters):
                mvec = train_fn.step_raw(env.reward_weights, ent)
                samples = samples + mvec[samples_row].sum()
                jax.block_until_ready(samples)
            return variables, opt_state, carry, float(samples)
    else:
        def reseed(carry, key):
            return carry._replace(rng=key)

        def run(variables, opt_state, carry, key=None):
            samples = jnp.float32(0)
            for _ in range(iters):
                variables, opt_state, carry, metrics = train_fn(
                    env.scene, variables, opt_state, carry, fresh,
                    env.reward_weights, ent,
                )
                # with --iters-per-dispatch K, metrics have a leading [K] axis
                samples = samples + metrics["samples"].sum()
                # Serialize iterations: queueing several giant train programs
                # lets their HLO temporaries coexist in HBM and faults the
                # worker (observed at W=128); one block per iteration bounds
                # in-flight memory at negligible timing cost.
                jax.block_until_ready(samples)
            return variables, opt_state, carry, float(samples)

    carry = reseed(carry, jax.random.PRNGKey(0))
    variables, opt_state, carry, _ = run(
        variables, opt_state, carry
    )  # warmup/compile
    compile_s = time.time() - t0

    best = None
    best_samples = 0.0
    for rep in range(args.repeats):
        carry = reseed(carry, jax.random.PRNGKey(1 + rep))  # untimed
        t0 = time.time()
        variables, opt_state, carry, samples = run(
            variables, opt_state, carry
        )
        dt = time.time() - t0
        if best is None or samples / dt > best_samples / best:
            best, best_samples = dt, samples

    sps = best_samples / best
    meta = {
        "mode": "train",
        "worlds": worlds,
        "rollout_len": args.rollout_len,
        "iters": iters,
        "samples_per_iter": round(best_samples / iters),
        "backend": __import__("jax").default_backend(),
        "compile_s": round(compile_s, 2),
        "elapsed_s": round(best, 3),
    }
    result = {
        "metric": "train_agent_steps_per_sec",
        "value": round(sps),
        "unit": "agent-steps/s",
        # vs the reference PufferLib IPPO training SPS upper bound (300K)
        "vs_baseline": round(sps / 300_000, 4),
    }
    print(json.dumps(meta), file=sys.stderr)
    print(json.dumps(result))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--worlds", type=int, default=None)
    p.add_argument("--steps", type=int, default=91)
    p.add_argument("--scenes-dir", default="/root/reference/data/processed/examples")
    p.add_argument("--smoke", action="store_true", help="tiny CPU run")
    p.add_argument("--no-obs", action="store_true", help="dynamics only")
    p.add_argument("--exact", action="store_true",
                   help="exact all-pairs collision + exact top-k")
    p.add_argument("--platform", default=None, help="cpu to force local CPU")
    p.add_argument("--repeats", type=int, default=3,
                   help="timing repetitions; best is reported")
    p.add_argument("--grid", action="store_true",
                   help="use the spatial-hash collision path")
    p.add_argument("--train-approx-top-k", action="store_true",
                   help="train mode: approx_max_k road selection (recall "
                        "0.99; the obs is consumed as a set, exact kept "
                        "for parity tests)")
    p.add_argument("--road-gather", choices=["take", "dot"], default="take",
                   help="K-winner road-row fetch: flat row gather or "
                        "one-hot MXU matmul (exact either way)")
    p.add_argument("--road-obs", choices=["knn", "linear"], default="knn",
                   help="road-observation algorithm for the benched obs "
                        "path: KNN top-K (the headline config) or the "
                        "reference's default first-K-within-radius linear "
                        "scan (top_k index selection)")
    p.add_argument("--collision-top-k", type=int, default=None,
                   help="prune agent-road SAT to K distance-ranked candidates"
                        " (wins for large --max-roads buckets)")
    p.add_argument("--agent-bucket", default="auto",
                   help="'auto' (default) buckets the sim's agent axis to "
                        "the batch max instead of the fixed 128 rows — "
                        "~3.7x less agent-axis compute on typical WOMD "
                        "scenes, bitwise-identical results on real rows "
                        "(tests/test_agent_bucket.py); pass 128 for the "
                        "reference's fixed layout")
    p.add_argument("--max-roads", type=int, default=None,
                   help="force the road bucket (e.g. 10240 to stress the "
                        "full kMaxRoadEntityCount regime)")
    p.add_argument("--tiles", choices=["auto", "on", "off"], default="auto",
                   help="tile-skip Pallas agent-road narrow phase "
                        "(auto = on for large road buckets)")
    p.add_argument("--lidar", action="store_true",
                   help="also collect the 3-plane x 50-ray lidar each step "
                        "(reference: src/sim.cpp:394-460)")
    p.add_argument("--bev", action="store_true",
                   help="also rasterize the per-agent BEV type grid each "
                        "step (reference: src/rasterizer.hpp:27-78)")
    p.add_argument("--camera", action="store_true",
                   help="also render every agent's RGBD camera each step "
                        "(batch-renderer equivalent, core/render.py)")
    p.add_argument("--camera-size", type=int, default=64,
                   help="camera height=width in pixels (--camera)")
    p.add_argument("--train", action="store_true",
                   help="benchmark the full PPO train step (rollout + GAE + "
                        "minibatch epochs) instead of the raw simulator")
    p.add_argument("--rollout-len", type=int, default=32)
    p.add_argument("--train-iters", type=int, default=8,
                   help="train steps per timing repetition (--train)")
    p.add_argument("--epoch-preshuffle", action="store_true",
                   help="per-epoch time-axis shuffle + contiguous minibatch "
                        "slices (exact; kills the per-minibatch obs gather)")
    p.add_argument("--minibatch-rows", type=int, default=0,
                   help="flat mode: also slice minibatches to this many "
                        "rows of the flat agent axis (0 = time-only)")
    p.add_argument("--num-minibatches", type=int, default=16,
                   help="PPO minibatches per epoch (--train); 16 keeps the "
                        "obs-rematerialization slices small")
    p.add_argument("--update-epochs", type=int, default=4,
                   help="PPO epochs over the rollout (--train); 1 isolates "
                        "the rollout share of the iteration")
    p.add_argument("--compact", type=int, default=0,
                   help="restrict the learner's obs/policy path to the "
                        "first N controlled slots per world (0 = dense "
                        "over all 128 padded slots)")
    p.add_argument("--compact-mode", choices=["world", "flat"],
                   default="world",
                   help="'flat' uses ONE cross-world agent axis of "
                        "--compact rows holding exactly the batch's "
                        "controlled agents (the fast layout for imbalanced "
                        "worlds); 'world' pads every world to --compact")
    p.add_argument("--compact-blocks", type=int, default=0,
                   help="flat mode: block-local compaction over this "
                        "many contiguous world groups (multi-chip: "
                        "set to the mesh size; 0 = global)")
    p.add_argument("--obs-store",
                   choices=["remat", "f32", "bf16", "split-f32",
                            "split-bf16"],
                   default="remat",
                   help="rollout obs handling (--train): rematerialize from "
                        "SimStates in the update, or store f32/bf16 obs "
                        "(bf16 fits HBM at W=128 and skips the update's "
                        "obs recompute)")
    p.add_argument("--iters-per-dispatch", type=int, default=1,
                   help="fold K train iterations into one jitted program "
                        "(--train, scan/unroll modes): amortizes the remote "
                        "runtime's per-dispatch handle overhead (~227 "
                        "handles/iteration)")
    p.add_argument("--init-steps", type=int, default=0,
                   help="expert log-playback warmup at every (auto-)reset "
                        "(--train; pass 11 to measure/warm the campaign's "
                        "exact program)")
    p.add_argument("--ent-coef", type=float, default=1e-3,
                   help="entropy coefficient passed as a runtime scalar, "
                        "matching the train CLI's program identity")
    p.add_argument("--policy-dtype", choices=["f32", "bf16"], default="f32",
                   help="policy compute dtype (--train): bf16 runs the "
                        "embed/head GEMMs on the MXU at full rate; params "
                        "and logits stay f32")
    p.add_argument("--embed-remat", action="store_true",
                   help="recompute the partner/road embed+pool activations "
                        "in the update's backward pass (--train; bitwise-"
                        "identical gradients, less minibatch HBM traffic)")
    p.add_argument("--fused-embed", action="store_true",
                   help="Pallas fused embed+pool kernel for partner/road "
                        "(--train): the [B, E, 64] activations never touch "
                        "HBM in fwd or bwd")
    p.add_argument("--packed-io", action="store_true",
                   help="keep train state in per-dtype packed device "
                        "buffers: ~12 handles per dispatch instead of ~227 "
                        "(--train, scan/unroll modes)")
    p.add_argument("--rollout-mode",
                   choices=["scan", "unroll", "loop", "dispatch"],
                   default="unroll",
                   help="'unroll' jits the whole iteration as ONE "
                        "While-free straight-line program (fastest on the "
                        "axon tunnel); 'scan' uses lax.scan loops; "
                        "'dispatch' python-dispatches minibatch programs")
    args = p.parse_args()

    import jax

    if args.smoke and args.platform is None:
        args.platform = "cpu"
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import gpudrive_lab_tpu

    gpudrive_lab_tpu.enable_compile_cache()

    if args.train:
        bench_train(args)
        return

    import jax.numpy as jnp

    from gpudrive_lab_tpu import constants as C
    from gpudrive_lab_tpu.core import step as stepmod
    from gpudrive_lab_tpu.core.bev import bev_observation
    from gpudrive_lab_tpu.core.lidar import lidar_observation
    from gpudrive_lab_tpu.core.render import CameraConfig, batch_render
    from gpudrive_lab_tpu.env.config import EnvConfig
    from gpudrive_lab_tpu.env.env_jax import ObsSpec, flat_observation
    from gpudrive_lab_tpu.scene.compiler import build_scene

    worlds = args.worlds or (2 if args.smoke else 512)
    steps = 10 if args.smoke and args.steps == 91 else args.steps

    cfg = EnvConfig(
        num_worlds=worlds,
        dynamics_model="classic",
        collision_behavior="ignore",
        road_obs_algorithm="k_nearest_roadpoints"
        if args.road_obs == "knn" else "linear",
        road_gather=args.road_gather,
        collision_top_k=args.collision_top_k,
        approx_top_k=not args.exact,
        use_collision_grid=args.grid,
        use_tile_collision={"auto": None, "on": True, "off": False}[args.tiles],
    )
    params = cfg.sim_params()

    if not os.path.isdir(args.scenes_dir):
        # fall back to the bundled synthetic fixture when the WOMD examples
        # are not mounted
        args.scenes_dir = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "tests", "data"
        )
    base = sorted(
        os.path.join(args.scenes_dir, f)
        for f in os.listdir(args.scenes_dir)
        if f.endswith(".json")
    )
    if not base:
        print(json.dumps({"error": f"no scenes in {args.scenes_dir}"}))
        sys.exit(1)
    paths = [base[i % len(base)] for i in range(worlds)]

    t0 = time.time()
    ab = args.agent_bucket
    if ab and ab != "auto":
        ab = int(ab)
    scene = build_scene(paths, params, max_roads=args.max_roads,
                        max_agents=ab)
    compile_scene_s = time.time() - t0
    num_agents = int(np.asarray(scene.num_agents).sum())

    spec = ObsSpec()
    table_cfg = cfg.accel_actions, cfg.steer_actions, cfg.head_tilt_actions
    a, b, c = np.meshgrid(*table_cfg, indexing="ij")
    table = jnp.asarray(
        np.stack([a.ravel(), b.ravel(), c.ravel()], axis=-1), jnp.float32
    )
    n_actions = table.shape[0]
    weights = jnp.zeros(
        (worlds, scene.agents.valid.shape[1], 3), jnp.float32
    )

    # One fused XLA program per env step (random actions -> sim step -> obs
    # -> reset-as-select), dispatched from a Python loop.  NOTE: lax.scan is
    # avoided deliberately — on the axon TPU backend scanned programs compile
    # ~100x slower and execute ~200x slower than the identical body
    # dispatched per step (python dispatch is fully async; the device queue
    # stays saturated).
    # NB: scene/fresh/table are explicit arguments, not closure captures —
    # closure constants get embedded into the executable, which on the axon
    # backend costs ~30ms/dispatch.
    # The carried ``acc`` scalar consumes every step's program output so the
    # lazy axon runtime cannot elide any step's work.
    @functools.partial(jax.jit, static_argnames=())
    def bench_step(scene, fresh, table, weights, state, rng, acc):
        A_b = scene.agents.valid.shape[1]
        rng, k = jax.random.split(rng)
        idx = jax.random.randint(k, (worlds, A_b), 0, n_actions)
        act = jnp.zeros(
            (worlds, A_b, C.ACTION_DIM), jnp.float32
        ).at[..., :3].set(table[idx])
        state = stepmod.step(scene, state, act, params)
        if args.no_obs:
            acc = acc + state.reward[0, 0]
        else:
            obs, _, _ = flat_observation(scene, state, params, spec, weights)
            acc = acc + obs[0, 0, 0] + state.reward[0, 0]
        # Optional sensor modalities (VERDICT r4 item 4): each output is
        # consumed through a FULL reduction — a single-element read would
        # let XLA slice the program down to that element.
        if args.lidar:
            lid = lidar_observation(scene, state, params, act)
            acc = acc + lid[..., 0].sum()
        if args.bev:
            bev = bev_observation(scene, state, params)
            acc = acc + bev.sum()
        if args.camera:
            cam_cfg = CameraConfig(height=args.camera_size,
                                   width=args.camera_size)
            rgb, depth = batch_render(scene, state, cam_cfg)
            acc = acc + depth.sum() + rgb[..., 0].astype(jnp.float32).sum()
        world_done = jnp.all((state.done != 0) | ~scene.agents.valid, axis=1)
        blend = lambda f, s: jnp.where(
            world_done.reshape((-1,) + (1,) * (s.ndim - 1)), f, s
        )
        state = jax.tree.map(blend, fresh, state)
        return state, rng, acc

    reset_fn = jax.jit(stepmod.reset, static_argnames="params")
    fresh = reset_fn(scene, None, params)
    jax.block_until_ready(fresh.pos)

    def run(n_steps, rng):
        state = fresh
        acc = jnp.float32(0)
        for _ in range(n_steps):
            state, rng, acc = bench_step(
                scene, fresh, table, weights, state, rng, acc
            )
        jax.block_until_ready(acc)
        return state, acc

    # warmup / compile
    t0 = time.time()
    run(2, jax.random.PRNGKey(0))
    compile_s = time.time() - t0

    best = None
    for rep in range(args.repeats):
        t0 = time.time()
        run(steps, jax.random.PRNGKey(1 + rep))
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    elapsed = best

    world_steps_per_sec = steps * worlds / elapsed
    agent_steps_per_sec = steps * num_agents / elapsed

    result = {
        "metric": "agent_steps_per_sec",
        "value": round(agent_steps_per_sec),
        "unit": "agent-steps/s",
        "vs_baseline": round(agent_steps_per_sec / 1_000_000, 4),
    }
    meta = {
        "worlds": worlds,
        "steps": steps,
        "total_agents": num_agents,
        "world_steps_per_sec": round(world_steps_per_sec),
        "backend": jax.default_backend(),
        "max_roads_bucket": scene.max_roads,
        "scene_compile_s": round(compile_scene_s, 2),
        "xla_compile_s": round(compile_s, 2),
        "elapsed_s": round(elapsed, 3),
        "obs": not args.no_obs,
        "lidar": args.lidar,
        "bev": args.bev,
        "camera": (args.camera_size if args.camera else False),
    }
    print(json.dumps(meta), file=sys.stderr)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
