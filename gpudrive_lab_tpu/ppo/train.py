"""PPO training entry point.

TPU-native analogue of the reference's CLI trainer
(reference: baselines/ppo/ppo_pufferlib.py): wires the scene dataloader,
env configuration, policy, and the jit-compiled PPO train step; supports
periodic scene resampling (the analogue of resample_scenario_batch ->
Manager::setMaps) and simple checkpointing.

Run: python -m gpudrive_lab_tpu.ppo.train --data-dir <scenes> --num-worlds 4
"""

from __future__ import annotations

import argparse
import json
import pickle
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from gpudrive_lab_tpu.core import step as stepmod
from gpudrive_lab_tpu.env.config import EnvConfig
from gpudrive_lab_tpu.env.dataset import SceneDataLoader
from gpudrive_lab_tpu.env.env_jax import GPUDriveTPUEnv
from gpudrive_lab_tpu.networks.late_fusion import (
    LateFusionPolicy,
    PolicyConfig,
)
from gpudrive_lab_tpu.ppo.ppo import EnvCarry, PPOConfig, make_ppo_funcs


def make_fresh(env: GPUDriveTPUEnv):
    """The in-graph auto-reset's blend target: the t=0 reset state, advanced
    by ``init_steps`` of expert log playback when configured (reference:
    env_torch.py:403-451 applies the warmup on every reset;
    ppo_base_puffer.yaml trains with init_steps=11)."""
    fresh = jax.jit(stepmod.reset, static_argnames="params")(
        env.scene, None, env.params
    )
    k = env.config.init_steps
    if k:
        from gpudrive_lab_tpu.env.env_jax import expert_log_playback

        fresh, _ = expert_log_playback(
            env.scene, fresh, jnp.zeros(env.num_worlds, jnp.int32),
            env.params, env.config.dynamics_model, k,
        )
    return fresh


class PackedTrainer:
    """Train-step dispatcher that keeps ALL state as per-dtype packed device
    buffers, so one dispatch moves ~12 handles instead of ~227.

    On the axon remote runtime a jit call costs ~0.5-1 s per ~100 pytree
    argument/result handles regardless of compute (docs/PERFORMANCE.md);
    (variables, opt_state, carry) and (scene, fresh) are therefore packed
    into one flat buffer per dtype (utils/packing.py) that never leaves the
    device between iterations, and per-iteration metrics return as a single
    stacked float32 vector.  Metric values are exact in float32 here:
    "samples" tops out at W*compact*T*K << 2^24.

    Host round trips (unpack/repack) happen only on checkpoint, scene
    resample, and explicit rng reseeding.
    """

    def __init__(self, step_fn, ppo_config, scene, variables, opt_state,
                 carry, fresh, reward_weights):
        self._step_fn = step_fn
        self._config = ppo_config
        self._rw_example = reward_weights
        self._build_env_side(scene, fresh)
        self._build_state_side(variables, opt_state, carry)
        self._build_fn()  # cheap: eval_shape + lazy jit wrapper, no compile

    def _build_env_side(self, scene, fresh):
        """(Re)build the env packer for the current (scene, fresh) shapes.
        Called again by set_env when a scene swap changes leaf shapes (e.g.
        build_scene growing the road bucket) — the packer's static offsets
        must match the buffers it slices."""
        from gpudrive_lab_tpu.utils.packing import make_packer

        self._env_shapes = jax.tree.map(
            lambda l: (jnp.shape(l), jnp.asarray(l).dtype), (scene, fresh)
        )
        self._pack_env, self._unpack_env = make_packer((scene, fresh))
        self._pack_env_jit = jax.jit(self._pack_env)
        self._fn = None  # packed_step closes over _unpack_env; rebuild lazily
        self._env_p = self._pack_env_jit((scene, fresh))

    def _build_state_side(self, variables, opt_state, carry):
        from gpudrive_lab_tpu.utils.packing import make_packer

        self._pack_state, self._unpack_state = make_packer(
            (variables, opt_state, carry)
        )
        self._pack_state_jit = jax.jit(self._pack_state)
        self._unpack_state_jit = jax.jit(self._unpack_state)
        self._state_p = self._pack_state_jit((variables, opt_state, carry))

    def _build_fn(self):
        scene, fresh = jax.eval_shape(self._unpack_env, self._env_p)
        variables, opt_state, carry = jax.eval_shape(
            self._unpack_state, self._state_p
        )
        out = jax.eval_shape(
            self._step_fn, scene, variables, opt_state, carry, fresh,
            self._rw_example, jnp.float32(0),
        )
        self.metric_names = tuple(sorted(out[3]))

        unpack_env, unpack_state = self._unpack_env, self._unpack_state
        pack_state, names = self._pack_state, self.metric_names
        step_fn = self._step_fn

        def packed_step(env_p, state_p, reward_weights, ent_coef):
            scene, fresh = unpack_env(env_p)
            variables, opt_state, carry = unpack_state(state_p)
            variables, opt_state, carry, metrics = step_fn(
                scene, variables, opt_state, carry, fresh,
                reward_weights, ent_coef,
            )
            mvec = jnp.stack(
                [jnp.asarray(metrics[k], jnp.float32) for k in names]
            )
            return pack_state((variables, opt_state, carry)), mvec

        self._fn = jax.jit(packed_step, donate_argnums=(1,))

    def step_raw(self, reward_weights, ent_coef=None):
        """One train iteration; returns the stacked [M] (or [M, K]) metrics
        vector still on device, ordered by ``self.metric_names``."""
        if self._fn is None:
            self._build_fn()
        if ent_coef is None:
            ent_coef = self._config.ent_coef
        self._state_p, mvec = self._fn(
            self._env_p, self._state_p, reward_weights,
            jnp.float32(ent_coef),
        )
        return mvec

    def step(self, reward_weights, ent_coef=None):
        """One train iteration; returns {metric: numpy value} (one host
        fetch for the whole vector)."""
        mvec = np.asarray(self.step_raw(reward_weights, ent_coef))
        return dict(zip(self.metric_names, mvec))

    def unpack_state(self):
        """-> (variables, opt_state, carry) as ordinary pytrees."""
        return self._unpack_state_jit(self._state_p)

    def set_state(self, variables, opt_state, carry):
        self._state_p = self._pack_state_jit((variables, opt_state, carry))

    def set_env(self, scene, fresh, carry=None):
        """Swap the scene batch (and optionally reset the env carry).
        Rebuilds the env packer (and the jitted step) if the swap changed
        any leaf shape — stale static offsets would silently misalign every
        leaf after the resized one."""
        new_shapes = jax.tree.map(
            lambda l: (jnp.shape(l), jnp.asarray(l).dtype), (scene, fresh)
        )
        if new_shapes != self._env_shapes:
            self._build_env_side(scene, fresh)
        else:
            self._env_p = self._pack_env_jit((scene, fresh))
        if carry is not None:
            variables, opt_state, _ = self.unpack_state()
            self.set_state(variables, opt_state, carry)

    @property
    def current_rng(self):
        """The live on-device PRNG key (one small fetch; avoids trusting a
        stale host-side carry after many packed iterations)."""
        _, _, carry = self.unpack_state()
        return carry.rng

    def replace_carry(self, **kw):
        variables, opt_state, carry = self.unpack_state()
        self.set_state(variables, opt_state, carry._replace(**kw))


def check_compact_capacity(
    env: GPUDriveTPUEnv, compact: int | None, compact_mode: str = "world",
    compact_blocks: int = 0,
):
    """Every world's controlled-agent count must fit in the compact slots:
    overflow agents would silently drive with action_table[0] every step
    (ctrl_slots keeps only the first `compact` controlled slots, and the
    rollout's action scatter leaves the rest at index 0) while never
    entering the loss mask.  Checked at build time AND after every
    swap_data_batch — a resampled batch can be more crowded than the one
    the trainer was built against."""
    if not compact:
        return
    if compact_mode == "flat":
        ctrl = np.asarray(env.scene.agents.controlled)
        if compact_blocks and compact_blocks > 1:
            # block-local selection: every world block must fit its share
            per_block = ctrl.reshape(compact_blocks, -1).sum(axis=1)
            cap = compact // compact_blocks
            if int(per_block.max()) > cap:
                raise ValueError(
                    f"compact={compact} over {compact_blocks} blocks "
                    f"(cap {cap}/block) would drop controlled agents "
                    f"(block totals {per_block.tolist()})"
                )
            return
        total_ctrl = int(ctrl.sum())
        if compact < total_ctrl:
            raise ValueError(
                f"compact={compact} (flat) would drop controlled agents "
                f"(scene batch total {total_ctrl})"
            )
        return
    max_ctrl = int(np.asarray(env.scene.agents.controlled).sum(axis=1).max())
    if compact < max_ctrl:
        raise ValueError(
            f"compact={compact} would drop controlled agents "
            f"(scene batch max {max_ctrl} per world)"
        )


def build_trainer(env: GPUDriveTPUEnv, ppo_config: PPOConfig,
                  policy_config: PolicyConfig | None = None, seed: int = 42,
                  rollout_mode: str = "scan", iters_per_dispatch: int = 1,
                  packed_io: bool = False):
    """Returns (policy, variables, opt_state, carry, fresh, train_fn).

    rollout_mode 'scan' jits the whole iteration; 'unroll' also jits the
    whole iteration but traces every loop as straight-line code (ONE
    While-free dispatch per iteration — the fast path on the axon remote
    runtime, where While-loop programs execute ~200x slower than their
    unrolled bodies); 'loop' python-dispatches the rollout step but keeps
    the scanned update; 'dispatch' python-dispatches the minibatch loop too.

    iters_per_dispatch > 1 (scan/unroll modes only) folds K train
    iterations into ONE jitted program whose metrics carry a leading [K]
    axis.  On the axon remote runtime a dispatch costs ~0.5-1 s per ~100
    pytree handles regardless of compute (CLAUDE.md); one train iteration
    moves ~227 handles, so folding K iterations amortizes that fixed cost
    K-fold at the price of a K-fold longer (one-time, cached) compile."""
    import dataclasses as _dc

    assert not (packed_io and rollout_mode in ("dispatch", "loop")), (
        "--packed-io requires a single-program rollout mode (scan/unroll)"
    )
    assert not (
        iters_per_dispatch > 1 and rollout_mode in ("dispatch", "loop")
    ), (
        "--iters-per-dispatch requires a single-program rollout mode "
        "(scan/unroll); in dispatch/loop modes it would be silently "
        "ignored while the caller's iteration/SPS accounting scales by K"
    )
    if rollout_mode == "unroll":
        ppo_config = _dc.replace(ppo_config, unroll=True)
    if env.config.init_steps:
        ppo_config = _dc.replace(
            ppo_config, reset_time_step=env.config.init_steps
        )
    check_compact_capacity(env, ppo_config.compact, ppo_config.compact_mode,
                           ppo_config.compact_blocks)
    policy_config = policy_config or PolicyConfig(
        action_dim=env.action_space_n,
        dtype=jnp.bfloat16
        if ppo_config.policy_dtype == "bfloat16" else jnp.float32,
        embed_remat=ppo_config.embed_remat,
        fused_embed=ppo_config.fused_embed,
    )
    policy = LateFusionPolicy(policy_config)
    init_fn, train_step, train_step_loop, train_step_dispatch = make_ppo_funcs(
        policy,
        env.params,
        env.spec,
        env.action_keys,
        env.config.reward_type,
        ppo_config,
    )
    rng = jax.random.PRNGKey(seed)
    example_obs = jnp.zeros((1, policy_config.obs_dim), jnp.float32)
    variables, opt_state = init_fn(rng, env.scene, example_obs)
    fresh = make_fresh(env)
    carry = EnvCarry(
        state=jax.tree.map(jnp.copy, fresh),
        world_time_steps=jnp.full(
            env.num_worlds, env.config.init_steps, jnp.int32
        ),
        rng=rng,
    )
    if rollout_mode == "dispatch":
        train_fn = train_step_dispatch
    elif rollout_mode == "loop":
        train_fn = train_step_loop
    else:
        step_fn = train_step
        if iters_per_dispatch > 1:
            def step_fn(scene, variables, opt_state, carry, fresh,
                        reward_weights, ent_coef=None):
                stacked = []
                for _ in range(iters_per_dispatch):
                    variables, opt_state, carry, m = train_step(
                        scene, variables, opt_state, carry, fresh,
                        reward_weights, ent_coef,
                    )
                    stacked.append(m)
                metrics = jax.tree.map(lambda *xs: jnp.stack(xs), *stacked)
                return variables, opt_state, carry, metrics
        if packed_io:
            train_fn = PackedTrainer(
                step_fn, ppo_config, env.scene, variables, opt_state,
                carry, fresh, env.reward_weights,
            )
            return policy, variables, opt_state, carry, fresh, train_fn
        # Donate params/opt/carry buffers (carry holds a copy of `fresh`,
        # which is passed separately and must stay alive across iterations).
        train_fn = jax.jit(step_fn, donate_argnums=(1, 2, 3))
    return policy, variables, opt_state, carry, fresh, train_fn


def save_checkpoint(ckpt_dir, variables, opt_state, iteration, global_step):
    """Atomic-ish checkpoint write (tmp + rename) of policy + Adam state
    (reference: integrations/puffer/ppo.py:695-737 save_checkpoint)."""
    tmp = ckpt_dir / "policy.pkl.tmp"
    with open(tmp, "wb") as f:
        pickle.dump(
            {
                "variables": jax.tree.map(np.asarray, variables),
                "opt_state": jax.tree.map(np.asarray, opt_state),
                "iteration": iteration,
                "global_step": global_step,
            },
            f,
        )
    tmp.replace(ckpt_dir / "policy.pkl")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-dir", default="/root/reference/data/processed/examples")
    p.add_argument("--num-worlds", type=int, default=4)
    p.add_argument("--dataset-size", type=int, default=1000)
    p.add_argument("--total-timesteps", type=int, default=2_000_000)
    p.add_argument("--rollout-len", type=int, default=32)
    p.add_argument("--resample-interval", type=int, default=0,
                   help="agent-steps between scene-batch swaps (0=never)")
    p.add_argument("--checkpoint-path", default="runs")
    p.add_argument("--checkpoint-interval", type=int, default=200)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--continue-training", action="store_true",
                   help="resume from <checkpoint-path>/policy.pkl "
                        "(reference: ppo_pufferlib.py:52-70)")
    p.add_argument("--rollout-mode",
                   choices=["scan", "unroll", "loop", "dispatch"],
                   default="scan")
    p.add_argument("--iters-per-dispatch", type=int, default=1,
                   help="fold K train iterations into one jitted dispatch "
                        "(scan/unroll only): amortizes the remote runtime's "
                        "per-dispatch handle overhead; metrics/entropy "
                        "control then act per dispatch")
    p.add_argument("--packed-io", action="store_true",
                   help="keep train state as per-dtype packed device "
                        "buffers so each dispatch moves ~12 handles instead "
                        "of ~227 (scan/unroll only; targets the remote "
                        "runtime's per-handle dispatch overhead)")
    p.add_argument("--platform", default=None,
                   help="force a jax platform (e.g. 'cpu' for local smoke "
                        "runs — JAX_PLATFORMS alone is overridden by the "
                        "axon plugin's sitecustomize)")
    p.add_argument("--agent-bucket", default=None,
                   help="'auto' (or an int) buckets the sim's agent axis "
                        "to the scene batch max instead of 128 rows")
    p.add_argument("--road-gather", choices=["take", "dot"], default="take",
                   help="K-winner road-row fetch: flat row gather or "
                        "one-hot MXU matmul (exact either way)")
    p.add_argument("--max-roads", type=int, default=None,
                   help="pin the road-axis bucket (rounded up to 256) so "
                        "mixed-size scene batches stay shape-stable across "
                        "--resample-interval swaps — no mid-campaign "
                        "recompiles")
    p.add_argument("--init-steps", type=int, default=0,
                   help="expert log-playback warmup steps applied at every "
                        "(auto-)reset; the reference trains with 11 "
                        "(ppo_base_puffer.yaml init_steps)")
    p.add_argument("--ent-coef", type=float, default=1e-4)
    p.add_argument("--entropy-floor", type=float, default=0.0,
                   help="adaptive entropy control: when measured policy "
                        "entropy falls below this floor the entropy "
                        "coefficient is raised (x1.5), and relaxed back "
                        "toward --ent-coef above 2x the floor; 0 disables "
                        "(fixes the collapse seen in short runs)")
    p.add_argument("--num-minibatches", type=int, default=4)
    p.add_argument("--epoch-preshuffle", action="store_true",
                   help="shuffle the batch time axis once per epoch (exact "
                        "one-hot matmul) and cut contiguous minibatch "
                        "slices — removes the per-minibatch obs-store "
                        "gather that dominates the update phase on TPU")
    p.add_argument("--minibatch-rows", type=int, default=0,
                   help="flat mode: also slice minibatches to this many "
                        "rows of the flat agent axis (0 = time-only); "
                        "num-minibatches stays the TOTAL per epoch")
    p.add_argument("--update-epochs", type=int, default=4)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--compact", type=int, default=0,
                   help="learner compaction: obs/policy/GAE restricted to "
                        "the first N controlled slots per world (0=dense; "
                        "must cover the scene batch's max controlled count)")
    p.add_argument("--compact-mode", choices=["world", "flat"],
                   default="world",
                   help="'flat' = one cross-world agent axis of --compact "
                        "rows (capacity: the batch's TOTAL controlled "
                        "count); the fast layout for imbalanced worlds")
    p.add_argument("--keep-non-vehicles", action="store_true",
                   help="create pedestrian/cyclist agents (EnvConfig.remove_non_vehicles=False) — needed for scene pools with crossing pedestrians")
    p.add_argument("--compact-blocks", type=int, default=0,
                   help="flat mode: block-local compaction over this "
                        "many contiguous world groups (multi-chip: "
                        "set to the mesh size; 0 = global)")
    p.add_argument("--obs-store",
                   choices=["remat", "f32", "bf16", "split-f32",
                            "split-bf16"],
                   default="remat",
                   help="rollout obs handling: rematerialize from stored "
                        "SimStates (min HBM), store f32/bf16 obs, or store "
                        "split per-modality buffers (split-*) feeding the "
                        "policy's pre-split apply path")
    p.add_argument("--policy-dtype", choices=["f32", "bf16"], default="f32",
                   help="policy compute dtype: bf16 uses the MXU at full "
                        "rate (params/logits stay f32)")
    p.add_argument("--embed-remat", action="store_true",
                   help="recompute the partner/road embed+pool activations "
                        "in the update's backward pass instead of storing "
                        "them (bitwise-identical gradients, less HBM "
                        "traffic per minibatch)")
    p.add_argument("--fused-embed", action="store_true",
                   help="Pallas fused embed+pool kernel for partner/road: "
                        "the [B, E, 64] activations never touch HBM in "
                        "fwd or bwd")
    p.add_argument("--video-interval", type=int, default=0,
                   help="iterations between rollout videos rendered with "
                        "the current policy into <checkpoint-path>/videos/ "
                        "(0=off; reference: env_puffer.py:405-483 wandb "
                        "video pipeline)")
    p.add_argument("--video-worlds", type=int, default=1,
                   help="how many worlds to render per video interval")
    p.add_argument("--dashboard", action="store_true",
                   help="live rich-console dashboard (reference: "
                        "integrations/puffer/logging.py); JSONL echo is "
                        "silenced while it is active")
    args = p.parse_args()

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    # Persist the (large) train-iteration executable across process
    # restarts — the campaign driver resumes in chunks, and without this
    # every chunk would pay the full XLA compile again.
    import gpudrive_lab_tpu

    gpudrive_lab_tpu.enable_compile_cache()

    loader = SceneDataLoader(
        root=args.data_dir,
        batch_size=args.num_worlds,
        dataset_size=args.dataset_size,
        sample_with_replacement=True,
        seed=args.seed,
    )
    cfg = EnvConfig(
        num_worlds=args.num_worlds,
        reward_type="weighted_combination",
        collision_weight=-0.75,
        off_road_weight=-0.75,
        goal_achieved_weight=1.0,
        dynamics_model="classic",
        collision_behavior="ignore",
        init_steps=args.init_steps,
        remove_non_vehicles=not args.keep_non_vehicles,
        road_gather=args.road_gather,
        agent_bucket=(
            int(args.agent_bucket)
            if args.agent_bucket and args.agent_bucket != "auto"
            else args.agent_bucket
        ),
    )
    env = GPUDriveTPUEnv(cfg, data_loader=loader, max_roads=args.max_roads)
    ppo_cfg = PPOConfig(rollout_len=args.rollout_len,
                        num_minibatches=args.num_minibatches,
                        ent_coef=args.ent_coef,
                        update_epochs=args.update_epochs,
                        learning_rate=args.lr,
                        compact=args.compact,
                        compact_mode=args.compact_mode,
                        compact_blocks=args.compact_blocks,
                        remat_obs=args.obs_store == "remat",
                        obs_store_dtype="bfloat16"
                        if args.obs_store.endswith("bf16") else "float32",
                        obs_store="split"
                        if args.obs_store.startswith("split") else "flat",
                        policy_dtype="bfloat16"
                        if args.policy_dtype == "bf16" else "float32",
                        minibatch_rows=args.minibatch_rows,
                        epoch_preshuffle=args.epoch_preshuffle,
                        embed_remat=args.embed_remat,
                        fused_embed=args.fused_embed)
    policy, variables, opt_state, carry, fresh, train_fn = build_trainer(
        env, ppo_cfg, seed=args.seed, rollout_mode=args.rollout_mode,
        iters_per_dispatch=args.iters_per_dispatch,
        packed_io=args.packed_io,
    )

    ckpt_dir = Path(args.checkpoint_path)
    ckpt_dir.mkdir(parents=True, exist_ok=True)

    start_step = 0
    if args.continue_training and (ckpt_dir / "policy.pkl").exists():
        with open(ckpt_dir / "policy.pkl", "rb") as f:
            ckpt = pickle.load(f)
        variables = jax.tree.map(jnp.asarray, ckpt["variables"])
        if "opt_state" in ckpt:  # restore Adam moments too
            opt_state = jax.tree.map(jnp.asarray, ckpt["opt_state"])
        start_step = int(ckpt.get("global_step", 0))
        if args.packed_io:
            train_fn.set_state(variables, opt_state, carry)
        print(json.dumps({"resumed_from": start_step}), flush=True)

    from gpudrive_lab_tpu.utils.logging import MetricsLogger
    from gpudrive_lab_tpu.utils.profiling import Profile, Utilization

    logger = MetricsLogger(
        args.checkpoint_path, exp_id="ppo", echo=not args.dashboard
    )
    profile = Profile()
    util = Utilization()
    util.start()
    from gpudrive_lab_tpu.utils.dashboard import Dashboard

    dash = Dashboard(args.total_timesteps) if args.dashboard else None

    global_step = start_step
    iteration = 0
    resampled_at = start_step
    resample_count = 0
    resample_time_s = 0.0
    ent_coef = args.ent_coef
    ep_win_keys = ("perc_goal_achieved", "perc_collisions", "perc_off_road")
    ep_win = dict.fromkeys(("episodes",) + ep_win_keys, 0.0)
    if dash is not None:
        dash.__enter__()
    try:
        while global_step < args.total_timesteps:
            if (
                args.resample_interval
                and global_step - resampled_at >= args.resample_interval
            ):
                env_elapsed_before = profile.elapsed["env"]
                with profile.phase("env"):
                    env.swap_data_batch()
                    check_compact_capacity(env, ppo_cfg.compact,
                                           ppo_cfg.compact_mode,
                                           ppo_cfg.compact_blocks)
                    fresh = make_fresh(env)
                    carry = EnvCarry(
                        state=jax.tree.map(jnp.copy, fresh),
                        world_time_steps=jnp.full(
                            env.num_worlds, env.config.init_steps, jnp.int32
                        ),
                        # packed mode: the host-side `carry` is stale (it
                        # was last unpacked at build/checkpoint time) —
                        # continue the LIVE on-device rng chain, not an old
                        # key that would replay consumed exploration noise.
                        rng=train_fn.current_rng if args.packed_io
                        else carry.rng,
                    )
                    if args.packed_io:
                        train_fn.set_env(env.scene, fresh, carry)
                resampled_at = global_step
                resample_count += 1
                # Duration of THIS swap (profile.elapsed is cumulative).
                resample_time_s = profile.elapsed["env"] - env_elapsed_before
            with profile.phase("learn"):
                # ONE batched device->host fetch (per-key np.asarray would
                # be |metrics| blocking round trips on remote runtimes).
                # With iters_per_dispatch>1 each value is [K]; samples sum
                # over the fold, everything else is reported as its mean.
                if args.packed_io:
                    fetched = train_fn.step(env.reward_weights, ent_coef)
                else:
                    variables, opt_state, carry, metrics = train_fn(
                        env.scene, variables, opt_state, carry, fresh,
                        env.reward_weights, jnp.float32(ent_coef),
                    )
                    fetched = jax.device_get(metrics)
                samples = int(np.sum(fetched.pop("samples")))
                m = {k: float(np.mean(v)) for k, v in fetched.items()}
                # Episode stats only exist on iterations whose rollout
                # window contains an episode boundary (91-step episodes vs
                # 32-step rollouts -> ~1/3 of iterations).  Accumulate
                # episode-weighted sums across the whole logging window so
                # the logged goal/collision rates cover every completed
                # episode instead of aliasing to whichever iteration gets
                # sampled.  perc_* = sum(world fractions)/max(n_ep,1) in
                # ppo.py, so perc*episodes recovers the sum exactly.
                ep_arr = np.asarray(fetched["episodes"], np.float64)
                ep_win["episodes"] += float(ep_arr.sum())
                for key in ep_win_keys:
                    ep_win[key] += float(
                        (np.asarray(fetched[key], np.float64) * ep_arr).sum()
                    )
            if args.entropy_floor > 0.0:
                # entropy-floor controller: multiplicative push-back when
                # the policy collapses, slow relaxation when healthy
                if m["entropy"] < args.entropy_floor:
                    ent_coef = min(ent_coef * 1.5, 0.1)
                elif m["entropy"] > 2.0 * args.entropy_floor:
                    ent_coef = max(ent_coef / 1.2, args.ent_coef)
                m["ent_coef"] = ent_coef
            global_step += samples
            profile.account(
                samples,
                env.num_worlds * 128 * args.rollout_len
                * args.iters_per_dispatch,
            )
            prev_iteration = iteration
            iteration += args.iters_per_dispatch
            # boundary-crossing cadence (iteration can advance by K)
            if iteration // 10 != prev_iteration // 10:
                n_ep = max(ep_win["episodes"], 1.0)
                m["episodes"] = ep_win["episodes"]
                for key in ep_win_keys:
                    m[key] = ep_win[key] / n_ep
                ep_win = dict.fromkeys(ep_win, 0.0)
                rec = dict(
                    iteration=iteration,
                    global_step=global_step,
                    resamples=resample_count,
                    resample_time_s=round(resample_time_s, 2),
                    **{k: round(v, 5) for k, v in m.items()},
                    **profile.summary(),
                    **util.summary(),
                )
                logger.log(rec, step=global_step)
                if dash is not None:
                    dash.update(global_step, rec)
            if args.video_interval and (
                iteration // args.video_interval
                != prev_iteration // args.video_interval
            ):
                from gpudrive_lab_tpu.visualize.video import (
                    render_training_videos,
                )

                if args.packed_io:
                    variables, opt_state, carry = train_fn.unpack_state()
                with profile.phase("env"):
                    paths = render_training_videos(
                        env, policy, variables, ckpt_dir / "videos",
                        global_step, num_worlds=args.video_worlds,
                    )
                logger.log(
                    {"videos": paths, "global_step": global_step},
                    step=global_step,
                )
            if (iteration // args.checkpoint_interval
                    != prev_iteration // args.checkpoint_interval):
                if args.packed_io:
                    variables, opt_state, carry = train_fn.unpack_state()
                save_checkpoint(
                    ckpt_dir, variables, opt_state, iteration, global_step
                )
        # Final checkpoint at target: without this, a last partial
        # checkpoint-interval's steps would be silently lost on resume
        # (bit the 50M campaign: its terminal chunk ran 14 iterations,
        # below the 25-iteration interval).
        if args.packed_io:
            variables, opt_state, carry = train_fn.unpack_state()
        save_checkpoint(
            ckpt_dir, variables, opt_state, iteration, global_step
        )
    finally:
        if dash is not None:
            dash.__exit__(None, None, None)
        util.stop()
        logger.close()
    print(json.dumps({"final_global_step": global_step}))


if __name__ == "__main__":
    main()
