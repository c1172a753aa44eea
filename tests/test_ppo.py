"""PPO learner tests: jit train step runs, losses finite, params update,
GAE matches a reference numpy implementation."""

import jax
import jax.numpy as jnp
import os

import numpy as np
import pytest

from gpudrive_lab_tpu.env.config import EnvConfig
from gpudrive_lab_tpu.env.dataset import SceneDataLoader
from gpudrive_lab_tpu.env.env_jax import GPUDriveTPUEnv
from gpudrive_lab_tpu.ppo.ppo import PPOConfig
from gpudrive_lab_tpu.ppo.train import build_trainer


@pytest.fixture(scope="module")
def trainer(example_scene_paths):
    cfg = EnvConfig(
        num_worlds=2,
        reward_type="weighted_combination",
        collision_weight=-0.75,
        off_road_weight=-0.75,
        dynamics_model="classic",
        collision_behavior="ignore",
    )
    loader = SceneDataLoader(
        root=os.path.dirname(example_scene_paths[0]),
        batch_size=2, dataset_size=4,
    )
    env = GPUDriveTPUEnv(cfg, data_loader=loader)
    return env, build_trainer(env, PPOConfig(rollout_len=8, num_minibatches=2))


def test_train_step_runs_and_updates(trainer):
    env, (policy, variables, opt_state, carry, fresh, train_fn) = trainer
    before = np.asarray(
        jax.tree.leaves(variables)[0]
    ).copy()
    for _ in range(2):
        variables, opt_state, carry, metrics = train_fn(
            env.scene, variables, opt_state, carry, fresh, env.reward_weights
        )
    m = {k: float(np.asarray(v)) for k, v in metrics.items()}
    assert np.isfinite(list(m.values())).all()
    assert m["samples"] > 0
    after = np.asarray(jax.tree.leaves(variables)[0])
    assert not np.allclose(before, after), "params did not update"


def test_remat_obs_matches_stored_obs(trainer):
    """Rematerializing flat observations from stored SimStates inside the
    update must be numerically identical to storing the obs tensor in the
    rollout (same rng chain, same scene)."""
    env, _ = trainer
    results = []
    for remat in (True, False):
        _, variables, opt_state, carry, fresh, train_fn = build_trainer(
            env, PPOConfig(rollout_len=8, num_minibatches=2, remat_obs=remat),
            seed=7,
        )
        variables, opt_state, carry, metrics = train_fn(
            env.scene, variables, opt_state, carry, fresh, env.reward_weights
        )
        results.append((jax.tree.leaves(variables), metrics))
    (va, ma), (vb, mb) = results
    for a, b in zip(va, vb):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5
        )
    np.testing.assert_allclose(
        float(ma["pg_loss"]), float(mb["pg_loss"]), atol=1e-5, rtol=1e-4
    )


def test_compact_learner_same_sample_count(trainer):
    """compact=C >= max controlled per world consumes exactly the same
    training samples as the dense path and learns (finite, params move)."""
    env, _ = trainer
    max_ctrl = int(np.asarray(env.scene.agents.controlled).sum(axis=1).max())

    samples = {}
    for compact in (0, max(max_ctrl, 8)):
        _, variables, opt_state, carry, fresh, train_fn = build_trainer(
            env, PPOConfig(rollout_len=8, num_minibatches=2, compact=compact),
            seed=3,
        )
        before = np.asarray(jax.tree.leaves(variables)[0]).copy()
        variables, opt_state, carry, metrics = train_fn(
            env.scene, variables, opt_state, carry, fresh, env.reward_weights
        )
        m = {k: float(np.asarray(v)) for k, v in metrics.items()}
        assert np.isfinite(list(m.values())).all(), (compact, m)
        assert not np.allclose(
            before, np.asarray(jax.tree.leaves(variables)[0])
        )
        samples[compact] = m["samples"]
    assert samples[0] == samples[max(max_ctrl, 8)], samples


def test_bf16_stored_obs_close_to_f32(trainer):
    """obs_store_dtype=bfloat16 (no remat) stays numerically close to the
    f32 stored-obs path after one iteration."""
    env, _ = trainer
    results = []
    for dtype in ("float32", "bfloat16"):
        _, variables, opt_state, carry, fresh, train_fn = build_trainer(
            env,
            PPOConfig(rollout_len=8, num_minibatches=2, remat_obs=False,
                      obs_store_dtype=dtype),
            seed=5,
        )
        variables, opt_state, carry, metrics = train_fn(
            env.scene, variables, opt_state, carry, fresh, env.reward_weights
        )
        results.append((jax.tree.leaves(variables), metrics))
    (va, ma), (vb, mb) = results
    for a, b in zip(va, vb):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-3, rtol=5e-2
        )
    assert np.isfinite(float(np.asarray(mb["pg_loss"])))


def test_dispatch_mode_matches_loop_mode(trainer):
    """The fully python-dispatched update (one re-dispatched minibatch
    program) must produce the same params as the scanned update: identical
    permutations derive from the same rng split, and the per-minibatch rng
    is unused when actions are given."""
    env, _ = trainer
    results = []
    for mode in ("loop", "dispatch"):
        _, variables, opt_state, carry, fresh, train_fn = build_trainer(
            env, PPOConfig(rollout_len=8, num_minibatches=2), seed=11,
            rollout_mode=mode,
        )
        variables, opt_state, carry, metrics = train_fn(
            env.scene, variables, opt_state, carry, fresh, env.reward_weights
        )
        results.append(jax.tree.leaves(variables))
    for a, b in zip(*results):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-5
        )


def test_unroll_mode_matches_scan_mode(trainer):
    """The While-free straight-line trace (PPOConfig.unroll, the fast path
    on remote TPU runtimes) must be numerically equivalent to the lax.scan
    trace: same ops in the same order, only the loop representation
    differs."""
    env, _ = trainer
    results = []
    for mode in ("scan", "unroll"):
        _, variables, opt_state, carry, fresh, train_fn = build_trainer(
            env, PPOConfig(rollout_len=8, num_minibatches=2), seed=13,
            rollout_mode=mode,
        )
        variables, opt_state, carry, metrics = train_fn(
            env.scene, variables, opt_state, carry, fresh, env.reward_weights
        )
        results.append((jax.tree.leaves(variables), metrics))
    (va, ma), (vb, mb) = results
    for a, b in zip(va, vb):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-5
        )
    np.testing.assert_allclose(
        float(np.asarray(ma["entropy"])), float(np.asarray(mb["entropy"])),
        rtol=1e-5,
    )


def test_gae_matches_numpy():
    from gpudrive_lab_tpu.networks.late_fusion import LateFusionPolicy, PolicyConfig
    from gpudrive_lab_tpu.ppo import ppo as ppomod

    T, W, A = 5, 2, 3
    rng = np.random.default_rng(0)
    rewards = rng.normal(size=(T, W, A)).astype(np.float32)
    values = rng.normal(size=(T, W, A)).astype(np.float32)
    dones = (rng.random((T, W, A)) < 0.2).astype(np.float32)
    last_value = rng.normal(size=(W, A)).astype(np.float32)
    gamma, lam = 0.99, 0.95

    adv_ref = np.zeros_like(rewards)
    next_vals = np.concatenate([values[1:], last_value[None]], axis=0)
    acc = np.zeros((W, A), np.float32)
    for t in reversed(range(T)):
        delta = rewards[t] + gamma * next_vals[t] * (1 - dones[t]) - values[t]
        acc = delta + gamma * lam * (1 - dones[t]) * acc
        adv_ref[t] = acc

    def scan_body(adv, xs):
        reward, value, next_value, done = xs
        delta = reward + gamma * next_value * (1.0 - done) - value
        adv = delta + gamma * lam * (1.0 - done) * adv
        return adv, adv

    _, advs = jax.lax.scan(
        scan_body,
        jnp.zeros((W, A)),
        (jnp.asarray(rewards), jnp.asarray(values), jnp.asarray(next_vals),
         jnp.asarray(dones)),
        reverse=True,
    )
    np.testing.assert_allclose(np.asarray(advs), adv_ref, rtol=1e-5)


def test_policy_forward_shapes():
    from gpudrive_lab_tpu.networks.late_fusion import (
        LateFusionPolicy,
        PolicyConfig,
        sample_logits,
    )

    cfg = PolicyConfig(action_dim=91)
    policy = LateFusionPolicy(cfg)
    rng = jax.random.PRNGKey(0)
    obs = jnp.zeros((4, cfg.obs_dim))
    variables = policy.init(rng, obs)
    logits, value = jax.jit(policy.apply)(variables, obs)
    assert logits.shape == (4, 91) and value.shape == (4,)
    a, logp, ent = sample_logits(rng, logits)
    assert a.shape == (4,) and np.asarray(ent).min() > 0
    n_params = sum(x.size for x in jax.tree.leaves(variables))
    assert 50_000 < n_params < 2_000_000


def test_iters_per_dispatch_matches_sequential(trainer):
    """K=2 iterations folded into one dispatched program must equal two
    sequential K=1 dispatches exactly (same rng chain threaded through the
    carry), with metrics stacked on a leading [K] axis."""
    env, _ = trainer

    _, variables, opt_state, carry, fresh, train_fn = build_trainer(
        env, PPOConfig(rollout_len=8, num_minibatches=2), seed=19,
        iters_per_dispatch=1,
    )
    seq_metrics = []
    for _ in range(2):
        variables, opt_state, carry, m = train_fn(
            env.scene, variables, opt_state, carry, fresh, env.reward_weights
        )
        seq_metrics.append(m)
    seq_vars = jax.tree.leaves(variables)

    _, variables, opt_state, carry, fresh, train_fn = build_trainer(
        env, PPOConfig(rollout_len=8, num_minibatches=2), seed=19,
        iters_per_dispatch=2,
    )
    variables, opt_state, carry, mk = train_fn(
        env.scene, variables, opt_state, carry, fresh, env.reward_weights
    )
    for k, v in mk.items():
        assert v.shape[0] == 2, (k, v.shape)
        np.testing.assert_allclose(
            np.asarray(v),
            np.asarray([seq_metrics[0][k], seq_metrics[1][k]]),
            atol=1e-5, rtol=1e-4,
        )
    for a, b in zip(seq_vars, jax.tree.leaves(variables)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-5
        )


def test_init_steps_warmed_reset(trainer):
    """With init_steps configured, the auto-reset blend target must be the
    t=init_steps expert-playback state, not the t=0 reset (reference:
    env_torch.py:403-451, ppo_base_puffer.yaml init_steps=11)."""
    import dataclasses

    from gpudrive_lab_tpu.ppo.train import make_fresh

    env, _ = trainer
    cold = make_fresh(env)
    env.config = dataclasses.replace(env.config, init_steps=11)
    try:
        warm = make_fresh(env)
        _, variables, opt_state, carry, fresh, train_fn = build_trainer(
            env, PPOConfig(rollout_len=8, num_minibatches=2), seed=5,
        )
    finally:
        env.config = dataclasses.replace(env.config, init_steps=0)

    valid = np.asarray(env.scene.agents.valid)
    moved = np.abs(
        np.asarray(warm.pos) - np.asarray(cold.pos)
    ).max(axis=-1)[valid]
    assert (moved > 1e-3).any(), "warmup did not advance any agent"
    # carry starts from the warmed state with the clock at init_steps
    np.testing.assert_array_equal(np.asarray(carry.world_time_steps), 11)
    np.testing.assert_allclose(
        np.asarray(fresh.pos), np.asarray(warm.pos), atol=0, rtol=0
    )
    variables, opt_state, carry, metrics = train_fn(
        env.scene, variables, opt_state, carry, fresh, env.reward_weights
    )
    vals = [float(np.asarray(v)) for v in metrics.values()]
    assert np.isfinite(vals).all()


def test_bf16_policy_dtype_trains_close_to_f32(trainer):
    """policy_dtype=bfloat16 (MXU compute dtype) keeps one iteration's
    update numerically close to f32 — logits/values cast back to f32 at
    the module boundary, params stay f32."""
    env, _ = trainer
    results = []
    for dtype in ("float32", "bfloat16"):
        _, variables, opt_state, carry, fresh, train_fn = build_trainer(
            env,
            PPOConfig(rollout_len=8, num_minibatches=2,
                      policy_dtype=dtype),
            seed=7,
        )
        variables, opt_state, carry, metrics = train_fn(
            env.scene, variables, opt_state, carry, fresh, env.reward_weights
        )
        results.append((jax.tree.leaves(variables), metrics))
    (va, ma), (vb, mb) = results
    for a, b in zip(va, vb):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-2, rtol=2e-1
        )
    for k in ("pg_loss", "v_loss", "entropy"):
        assert np.isfinite(float(np.asarray(mb[k])))
    # entropy of a fresh policy is near log(n_actions) in both dtypes
    np.testing.assert_allclose(
        float(np.asarray(ma["entropy"])), float(np.asarray(mb["entropy"])),
        atol=0.05,
    )


def test_flat_compact_matches_world_compact_losses(trainer):
    """compact_mode='flat' must train on exactly the same masked samples as
    per-world compaction: with matching rollouts, per-minibatch losses are
    identical up to fp reduction order (minibatches are time slices of ALL
    agents in both layouts)."""
    env, _ = trainer
    n_ctrl = int(np.asarray(env.scene.agents.controlled).sum())
    max_per_world = int(
        np.asarray(env.scene.agents.controlled).sum(axis=1).max()
    )
    results = {}
    for mode, cap in (("world", max_per_world), ("flat", n_ctrl)):
        _, variables, opt_state, carry, fresh, train_fn = build_trainer(
            env,
            PPOConfig(rollout_len=8, num_minibatches=2, compact=cap,
                      compact_mode=mode),
            seed=11,
        )
        variables, opt_state, carry, metrics = train_fn(
            env.scene, variables, opt_state, carry, fresh, env.reward_weights
        )
        results[mode] = {
            k: float(np.asarray(v)) for k, v in metrics.items()
        }
    # identical sample counts and episode stats; matching losses would
    # require identical action draws (different batch shapes -> different
    # categorical draws), so compare the structural invariants instead
    assert results["flat"]["samples"] == results["world"]["samples"]
    for k in ("pg_loss", "v_loss", "entropy", "approx_kl"):
        assert np.isfinite(results["flat"][k])


def test_flat_compact_obs_rows_match(trainer):
    """The flat rollout's first-step observations equal the world-compact
    rollout's rows at the corresponding (world, agent) pairs."""
    import jax.numpy as jnp

    from gpudrive_lab_tpu.env.env_jax import flat_observation

    env, _ = trainer
    scene = env.scene
    ctrl = np.asarray(scene.agents.controlled)
    W, A = ctrl.shape
    n_ctrl = int(ctrl.sum())
    order = np.argsort(np.where(ctrl.reshape(-1), 0, 1), kind="stable")
    w_idx = jnp.asarray(order[:n_ctrl] // A)
    a_idx = jnp.asarray(order[:n_ctrl] % A)
    state = env.state
    obs_f, _, _ = flat_observation(
        scene, state, env.params, env.spec, env.reward_weights,
        (w_idx, a_idx),
    )
    obs_d, _, _ = flat_observation(
        scene, state, env.params, env.spec, env.reward_weights, None
    )
    np.testing.assert_array_equal(
        np.asarray(obs_f),
        np.asarray(obs_d)[np.asarray(w_idx), np.asarray(a_idx)],
    )


def test_flat_capacity_guard(trainer):
    from gpudrive_lab_tpu.ppo.train import check_compact_capacity

    env, _ = trainer
    n_ctrl = int(np.asarray(env.scene.agents.controlled).sum())
    check_compact_capacity(env, n_ctrl, "flat")  # exact fit passes
    with pytest.raises(ValueError):
        check_compact_capacity(env, n_ctrl - 1, "flat")


def test_minibatch_rows_trains_and_covers_grid(trainer):
    """Row-axis minibatch slicing (flat mode): the (time-group, row-block)
    grid still consumes exactly the full batch every epoch, losses stay
    finite, params update, and the remat-obs path recomputes observations
    only for the sliced rows (the W>=1024 HBM unlock)."""
    env, _ = trainer
    n_ctrl = int(np.asarray(env.scene.agents.controlled).sum())
    cap = ((n_ctrl + 1) // 2) * 2  # even, >= n_ctrl (flat padding rows)
    base = dict(rollout_len=8, compact=cap, compact_mode="flat")

    results = {}
    for name, kw in (
        ("time_only", dict(num_minibatches=2)),
        ("rows", dict(num_minibatches=4, minibatch_rows=cap // 2)),
        ("rows_remat", dict(num_minibatches=4, minibatch_rows=cap // 2,
                            remat_obs=True)),
    ):
        _, variables, opt_state, carry, fresh, train_fn = build_trainer(
            env, PPOConfig(**base, **kw), seed=7,
        )
        before = np.asarray(jax.tree.leaves(variables)[0]).copy()
        variables, opt_state, carry, metrics = train_fn(
            env.scene, variables, opt_state, carry, fresh, env.reward_weights
        )
        after = np.asarray(jax.tree.leaves(variables)[0])
        assert not np.allclose(before, after), f"{name}: params did not update"
        results[name] = {k: float(np.asarray(v)) for k, v in metrics.items()}

    for name, m in results.items():
        for k in ("pg_loss", "v_loss", "entropy", "approx_kl"):
            assert np.isfinite(m[k]), f"{name}.{k} not finite"
    # identical rollout sample accounting regardless of minibatch layout
    assert results["rows"]["samples"] == results["time_only"]["samples"]
    assert results["rows_remat"]["samples"] == results["time_only"]["samples"]


def test_minibatch_rows_single_group_matches_time_only(trainer):
    """With one minibatch covering all rows and all T, the row-sliced path
    consumes the identical sample set as the legacy time-only path — the
    per-minibatch losses must agree up to fp reduction order (row order
    inside the minibatch differs via the permutation rng split)."""
    env, _ = trainer
    n_ctrl = int(np.asarray(env.scene.agents.controlled).sum())
    results = {}
    for name, kw in (
        ("time_only", dict(num_minibatches=1)),
        ("rows", dict(num_minibatches=1, minibatch_rows=n_ctrl)),
    ):
        _, variables, opt_state, carry, fresh, train_fn = build_trainer(
            env,
            PPOConfig(rollout_len=8, update_epochs=1, compact=n_ctrl,
                      compact_mode="flat", **kw),
            seed=3,
        )
        variables, opt_state, carry, metrics = train_fn(
            env.scene, variables, opt_state, carry, fresh, env.reward_weights
        )
        results[name] = {k: float(np.asarray(v)) for k, v in metrics.items()}
    for k in ("pg_loss", "v_loss", "entropy", "samples"):
        assert np.isclose(
            results["rows"][k], results["time_only"][k],
            rtol=1e-4, atol=1e-6,
        ), (k, results["rows"][k], results["time_only"][k])


def test_minibatch_rows_requires_flat_mode():
    from gpudrive_lab_tpu.ppo.ppo import make_ppo_funcs

    with pytest.raises(ValueError):
        make_ppo_funcs(
            None, None, None, None, "weighted_combination",
            PPOConfig(compact=4, compact_mode="world", minibatch_rows=2),
        )


def test_epoch_preshuffle_matches_take_path(trainer):
    """epoch_preshuffle cuts minibatches as contiguous slices of a
    once-per-epoch time shuffle; the sample grouping, visit order, and rng
    stream are constructed to be IDENTICAL to the per-minibatch take path
    (t_indices[m] == shuffled[t_starts[m]:+Tm] by definition), and the
    one-hot-matmul shuffle copies values exactly — so metrics and updated
    parameters must match to fp-reduction tolerance in every layout."""
    env, _ = trainer
    n_ctrl = int(np.asarray(env.scene.agents.controlled).sum())
    cap = ((n_ctrl + 1) // 2) * 2
    layouts = {
        "time_only": dict(num_minibatches=2, compact=cap,
                          compact_mode="flat"),
        "rows": dict(num_minibatches=4, minibatch_rows=cap // 2,
                     compact=cap, compact_mode="flat"),
        "world": dict(num_minibatches=2),
        "bf16": dict(num_minibatches=2, compact=cap, compact_mode="flat",
                     obs_store_dtype="bfloat16", policy_dtype="bfloat16"),
    }
    for name, kw in layouts.items():
        outs = {}
        for pre in (False, True):
            _, variables, opt_state, carry, fresh, train_fn = build_trainer(
                env,
                PPOConfig(rollout_len=8, update_epochs=2,
                          epoch_preshuffle=pre, **kw),
                seed=11,
            )
            variables, opt_state, carry, metrics = train_fn(
                env.scene, variables, opt_state, carry, fresh,
                env.reward_weights,
            )
            outs[pre] = (
                jax.tree.map(np.asarray, variables),
                {k: float(np.asarray(v)) for k, v in metrics.items()},
            )
        for k, v in outs[True][1].items():
            assert np.isclose(v, outs[False][1][k], rtol=2e-4, atol=1e-6), (
                name, k, v, outs[False][1][k]
            )
        deltas = jax.tree.map(
            lambda a, b: float(np.max(np.abs(a - b))),
            outs[True][0], outs[False][0],
        )
        assert max(jax.tree.leaves(deltas)) < 2e-5, (name, deltas)


def test_policy_embed_remat(trainer):
    """PolicyConfig.embed_remat recomputes the partner/road embed+pool in
    bwd: parameter trees are interchangeable (same names, same init) and a
    full train iteration is BITWISE identical with it on/off — remat replays
    the exact same ops, it never changes values."""
    import jax.numpy as jnp

    from gpudrive_lab_tpu.networks.late_fusion import (
        LateFusionPolicy, PolicyConfig,
    )

    # module-level interchangeability
    D = PolicyConfig().obs_dim
    v0 = LateFusionPolicy(PolicyConfig()).init(
        jax.random.PRNGKey(0), np.zeros((1, D), np.float32))
    v1 = LateFusionPolicy(PolicyConfig(embed_remat=True)).init(
        jax.random.PRNGKey(0), np.zeros((1, D), np.float32))
    assert jax.tree_util.tree_structure(v0) == jax.tree_util.tree_structure(
        v1)
    assert all(np.array_equal(a, b)
               for a, b in zip(jax.tree.leaves(v0), jax.tree.leaves(v1)))

    # end-to-end train-iteration equality (split store, the production pair)
    env, _ = trainer
    n_ctrl = int(np.asarray(env.scene.agents.controlled).sum())
    cap = ((n_ctrl + 1) // 2) * 2
    outs = {}
    for remat in (False, True):
        _, variables, opt_state, carry, fresh, train_fn = build_trainer(
            env,
            PPOConfig(rollout_len=8, num_minibatches=2, update_epochs=2,
                      remat_obs=False, obs_store="split", compact=cap,
                      compact_mode="flat", embed_remat=remat),
            seed=13,
        )
        variables, opt_state, carry, metrics = train_fn(
            env.scene, variables, opt_state, carry, fresh,
            env.reward_weights,
        )
        outs[remat] = jax.tree.map(np.asarray, variables)
    deltas = jax.tree.map(
        lambda a, b: float(np.max(np.abs(a - b))), outs[True], outs[False]
    )
    assert max(jax.tree.leaves(deltas)) == 0.0, deltas


def test_split_obs_store_matches_flat(trainer):
    """obs_store='split' stores (ego, partner, road) per-modality buffers and
    feeds LateFusionPolicy's pre-split apply path.  Concat-then-slice is the
    identity on each modality block, so one train iteration must match the
    flat [T, N, 3368] store to fp-reduction tolerance in every layout."""
    env, _ = trainer
    n_ctrl = int(np.asarray(env.scene.agents.controlled).sum())
    cap = ((n_ctrl + 1) // 2) * 2
    layouts = {
        "flat_f32": dict(compact=cap, compact_mode="flat"),
        "flat_bf16": dict(compact=cap, compact_mode="flat",
                          obs_store_dtype="bfloat16",
                          policy_dtype="bfloat16"),
        "rows": dict(num_minibatches=4, minibatch_rows=cap // 2,
                     compact=cap, compact_mode="flat"),
        "dense": dict(),
        "preshuffle": dict(compact=cap, compact_mode="flat",
                           epoch_preshuffle=True,
                           obs_store_dtype="bfloat16"),
    }
    for name, kw in layouts.items():
        kw = {**dict(rollout_len=8, num_minibatches=2, update_epochs=2,
                     remat_obs=False), **kw}
        outs = {}
        for store in ("flat", "split"):
            _, variables, opt_state, carry, fresh, train_fn = build_trainer(
                env, PPOConfig(obs_store=store, **kw), seed=13,
            )
            variables, opt_state, carry, metrics = train_fn(
                env.scene, variables, opt_state, carry, fresh,
                env.reward_weights,
            )
            outs[store] = (
                jax.tree.map(np.asarray, variables),
                {k: float(np.asarray(v)) for k, v in metrics.items()},
            )
        for k, v in outs["split"][1].items():
            assert np.isclose(v, outs["flat"][1][k], rtol=2e-4, atol=1e-6), (
                name, k, v, outs["flat"][1][k]
            )
        deltas = jax.tree.map(
            lambda a, b: float(np.max(np.abs(a - b))),
            outs["split"][0], outs["flat"][0],
        )
        assert max(jax.tree.leaves(deltas)) < 2e-5, (name, deltas)


def test_split_obs_flat_observation_blocks(trainer):
    """flat_observation(split=True) returns exactly the blocks the flat
    vector concatenates (the policy-unpack identity), for both dense and
    flat ego layouts."""
    import jax.numpy as jnp

    from gpudrive_lab_tpu.env.env_jax import flat_observation

    env, _ = trainer
    for ego_idx in (None, (jnp.asarray([0, 0, 1]), jnp.asarray([0, 2, 1]))):
        flat, pm_f, rm_f = flat_observation(
            env.scene, env.state, env.params, env.spec, env.reward_weights,
            ego_idx)
        ego, partner, road = flat_observation(
            env.scene, env.state, env.params, env.spec, env.reward_weights,
            ego_idx, split=True)[0]
        E = ego.shape[-1]
        P = partner.shape[-2] * partner.shape[-1]
        np.testing.assert_array_equal(np.asarray(flat[..., :E]),
                                      np.asarray(ego))
        np.testing.assert_array_equal(
            np.asarray(flat[..., E:E + P]),
            np.asarray(partner).reshape(partner.shape[:-2] + (-1,)))
        np.testing.assert_array_equal(
            np.asarray(flat[..., E + P:]),
            np.asarray(road).reshape(road.shape[:-2] + (-1,)))


def test_preshuffle_dot_branch_exact(trainer, monkeypatch):
    """Force the one-hot dot_general shuffle branch on the small test
    fixture (by lowering the size threshold) and assert it still matches
    the take path exactly — covering the production-sized code path that
    the default threshold hides from CI (ADVICE r4).  Int/bool leaves must
    route through jnp.take regardless."""
    from gpudrive_lab_tpu.ppo import ppo as ppomod

    env, _ = trainer
    n_ctrl = int(np.asarray(env.scene.agents.controlled).sum())
    cap = ((n_ctrl + 1) // 2) * 2
    kw = dict(rollout_len=8, num_minibatches=2, update_epochs=2,
              remat_obs=False, compact=cap, compact_mode="flat")
    outs = {}
    for name, (pre, thresh) in (
        ("take", (False, None)),
        ("dot_forced", (True, 1)),  # every float leaf takes the dot branch
    ):
        if thresh is not None:
            monkeypatch.setattr(ppomod, "PRESHUFFLE_DOT_MIN_ELEMS", thresh)
        _, variables, opt_state, carry, fresh, train_fn = build_trainer(
            env, PPOConfig(epoch_preshuffle=pre, **kw), seed=17,
        )
        variables, opt_state, carry, metrics = train_fn(
            env.scene, variables, opt_state, carry, fresh,
            env.reward_weights,
        )
        outs[name] = (
            jax.tree.map(np.asarray, variables),
            {k: float(np.asarray(v)) for k, v in metrics.items()},
        )
        monkeypatch.undo()
    for k, v in outs["dot_forced"][1].items():
        assert np.isclose(v, outs["take"][1][k], rtol=2e-4, atol=1e-6), (
            k, v, outs["take"][1][k]
        )
    deltas = jax.tree.map(
        lambda a, b: float(np.max(np.abs(a - b))),
        outs["dot_forced"][0], outs["take"][0],
    )
    assert max(jax.tree.leaves(deltas)) < 2e-5, deltas


def test_flat_compact_blocks(trainer):
    """Block-local flat compaction (compact_blocks=B): each block of W/B
    worlds contributes exactly its own controlled agents (padded from its
    own uncontrolled slots), the selection is world-block-local (the
    multi-chip invariant: row i depends only on block i*B//N), and training
    consumes the same sample count as global flat selection."""
    env, _ = trainer
    ctrl = np.asarray(env.scene.agents.controlled)
    W, A = ctrl.shape
    B = 2
    assert W % B == 0
    per_block = ctrl.reshape(B, -1).sum(axis=1)
    cap = int(per_block.max())
    cap += cap % 2  # even
    compact = B * cap

    # structural check on the selection itself
    from gpudrive_lab_tpu.networks.late_fusion import (
        LateFusionPolicy, PolicyConfig,
    )
    from gpudrive_lab_tpu.ppo.ppo import make_ppo_funcs

    cfgb = PPOConfig(rollout_len=8, num_minibatches=2, compact=compact,
                     compact_mode="flat", compact_blocks=B)
    # reach ctrl_slots through a tiny traced probe: run one train step and
    # check invariants via the mask/sample count below; plus replicate the
    # selection in numpy here
    wpb = W // B
    for b in range(B):
        rows = ctrl[b * wpb:(b + 1) * wpb].reshape(-1)
        order = np.argsort(np.where(rows, 0, 1), kind="stable")[:cap]
        # every controlled agent of the block is selected
        assert rows[order].sum() == rows.sum()

    samples = {}
    for blocks in (0, B):
        _, variables, opt_state, carry, fresh, train_fn = build_trainer(
            env,
            PPOConfig(rollout_len=8, num_minibatches=2, compact=compact,
                      compact_mode="flat", compact_blocks=blocks),
            seed=19,
        )
        before = np.asarray(jax.tree.leaves(variables)[0]).copy()
        variables, opt_state, carry, metrics = train_fn(
            env.scene, variables, opt_state, carry, fresh, env.reward_weights
        )
        m = {k: float(np.asarray(v)) for k, v in metrics.items()}
        assert np.isfinite(list(m.values())).all(), (blocks, m)
        assert not np.allclose(
            before, np.asarray(jax.tree.leaves(variables)[0])
        ), blocks
        samples[blocks] = m["samples"]
    assert samples[0] == samples[B], samples


def test_flat_compact_blocks_capacity_guard(trainer):
    """Per-block capacity: a compact that fits globally but not per-block
    must be rejected (silent drop would exclude whole agents from
    training)."""
    from gpudrive_lab_tpu.ppo.train import check_compact_capacity

    env, _ = trainer
    ctrl = np.asarray(env.scene.agents.controlled)
    B = 2
    per_block = ctrl.reshape(B, -1).sum(axis=1)
    cap = int(per_block.max())
    check_compact_capacity(env, B * cap, "flat", B)  # exact fit passes
    if per_block.min() < per_block.max():
        # global total fits in B*(max-ish) but some block overflows
        tight = int(per_block.sum())  # enough globally
        if (tight // B) < cap:
            with pytest.raises(ValueError):
                check_compact_capacity(env, (tight // B) * B, "flat", B)
