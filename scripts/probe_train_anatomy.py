"""Decompose the PPO train iteration's TPU wall time.

Times each component of the train step as its own warm jitted program with
varied inputs and a consumed scalar (bench methodology, CLAUDE.md), to
locate where the measured 15 s/iter (unroll mode, W=64) actually goes:

  rollout32   the unrolled 32-step rollout (policy + step + obs store)
  body1       one rollout body
  update      the unrolled E*M minibatch update on a precomputed traj
  obs         flat_observation alone (compact path)
  policy      policy.apply alone on [W*C, obs_dim]
  step        raw sim step alone

Usage: timeout 3000 python scripts/probe_train_anatomy.py [--worlds 64]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

import gpudrive_lab_tpu

gpudrive_lab_tpu.enable_compile_cache()

from gpudrive_lab_tpu.env.config import EnvConfig
from gpudrive_lab_tpu.env.dataset import SceneDataLoader
from gpudrive_lab_tpu.env.env_jax import GPUDriveTPUEnv, flat_observation
from gpudrive_lab_tpu.ppo.ppo import PPOConfig, make_ppo_funcs, EnvCarry
from gpudrive_lab_tpu.ppo.train import build_trainer
from gpudrive_lab_tpu.core import step as stepmod
from gpudrive_lab_tpu import constants as C

p = argparse.ArgumentParser()
p.add_argument("--worlds", type=int, default=64)
p.add_argument("--compact", type=int, default=64)
p.add_argument("--reps", type=int, default=3)
args = p.parse_args()

W = args.worlds
loader = SceneDataLoader(
    root="/root/reference/data/processed/examples", batch_size=W,
    dataset_size=1000, sample_with_replacement=True, seed=0,
)
cfg = EnvConfig(
    num_worlds=W, reward_type="weighted_combination",
    collision_weight=-0.75, off_road_weight=-0.75,
    goal_achieved_weight=1.0, dynamics_model="classic",
    collision_behavior="ignore",
)
env = GPUDriveTPUEnv(cfg, data_loader=loader)
ppo_cfg = PPOConfig(
    rollout_len=32, num_minibatches=16, remat_obs=False,
    obs_store_dtype="bfloat16", compact=args.compact, unroll=True,
)
policy, variables, opt_state, carry, fresh, _ = build_trainer(
    env, ppo_cfg, seed=0, rollout_mode="unroll"
)

# rebuild the pieces make_ppo_funcs keeps internal
from gpudrive_lab_tpu.networks.late_fusion import sample_logits

scene, weights, params, spec = env.scene, env.reward_weights, env.params, env.spec
cidx = jnp.argsort(
    jnp.where(scene.agents.controlled, 0, 1), axis=1, stable=True
)[:, : args.compact]


def timeit(name, fn, *argfn):
    """fn(key) -> scalar-consumable; warm once, then best of reps."""
    out = fn(jax.random.PRNGKey(0))
    jax.block_until_ready(out)
    best = None
    for r in range(args.reps):
        t0 = time.time()
        out = fn(jax.random.PRNGKey(r + 1))
        jax.block_until_ready(out)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"{name:12s} {best*1000:10.1f} ms")
    return best


# ---- raw sim step ----------------------------------------------------------
@jax.jit
def j_step(state, key):
    a = jax.random.randint(key, (W, C.MAX_AGENTS), 0, env.action_space_n)
    act = jnp.zeros((W, C.MAX_AGENTS, C.ACTION_DIM), jnp.float32).at[..., :3].set(
        env.action_keys[a]
    )
    s = stepmod.step(scene, state, act, params)
    return s.pos[0, 0, 0]

timeit("step", lambda k: j_step(fresh, k))


# ---- obs alone (compact) ---------------------------------------------------
@jax.jit
def j_obs(state, key):
    obs, _, _ = flat_observation(scene, state, params, spec, weights, cidx)
    return obs[0, 0, 0] + jax.random.uniform(key)

timeit("obs_compact", lambda k: j_obs(fresh, k))


@jax.jit
def j_obs_dense(state, key):
    obs, _, _ = flat_observation(scene, state, params, spec, weights, None)
    return obs[0, 0, 0] + jax.random.uniform(key)

timeit("obs_dense", lambda k: j_obs_dense(fresh, k))


# ---- policy alone ----------------------------------------------------------
obs0, _, _ = jax.jit(
    lambda s: flat_observation(scene, s, params, spec, weights, cidx)
)(fresh)


@jax.jit
def j_policy(obs, key):
    logits, value = policy.apply(variables, obs + jax.random.uniform(key))
    a, logp, ent = sample_logits(key, logits)
    return logp[0, 0] + value[0, 0]

timeit("policy", lambda k: j_policy(obs0, k))


# ---- policy backward (one minibatch-sized fwd+bwd) -------------------------
mb_obs = obs0[: max(W // 8, 1)]  # [W/8, C, D] ~ one minibatch (T/M=2, /16)


@jax.jit
def j_policy_grad(obs, key):
    def loss(v):
        logits, value = policy.apply(v, obs + jax.random.uniform(key))
        return (logits.mean() + value.mean())

    g = jax.grad(loss)(variables)
    return jax.tree.leaves(g)[0].ravel()[0]

timeit("policy_grad", lambda k: j_policy_grad(mb_obs, k))


# ---- one rollout body / full rollout / update ------------------------------
init_fn, train_step, _, _ = make_ppo_funcs(
    policy, params, spec, env.action_keys, cfg.reward_type, ppo_cfg
)

# recreate rollout/update closures via a tiny shim: call train_step pieces by
# re-jitting the module-level functions is not exposed; instead time the
# full iteration and a rollout-only program built from the same config.
from gpudrive_lab_tpu.ppo import ppo as ppomod

funcs = ppomod.make_ppo_funcs(
    policy, params, spec, env.action_keys, cfg.reward_type, ppo_cfg
)
train_fn = jax.jit(funcs[1])


def iter_fn(key):
    c = carry._replace(rng=key)
    v, o, c2, m = train_fn(scene, variables, opt_state, c, fresh, weights)
    return m["samples"]

timeit("train_iter", iter_fn)

# rollout-only: emulate the unrolled rollout (policy + step + obs) in ONE jit
@jax.jit
def j_rollout32(key):
    c = carry._replace(rng=key)
    acc = jnp.float32(0)
    state = c.state
    rng = key
    for _ in range(32):
        rng, k = jax.random.split(rng)
        obs, _, _ = flat_observation(scene, state, params, spec, weights, cidx)
        logits, value = policy.apply(variables, obs)
        a, logp, ent = sample_logits(k, logits)
        a_full = (
            jnp.zeros((W, C.MAX_AGENTS), a.dtype)
            .at[jnp.arange(W)[:, None], cidx]
            .set(a)
        )
        act = jnp.zeros((W, C.MAX_AGENTS, C.ACTION_DIM), jnp.float32).at[
            ..., :3
        ].set(env.action_keys[a_full])
        state = stepmod.step(scene, state, act, params)
        acc = acc + logp[0, 0] + value[0, 0] + obs.astype(jnp.bfloat16)[0, 0, 0].astype(jnp.float32)
    return acc

timeit("rollout32", j_rollout32)
