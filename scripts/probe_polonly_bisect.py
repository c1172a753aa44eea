"""Fine-grained bisect of the 444 ms v_polonly body (round-2 finding).

v_polonly = compact-gather obs (ego_idx=cidx) + policy.apply + sample, W=64,
CC=64.  The fast sim bench runs DENSE obs (ego_idx=None) with NO policy at
~10 ms/step, so the blowup must live in (a) the compact obs gathers, (b) the
policy forward, or (c) the categorical sample.  This probe times each layer
and each obs modality separately — all blocked best-of-3, varied PRNG keys.

Run: PYTHONPATH="$PYTHONPATH:/root/repo" timeout 1200 python \
     scripts/probe_polonly_bisect.py
"""

import time

import jax
import jax.numpy as jnp

import gpudrive_lab_tpu

gpudrive_lab_tpu.enable_compile_cache()

from gpudrive_lab_tpu.env.config import EnvConfig
from gpudrive_lab_tpu.env.dataset import SceneDataLoader
from gpudrive_lab_tpu.env.env_jax import GPUDriveTPUEnv, ObsSpec, flat_observation
from gpudrive_lab_tpu.ppo.train import build_trainer
from gpudrive_lab_tpu.ppo.ppo import PPOConfig
from gpudrive_lab_tpu.networks.late_fusion import sample_logits

W = 64
CC = 64
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
policy, variables, _, carry, fresh, _ = build_trainer(
    env, PPOConfig(rollout_len=4, compact=CC, unroll=True),
    seed=0, rollout_mode="unroll",
)
scene, weights, params, spec = env.scene, env.reward_weights, env.params, env.spec
order = jnp.argsort(jnp.where(scene.agents.controlled, 0, 1), axis=1, stable=True)
cidx = order[:, :CC]
obs_dim = env.spec.obs_dim
print(f"W={W} CC={CC} R={scene.max_roads} obs_dim={obs_dim}", flush=True)


def timeit(name, fn, reps=3):
    t0 = time.time()
    out = fn(jax.random.PRNGKey(0))
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    best = None
    for r in range(reps):
        t0 = time.time()
        out = fn(jax.random.PRNGKey(r + 1))
        jax.block_until_ready(out)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"{name:22s} {best*1000:9.1f} ms   (compile {compile_s:.1f}s)",
          flush=True)


def perturb(state, key):
    """Vary an input so repetitions can't be memoized."""
    eps = jax.random.uniform(key, (), minval=0.0, maxval=1e-6)
    return state.replace(pos=state.pos + eps)


# --- layer 1: obs assembly alone (dense vs compact) -----------------------
def mk_obs(ego, sp):
    @jax.jit
    def f(state, key):
        state = perturb(state, key)
        obs, _, _ = flat_observation(scene, state, params, sp, weights, ego)
        return obs.sum()
    return lambda k: f(fresh, k)


timeit("obs_dense", mk_obs(None, spec))
timeit("obs_compact", mk_obs(cidx, spec))

# --- layer 2: obs modalities under compact gather --------------------------
only = dict(ego_state=False, road_map_obs=False, partner_obs=False,
            norm_obs=True, reward_conditioned=False)
timeit("obs_c_ego", mk_obs(cidx, ObsSpec(**{**only, "ego_state": True})))
timeit("obs_c_partner", mk_obs(cidx, ObsSpec(**{**only, "partner_obs": True})))
timeit("obs_c_road", mk_obs(cidx, ObsSpec(**{**only, "road_map_obs": True})))
timeit("obs_d_road", mk_obs(None, ObsSpec(**{**only, "road_map_obs": True})))

# --- road-obs algorithm comparison under compact gather ---------------------
import dataclasses
from gpudrive_lab_tpu.core.types import RoadObsAlgorithm

road_spec = ObsSpec(**{**only, "road_map_obs": True})
p_knn = dataclasses.replace(
    params, road_obs_algorithm=RoadObsAlgorithm.KNEAREST
)
p_knn_approx = dataclasses.replace(p_knn, approx_top_k=True)


def mk_obs_p(ego, sp, pp):
    @jax.jit
    def f(state, key):
        state = state.replace(
            pos=state.pos
            + jax.random.uniform(key, (), minval=0.0, maxval=1e-6)
        )
        obs, _, _ = flat_observation(scene, state, pp, sp, weights, ego)
        return obs.sum()
    return lambda k: f(fresh, k)


timeit("road_knn_exact", mk_obs_p(cidx, road_spec, p_knn))
timeit("road_knn_approx", mk_obs_p(cidx, road_spec, p_knn_approx))

# --- layer 3: policy + sample on a CONSTANT obs ----------------------------
@jax.jit
def pol_const(obs, key):
    eps = jax.random.uniform(key, (), minval=0.0, maxval=1e-6)
    logits, value = policy.apply(variables, obs + eps)
    a, logp, ent = sample_logits(key, logits)
    return logp.sum() + value.sum() + a.sum()


const_obs = jnp.zeros((W, CC, obs_dim), jnp.float32)
timeit("pol_const", lambda k: pol_const(const_obs, k))


@jax.jit
def pol_nosample(obs, key):
    eps = jax.random.uniform(key, (), minval=0.0, maxval=1e-6)
    logits, value = policy.apply(variables, obs + eps)
    return logits.sum() + value.sum()


timeit("pol_nosample", lambda k: pol_nosample(const_obs, k))


@jax.jit
def sample_const(logits, key):
    eps = jax.random.uniform(key, (), minval=0.0, maxval=1e-6)
    a, logp, ent = sample_logits(key, logits + eps)
    return logp.sum() + ent.sum() + a.sum()


const_logits = jnp.zeros((W, CC, env.action_space_n), jnp.float32)
timeit("sample_const", lambda k: sample_const(const_logits, k))

# --- layer 4: full compositions --------------------------------------------
def mk_full(ego):
    @jax.jit
    def f(state, key):
        state = perturb(state, key)
        obs, _, _ = flat_observation(scene, state, params, spec, weights, ego)
        logits, value = policy.apply(variables, obs)
        a, logp, ent = sample_logits(key, logits)
        return logp.sum() + value.sum() + a.sum()
    return lambda k: f(fresh, k)


timeit("obs_dense+pol", mk_full(None))
timeit("obs_compact+pol", mk_full(cidx))
