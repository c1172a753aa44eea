"""Bisect flat_observation: which collector executes ~435 ms at W=64, C=64?

probe_obs_policy_fusion showed flat_observation ALONE (compact path) costs
467 ms warm while the policy on a precomputed obs costs 29 ms, and
probe_program_scaling showed bodies scale linearly — so this is real device
execution time, not dispatch overhead.  Time each collector compact vs
dense, plus the KNN top_k isolated on a random lattice.

Usage: timeout 3000 python scripts/probe_obs_anatomy.py
"""

import time

import jax
import jax.numpy as jnp

import gpudrive_lab_tpu

gpudrive_lab_tpu.enable_compile_cache()

from gpudrive_lab_tpu.env.config import EnvConfig
from gpudrive_lab_tpu.env.dataset import SceneDataLoader
from gpudrive_lab_tpu.env.env_jax import GPUDriveTPUEnv, flat_observation
from gpudrive_lab_tpu.ppo.train import build_trainer
from gpudrive_lab_tpu.ppo.ppo import PPOConfig
from gpudrive_lab_tpu.core import observations as obsmod
from gpudrive_lab_tpu import constants as C

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
_, _, _, _, fresh, _ = build_trainer(
    env, PPOConfig(rollout_len=4, compact=CC, unroll=True),
    seed=0, rollout_mode="unroll",
)
scene, weights, params, spec = env.scene, env.reward_weights, env.params, env.spec
cidx = jnp.argsort(
    jnp.where(scene.agents.controlled, 0, 1), axis=1, stable=True
)[:, :CC]
R = scene.roads.pos.shape[1]
print(f"W={W} C={CC} A={C.MAX_AGENTS} R={R} "
      f"algo={params.road_obs_algorithm}", flush=True)


def timeit(name, fn, reps=3):
    out = fn(jax.random.PRNGKey(0))
    jax.block_until_ready(out)
    best = None
    for r in range(reps):
        t0 = time.time()
        out = fn(jax.random.PRNGKey(r + 1))
        jax.block_until_ready(out)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"{name:16s} {best*1000:10.1f} ms", flush=True)


def perturb(state, key):
    return state.replace(pos=state.pos + jax.random.uniform(key) * 1e-6)


def run(name, make):
    f = jax.jit(make)
    timeit(name, lambda k: f(fresh, k))


run("self_c", lambda s, k: obsmod.self_observation(
    scene, perturb(s, k), cidx).sum())
run("self_d", lambda s, k: obsmod.self_observation(
    scene, perturb(s, k), None).sum())
run("partner_c", lambda s, k: obsmod.partner_observations(
    scene, perturb(s, k), params, cidx).sum())
run("partner_d", lambda s, k: obsmod.partner_observations(
    scene, perturb(s, k), params, None).sum())
run("roadfeat_c", lambda s, k: obsmod._road_observation_features(
    scene, perturb(s, k), cidx)[0].sum())
run("road_c", lambda s, k: obsmod.agent_map_observations(
    scene, perturb(s, k), params, cidx).sum())
run("road_d", lambda s, k: obsmod.agent_map_observations(
    scene, perturb(s, k), params, None).sum())
run("obs_c", lambda s, k: flat_observation(
    scene, perturb(s, k), params, spec, weights, cidx)[0].sum())
run("obs_d", lambda s, k: flat_observation(
    scene, perturb(s, k), params, spec, weights, None)[0].sum())


@jax.jit
def topk_rand(key):
    d = jax.random.uniform(key, (W, CC, R), jnp.float32)
    v, i = jax.lax.top_k(-d, C.MAX_AGENT_MAP_OBS)
    return v.sum() + i.sum()


timeit("topk_rand", topk_rand)
