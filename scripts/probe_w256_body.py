"""Time one full rollout body (obs + policy + sample + place-back + step)
standalone at W=256/CC=64 — calibrates the expected 32-body rollout cost
inside the big train program (see docs/PERFORMANCE.md round-3 notes)."""

import time

import jax
import jax.numpy as jnp

import gpudrive_lab_tpu

gpudrive_lab_tpu.enable_compile_cache()

from gpudrive_lab_tpu import constants as C
from gpudrive_lab_tpu.core import step as stepmod
from gpudrive_lab_tpu.env.config import EnvConfig
from gpudrive_lab_tpu.env.dataset import SceneDataLoader
from gpudrive_lab_tpu.env.env_jax import GPUDriveTPUEnv, flat_observation
from gpudrive_lab_tpu.networks.late_fusion import sample_logits
from gpudrive_lab_tpu.ppo.ppo import PPOConfig
from gpudrive_lab_tpu.ppo.train import build_trainer

W, CC = 256, 64
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


def timeit(name, fn, reps=3):
    t0 = time.time()
    jax.block_until_ready(fn(jax.random.PRNGKey(0)))
    c = time.time() - t0
    best = min(
        (lambda t: (jax.block_until_ready(fn(jax.random.PRNGKey(r + 1))),
                    time.time() - t)[1])(time.time())
        for r in range(reps)
    )
    print(f"{name:18s} {best*1000:9.1f} ms  (compile {c:.1f}s)", flush=True)


@jax.jit
def full_body(state, key):
    state = state.replace(
        pos=state.pos + jax.random.uniform(key, (), minval=0, maxval=1e-6)
    )
    obs, _, _ = flat_observation(scene, state, params, spec, weights, cidx)
    logits, value = policy.apply(variables, obs)
    a, logp, ent = sample_logits(key, logits)
    a_full = (
        jnp.zeros((W, C.MAX_AGENTS), a.dtype)
        .at[jnp.arange(W)[:, None], cidx]
        .set(a)
    )
    act = jnp.zeros((W, C.MAX_AGENTS, C.ACTION_DIM), jnp.float32).at[
        ..., :3
    ].set(env.action_keys[a_full])
    s = stepmod.step(scene, state, act, params)
    return logp.sum() + value.sum() + s.pos.sum()


timeit("body_w256", lambda k: full_body(fresh, k))


@jax.jit
def obs_only(state, key):
    state = state.replace(
        pos=state.pos + jax.random.uniform(key, (), minval=0, maxval=1e-6)
    )
    obs, _, _ = flat_observation(scene, state, params, spec, weights, cidx)
    return obs.sum()


timeit("obs_w256", lambda k: obs_only(fresh, k))


@jax.jit
def step_only(state, key):
    state = state.replace(
        pos=state.pos + jax.random.uniform(key, (), minval=0, maxval=1e-6)
    )
    act = jnp.zeros((W, C.MAX_AGENTS, C.ACTION_DIM), jnp.float32)
    s = stepmod.step(scene, state, act, params)
    return s.pos.sum()


timeit("step_w256", lambda k: step_only(fresh, k))
