"""How does warm per-call latency scale with program size on the axon TPU?

Two families, each ONE jit program dispatched and blocked per call:
  bodyK  — K unrolled rollout bodies (obs + policy + step), K = 1,2,4,8
  sinN   — N chained elementwise ops on a tiny array, N = 256,2048,8192
  mmN    — N chained small matmuls [256x256], N = 64,512,2048

If bodyK latency is ~linear in K with a large slope while sinN/mmN stay
near the dispatch floor, the cost is specific to the rollout body's ops
(e.g. gather/scatter/top_k at scale); if sinN/mmN also grow ~1 ms/op, the
runtime has a per-op execution overhead and big programs are doomed.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

import gpudrive_lab_tpu

gpudrive_lab_tpu.enable_compile_cache()

from gpudrive_lab_tpu.env.config import EnvConfig
from gpudrive_lab_tpu.env.dataset import SceneDataLoader
from gpudrive_lab_tpu.env.env_jax import GPUDriveTPUEnv, flat_observation
from gpudrive_lab_tpu.ppo.train import build_trainer
from gpudrive_lab_tpu.ppo.ppo import PPOConfig
from gpudrive_lab_tpu.core import step as stepmod
from gpudrive_lab_tpu.networks.late_fusion import sample_logits
from gpudrive_lab_tpu import constants as C

W = 64
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
    env, PPOConfig(rollout_len=4, compact=64, unroll=True),
    seed=0, rollout_mode="unroll",
)
scene, weights, params, spec = env.scene, env.reward_weights, env.params, env.spec
cidx = jnp.argsort(
    jnp.where(scene.agents.controlled, 0, 1), axis=1, stable=True
)[:, :64]


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
    print(f"{name:12s} {best*1000:10.1f} ms", flush=True)


def make_bodyK(K):
    @jax.jit
    def f(state, variables, key):
        acc = jnp.float32(0)
        rng = key
        for _ in range(K):
            rng, k = jax.random.split(rng)
            obs, _, _ = flat_observation(
                scene, state, params, spec, weights, cidx
            )
            logits, value = policy.apply(variables, obs)
            a, logp, ent = sample_logits(k, logits)
            a_full = (
                jnp.zeros((W, C.MAX_AGENTS), a.dtype)
                .at[jnp.arange(W)[:, None], cidx]
                .set(a)
            )
            act = jnp.zeros(
                (W, C.MAX_AGENTS, C.ACTION_DIM), jnp.float32
            ).at[..., :3].set(env.action_keys[a_full])
            state = stepmod.step(scene, state, act, params)
            acc = acc + logp[0, 0] + value[0, 0]
        return acc

    return lambda k: f(fresh, variables, k)


import os

QUICK = os.environ.get("QUICK", "") not in ("", "0", "false")  # short TPU windows: 4 programs only

for K in ((1, 4) if QUICK else (1, 2, 4, 8)):
    timeit(f"body{K}", make_bodyK(K))


def make_sinN(N):
    @jax.jit
    def f(x, key):
        x = x + jax.random.uniform(key)
        for _ in range(N):
            x = jnp.sin(x) + 1e-6
        return x[0, 0]

    x0 = jnp.ones((8, 128), jnp.float32)
    return lambda k: f(x0, k)


for N in ((2048,) if QUICK else (256, 2048, 8192)):
    timeit(f"sin{N}", make_sinN(N))


def make_mmN(N):
    @jax.jit
    def f(x, key):
        x = x + jax.random.uniform(key)
        for _ in range(N):
            x = x @ x * 1e-3 + x
        return x[0, 0]

    x0 = jnp.eye(256, dtype=jnp.float32)
    return lambda k: f(x0, k)


for N in ((512,) if QUICK else (64, 512, 2048)):
    timeit(f"mm{N}", make_mmN(N))
