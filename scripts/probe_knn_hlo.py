"""Dump the optimized HLO of the slow agent_map_observations program.

Prints the compiled (post-optimization) HLO op histogram and any fusion
containing a gather/sort, to see what the backend actually scheduled.

Usage: timeout 1200 python scripts/probe_knn_hlo.py
"""

import collections
import re

import jax
import jax.numpy as jnp

import gpudrive_lab_tpu

gpudrive_lab_tpu.enable_compile_cache()

from gpudrive_lab_tpu.env.config import EnvConfig
from gpudrive_lab_tpu.env.dataset import SceneDataLoader
from gpudrive_lab_tpu.env.env_jax import GPUDriveTPUEnv
from gpudrive_lab_tpu.ppo.train import build_trainer
from gpudrive_lab_tpu.ppo.ppo import PPOConfig
from gpudrive_lab_tpu.core import observations as obsmod

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
scene, params = env.scene, env.params
cidx = jnp.argsort(
    jnp.where(scene.agents.controlled, 0, 1), axis=1, stable=True
)[:, :CC]


def full(s, k):
    s = s.replace(pos=s.pos + jax.random.uniform(k) * 1e-6)
    return obsmod.agent_map_observations(scene, s, params, cidx).sum()


lowered = jax.jit(full).lower(fresh, jax.random.PRNGKey(0))
compiled = lowered.compile()
txt = compiled.as_text()
print(f"total HLO text: {len(txt)} bytes")

ops = collections.Counter()
for m in re.finditer(r"^\s*(?:ROOT\s+)?%?[\w.-]+\s*=\s*[\w\[\]{},/ ]+\s+(\w+)\(",
                     txt, re.M):
    ops[m.group(1)] += 1
for op, n in ops.most_common(30):
    print(f"{op:24s} {n}")

# print every fusion header line plus kind
print("\n--- fusion headers ---")
for line in txt.splitlines():
    ls = line.strip()
    if (" fusion(" in ls or ls.startswith("ROOT") and "fusion(" in ls):
        print(ls[:400])
    if "sort(" in ls or "gather(" in ls or "scatter(" in ls:
        print(ls[:400])
