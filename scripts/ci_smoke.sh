#!/usr/bin/env bash
# CI smoke contract — the one-command equivalent of the reference's CI
# workflow (reference: .github/workflows/*.yml:22-34, which builds the sim,
# loads a pretrained HF policy, and drives examples/experimental/
# viz_rollouts.py end-to-end on CPU).
#
# Runs on CPU in ~3 minutes.  Exit 0 = the framework's end-to-end surface
# works: package import, expert-replay contract, policy-checkpoint
# conversion + closed-loop rollout + rendering, headless bench, and the
# driver's graft entry points.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "=== [1/5] package import + TPU-registration-safe path"
python -c "import gpudrive_lab_tpu; print('import ok')"

echo "=== [2/5] expert-replay contract (every vehicle reaches goal, no collisions)"
python - <<'EOF'
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np
from gpudrive_lab_tpu.core.types import (
    Params, DynamicsModel, CollisionBehaviour, RewardType)
from gpudrive_lab_tpu.scene.compiler import build_scene
from gpudrive_lab_tpu.core import step as stepmod
params = Params(dynamics_model=DynamicsModel.CLASSIC,
                collision_behaviour=CollisionBehaviour.AGENT_STOP,
                reward_type=RewardType.DISTANCE_BASED,
                dist_to_goal_threshold=1.0, observation_radius=10.0,
                polyline_reduction_threshold=0.5, ignore_non_vehicles=True,
                max_num_controlled_agents=0)
scene = build_scene(['/root/reference/tests/pytest_data/test.json'], params)
step_fn = jax.jit(stepmod.step, static_argnames='params')
state = jax.jit(stepmod.reset, static_argnames='params')(scene, None, params)
acts = jnp.zeros((1, 128, 10))
for _ in range(91):
    state = step_fn(scene, state, acts, params)
veh = np.asarray(scene.agents.valid[0]) & (np.asarray(scene.agents.etype[0]) == 7)
assert np.asarray(state.reached_goal[0])[veh].all()
assert (np.asarray(state.collided[0])[veh] == 0).all()
print("expert replay ok:", int(veh.sum()), "vehicles")
EOF

echo "=== [3/5] pretrained-checkpoint conversion + closed-loop rollout + render"
python - <<'EOF'
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, tempfile, os
# Synthesize a NeuralNet-layout checkpoint (the reference CI downloads one
# from HF; this environment has no network, so exercise the identical code
# path on random weights).
rng = np.random.default_rng(0)
sd = {}
def lin(o, i, name):
    sd[f"{name}.weight"] = rng.normal(0, 0.05, (o, i)).astype(np.float32)
    sd[f"{name}.bias"] = np.zeros(o, np.float32)
for name, ind in (("ego_embed", 6), ("partner_embed", 6), ("road_map_embed", 13)):
    lin(64, ind, f"{name}.0")
    sd[f"{name}.1.weight"] = np.ones(64, np.float32)
    sd[f"{name}.1.bias"] = np.zeros(64, np.float32)
    lin(64, 64, f"{name}.4")
lin(128, 192, "shared_embed.0"); lin(91, 128, "actor"); lin(1, 128, "critic")
d = tempfile.mkdtemp()
from safetensors.numpy import save_file
save_file(sd, os.path.join(d, "model.safetensors"))

from gpudrive_lab_tpu.networks.convert import load_pretrained
policy, variables, pc = load_pretrained(d)
from gpudrive_lab_tpu.env.config import EnvConfig
from gpudrive_lab_tpu.env.env_jax import GPUDriveTPUEnv
from gpudrive_lab_tpu.agents import PolicyActor
from gpudrive_lab_tpu.utils.multi_policy_rollout import multi_policy_rollout
env = GPUDriveTPUEnv(
    EnvConfig(num_worlds=1),
    scene_paths=["/root/reference/tests/pytest_data/test.json"],
)
actor = PolicyActor(None, variables=variables, policy_config=pc,
                    deterministic=True)
mask = np.asarray(env.cont_agent_mask)
m = multi_policy_rollout(env, {"p": actor}, {"p": mask}, max_steps=10)
print("rollout metrics:", {k: round(float(v), 3) for k, v in m["p"].items()})
img = env.render(0, zoom_radius=80)
assert img.ndim == 3 and img.std() > 0
print("render ok", img.shape)
EOF

echo "=== [4/5] headless bench (smoke)"
python bench.py --smoke | tail -1

echo "=== [5/5] graft entry self-test (single-chip jit + 8-device dryrun)"
python __graft_entry__.py

echo "CI_SMOKE_OK"
