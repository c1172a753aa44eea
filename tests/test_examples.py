"""Example scripts stay importable and their headless logic works.

The examples mirror the reference's tutorial set
(reference: examples/tutorials/01-08); GUI-dependent parts (matplotlib
windows) are not exercised here, but controller logic, the VBD sim-agent
pipeline, and behavior tagging are.
"""

import ast
import os
import runpy
import sys

import numpy as np
import pytest

EXAMPLES_DIR = os.path.join(os.path.dirname(__file__), "..", "examples")


def test_all_examples_parse():
    files = sorted(
        f for f in os.listdir(EXAMPLES_DIR) if f.endswith(".py")
    )
    assert len(files) >= 7
    for f in files:
        with open(os.path.join(EXAMPLES_DIR, f)) as fh:
            ast.parse(fh.read(), filename=f)


def test_behavior_diversity_example_runs(capsys):
    data_dir = os.path.join(os.path.dirname(__file__), "data")
    argv, sys.argv = sys.argv, ["x", "--scenes-dir", data_dir]
    try:
        runpy.run_path(
            os.path.join(EXAMPLES_DIR, "07_behavior_diversity.py"),
            run_name="__main__",
        )
    finally:
        sys.argv = argv
    out = capsys.readouterr().out
    assert "vehicles:" in out and "u-turns:" in out


def test_vbd_sim_agent_source_builds_trajectories(example_scene_paths):
    from gpudrive_lab_tpu import constants as C
    from gpudrive_lab_tpu.env.config import EnvConfig
    from gpudrive_lab_tpu.env.dataset import SceneDataLoader
    from gpudrive_lab_tpu.env.env_jax import GPUDriveTPUEnv

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "example_06", os.path.join(EXAMPLES_DIR, "06_vbd_sim_agents.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    loader = SceneDataLoader(
        root=os.path.dirname(example_scene_paths[0]), batch_size=1,
        dataset_size=1,
    )
    env = GPUDriveTPUEnv(
        EnvConfig(num_worlds=1, reward_type="distance_to_vdb_trajs",
                  use_vbd=True, vbd_in_obs=True),
        data_loader=loader,
    )
    env.reset()
    env.set_vbd_trajectories(mod.build_source(None))
    assert env.vbd_trajectories.shape[2] == C.TRAJECTORY_LEN
    expert = env.get_expert_actions()[0]
    env.step_dynamics(expert[:, :, 0])
    r = np.asarray(env.get_rewards())
    assert np.isfinite(r).all()
    obs = env.get_obs()
    assert obs.shape[-1] == 3368 + C.TRAJECTORY_LEN * 5


def test_keyboard_controller_headless(example_scene_paths):
    from gpudrive_lab_tpu.env.config import EnvConfig
    from gpudrive_lab_tpu.env.dataset import SceneDataLoader
    from gpudrive_lab_tpu.env.env_jax import GPUDriveTPUEnv
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "example_05",
        os.path.join(EXAMPLES_DIR, "05_interactive_viewer.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    loader = SceneDataLoader(
        root=os.path.dirname(example_scene_paths[0]), batch_size=1,
        dataset_size=1,
    )
    env = GPUDriveTPUEnv(EnvConfig(num_worlds=1), data_loader=loader)
    env.reset()
    ctl = mod.KeyboardController(env)
    first = ctl.agent_idx
    acts = ctl.actions_for_key("w")
    assert acts.shape[0] == 1  # [W, A, ...] full action array
    env.step_dynamics(acts)
    nxt = ctl.next_agent()
    assert nxt in list(ctl.candidates)
    if len(ctl.candidates) == 1:
        assert nxt == first
