"""Every example script EXECUTES headlessly end-to-end (matplotlib Agg,
tiny arguments) — the analogue of the reference CI smoke test that runs
viz_rollouts.py (reference: .github/workflows).  Specialized tests below
additionally exercise the keyboard controller, the VBD sim-agent pipeline,
and behavior tagging in-process.
"""

import ast
import os
import runpy
import sys

import matplotlib

matplotlib.use("Agg", force=True)

import numpy as np
import pytest

EXAMPLES_DIR = os.path.join(os.path.dirname(__file__), "..", "examples")
DATA_DIR = os.path.join(os.path.dirname(__file__), "data")
REF_EXAMPLES = "/root/reference/data/processed/examples"
REF_SCENE = "/root/reference/tests/pytest_data/test.json"


def _scenes_dir():
    return REF_EXAMPLES if os.path.isdir(REF_EXAMPLES) else DATA_DIR


def _scene():
    return REF_SCENE if os.path.exists(REF_SCENE) else os.path.join(
        DATA_DIR, "tfrecord_synthetic_0.json"
    )


def test_all_examples_parse():
    files = sorted(
        f for f in os.listdir(EXAMPLES_DIR) if f.endswith(".py")
    )
    assert len(files) >= 7
    for f in files:
        with open(os.path.join(EXAMPLES_DIR, f)) as fh:
            ast.parse(fh.read(), filename=f)


def _run_example(name, argv, capsys=None):
    """Execute an example script as __main__ with the given argv, headless."""
    import matplotlib.pyplot as plt

    old_argv = sys.argv
    sys.argv = ["x"] + argv
    try:
        runpy.run_path(os.path.join(EXAMPLES_DIR, name), run_name="__main__")
    finally:
        sys.argv = old_argv
        plt.close("all")
    return capsys.readouterr().out if capsys else ""


def test_example_01_simulate_runs(capsys):
    out = _run_example(
        "01_simulate.py", ["--scenes-dir", _scenes_dir()], capsys
    )
    assert "obs shape:" in out


def test_example_02_expert_replay_runs(capsys):
    out = _run_example("02_expert_replay.py", ["--scene", _scene()], capsys)
    assert "goal" in out.lower()


def test_example_03_policy_rollout_runs(capsys, tmp_path):
    out = _run_example(
        "03_policy_rollout.py", ["--scenes-dir", _scenes_dir()], capsys
    )
    assert "policy_a" in out and "policy_b" in out


def test_example_04_imitation_learning_runs(capsys):
    out = _run_example(
        "04_imitation_learning.py", ["--scene", _scene(), "--epochs", "1"],
        capsys,
    )
    assert "epoch" in out.lower() or "loss" in out.lower()


def test_example_05_interactive_viewer_runs(capsys):
    # Agg backend: the figure builds, handlers register, plt.show no-ops
    _run_example("05_interactive_viewer.py", ["--scene", _scene()], capsys)


def test_example_06_vbd_sim_agents_runs(capsys):
    out = _run_example(
        "06_vbd_sim_agents.py",
        ["--scenes-dir", _scenes_dir(), "--steps", "2"], capsys,
    )
    assert out.strip()


def test_example_08_il_analysis_runs(capsys, tmp_path):
    out = _run_example(
        "08_il_analysis.py",
        ["--scenes-dir", _scenes_dir(), "--epochs", "1",
         "--rollout-steps", "5", "--out", str(tmp_path / "il")], capsys,
    )
    assert out.strip()


def test_example_09_pretrained_policy_runs(capsys, tmp_path):
    out = _run_example(
        "09_pretrained_policy.py",
        ["--scenes-dir", _scenes_dir(), "--steps", "5",
         "--out", str(tmp_path / "frame.png")], capsys,
    )
    assert "action_dim" in out


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
