"""Tutorial 5: interactive viewer — drive one agent with the keyboard.

Counterpart of the reference's Madrona viewer app (reference:
src/viewer.cpp:16-210: fly camera, per-agent view, WASD -> setAction).
Matplotlib-based: arrow keys / WASD steer the chosen agent, space pauses,
'n' switches agents; every key press advances the simulation one step.
Requires a display (run locally, not headless); the control logic itself is
exercised headlessly by tests via ``KeyboardController``.
"""

import argparse

import jax.numpy as jnp
import numpy as np

from gpudrive_lab_tpu.env.config import EnvConfig
from gpudrive_lab_tpu.env.env_jax import GPUDriveTPUEnv


class KeyboardController:
    """Maps key presses to (accel, steer) for one focused agent and builds
    the full action array (experts drive everyone else)."""

    ACCEL = {"w": 2.0, "up": 2.0, "s": -2.0, "down": -2.0}
    STEER = {"a": 0.6, "left": 0.6, "d": -0.6, "right": -0.6}

    def __init__(self, env: GPUDriveTPUEnv, agent_idx: int | None = None):
        self.env = env
        ctrl = np.asarray(env.cont_agent_mask)[0]
        candidates = np.nonzero(ctrl)[0]
        assert len(candidates), "no controllable agents in world 0"
        self.candidates = candidates
        self.agent_idx = int(candidates[0] if agent_idx is None else agent_idx)

    def next_agent(self):
        i = list(self.candidates).index(self.agent_idx)
        self.agent_idx = int(self.candidates[(i + 1) % len(self.candidates)])
        return self.agent_idx

    def actions_for_key(self, key: str) -> jnp.ndarray:
        accel = self.ACCEL.get(key, 0.0)
        steer = self.STEER.get(key, 0.0)
        acts = np.zeros((self.env.num_worlds, self.env.max_agent_count, 10),
                        np.float32)
        acts[0, self.agent_idx, 0] = accel
        acts[0, self.agent_idx, 1] = steer
        return jnp.asarray(acts)

    def step(self, key: str):
        self.env.step_dynamics(self.actions_for_key(key))
        return np.asarray(self.env.state.pos)[0, self.agent_idx]

    def replay_step(self):
        """Advance one step with EVERY agent following the logged expert
        (the madrona viewer's replay-log playback, viewer.cpp record/replay;
        the focused agent included)."""
        t = int(np.asarray(self.env.world_time_steps)[0])
        expert_actions, _, _, _, _ = self.env.get_expert_actions()
        from gpudrive_lab_tpu.env.env_jax import _slice_t

        self.env.step_dynamics(_slice_t(expert_actions, t))
        return np.asarray(self.env.state.pos)[0, self.agent_idx]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scene", default="/root/reference/tests/pytest_data/test.json")
    p.add_argument("--zoom", type=float, default=50.0)
    args = p.parse_args()

    env = GPUDriveTPUEnv(
        EnvConfig(num_worlds=1, dynamics_model="classic",
                  collision_behavior="ignore"),
        scene_paths=[args.scene],
    )
    env.reset()
    ctl = KeyboardController(env)

    import os

    import matplotlib

    # interactive backend only when a display exists (the WASD window,
    # reference: src/viewer.cpp); headless runs (CI) keep Agg
    if os.environ.get("DISPLAY"):
        try:
            matplotlib.use("TkAgg")
        except Exception:
            pass
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 8))

    def redraw():
        ax.clear()
        img = env.render(0, zoom_radius=args.zoom)
        ax.imshow(img)
        ax.set_title(
            f"agent {ctl.agent_idx} — WASD/arrows drive, n: next agent, "
            "p: replay-log step, q: quit"
        )
        ax.set_axis_off()
        fig.canvas.draw_idle()

    def on_key(event):
        if event.key == "q":
            plt.close(fig)
            return
        if event.key == "n":
            ctl.next_agent()
        elif event.key == "p":
            ctl.replay_step()
        else:
            ctl.step(event.key or "")
        redraw()

    fig.canvas.mpl_connect("key_press_event", on_key)
    redraw()
    plt.show()


if __name__ == "__main__":
    main()
