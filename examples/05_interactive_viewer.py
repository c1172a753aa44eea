"""Tutorial 5: interactive viewer — drive one agent with the keyboard.

Counterpart of the reference's Madrona viewer app (reference:
src/viewer.cpp:16-210: fly camera, per-agent view, WASD -> setAction).
Matplotlib-based: arrow keys / WASD steer the chosen agent, space pauses,
'n' switches agents; every key press advances the simulation one step.
``--fly`` switches to the Madrona viewer's free 3-D camera: WASD translates
in the look direction's horizontal plane, r/f climb/descend, i/k/j/l look,
'p' advances the sim one replay-log step (core.render.free_camera_render).
Requires a display (run locally, not headless); the control logic itself is
exercised headlessly by tests via ``KeyboardController``/``FlyCamera``.
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


class FlyCamera:
    """Free 3-D camera piloted by the keyboard (reference: src/viewer.cpp
    fly-camera controls).  Pure state + key handling; ``view()`` renders the
    current pose through core.render.free_camera_render, so it is headless-
    testable without a display."""

    MOVE = 4.0  # meters per key press
    TURN = 0.15  # radians per key press

    def __init__(self, env: GPUDriveTPUEnv, height: int = 160,
                 width: int = 160, world: int = 0):
        from gpudrive_lab_tpu.core.render import CameraConfig

        self.env = env
        self.world = world
        self.config = CameraConfig(height=height, width=width)
        # start above the scene's first valid agent, looking its way
        valid = np.nonzero(np.asarray(env.scene.agents.valid)[world])[0]
        a = int(valid[0]) if len(valid) else 0
        pos = np.asarray(env.state.pos)[world, a]
        self.pos = np.array([pos[0], pos[1], 15.0], np.float32)
        self.yaw = float(np.asarray(env.state.yaw)[world, a])
        self.pitch = -0.5

    def handle_key(self, key: str) -> bool:
        """Update the pose; returns True if the key was a camera control."""
        c, s = np.cos(self.yaw), np.sin(self.yaw)
        fwd = np.array([c, s, 0.0]) * self.MOVE
        left = np.array([-s, c, 0.0]) * self.MOVE
        if key == "w":
            self.pos += fwd
        elif key == "s":
            self.pos -= fwd
        elif key == "a":
            self.pos += left
        elif key == "d":
            self.pos -= left
        elif key == "r":
            self.pos[2] += self.MOVE
        elif key == "f":
            self.pos[2] -= self.MOVE
        elif key in ("j", "left"):
            self.yaw += self.TURN
        elif key in ("l", "right"):
            self.yaw -= self.TURN
        elif key in ("i", "up"):
            self.pitch = min(self.pitch + self.TURN, 1.5)
        elif key in ("k", "down"):
            self.pitch = max(self.pitch - self.TURN, -1.5)
        else:
            return False
        return True

    def view(self) -> np.ndarray:
        """[H, W, 4] uint8 frame at the current pose."""
        from gpudrive_lab_tpu.core.render import free_camera_render

        rgb, _ = free_camera_render(
            self.env.scene, self.env.state,
            jnp.asarray(self.pos), jnp.float32(self.yaw),
            jnp.float32(self.pitch), self.config, world=self.world,
        )
        return np.asarray(rgb)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scene", default="/root/reference/tests/pytest_data/test.json")
    p.add_argument("--zoom", type=float, default=50.0)
    p.add_argument("--fly", action="store_true",
                   help="free 3-D fly camera instead of the top-down drive "
                        "view (reference: src/viewer.cpp)")
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
    fly = FlyCamera(env) if args.fly else None

    def redraw():
        ax.clear()
        if fly is not None:
            ax.imshow(fly.view())
            ax.set_title(
                "fly camera — wasd move, r/f up/down, ijkl look, "
                "p: replay-log step, q: quit"
            )
        else:
            ax.imshow(env.render(0, zoom_radius=args.zoom))
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
        if fly is not None:
            if event.key == "p":
                ctl.replay_step()
            else:
                fly.handle_key(event.key or "")
        elif event.key == "n":
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
