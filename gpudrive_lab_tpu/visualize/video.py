"""Rollout video rendering.

Mirror of the reference's wandb video pipeline
(reference: gpudrive/env/env_puffer.py:405-483): render selected worlds every
frame during a rollout and encode to GIF/MP4 (matplotlib writers; mp4 needs
ffmpeg, falls back to GIF)."""

from __future__ import annotations

from pathlib import Path
from typing import Callable, List, Optional

import numpy as np


def render_rollout(
    env,
    policy_fn: Optional[Callable] = None,
    env_idx: int = 0,
    max_steps: int = 91,
    zoom_radius: float = 80.0,
) -> List[np.ndarray]:
    """Roll out (random actions unless policy_fn(obs)->[W,A] indices given)
    and collect frames for one world."""
    obs = env.reset()
    frames = [env.render(env_idx, zoom_radius=zoom_radius)]
    rng = np.random.default_rng(0)
    for _ in range(max_steps):
        if policy_fn is None:
            acts = rng.integers(
                0, env.action_space_n, (env.num_worlds, env.max_agent_count)
            )
        else:
            acts = policy_fn(obs)
        env.step_dynamics(acts)
        obs = env.get_obs()
        frames.append(env.render(env_idx, zoom_radius=zoom_radius))
        if np.asarray(env.get_dones()).all():
            break
    return frames


def save_video(frames: List[np.ndarray], path: str, fps: int = 15) -> str:
    """Encode frames; .gif via Pillow, .mp4 via ffmpeg when available
    (reference render_format options gif/mp4)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.animation as animation
    import matplotlib.pyplot as plt

    path = str(path)
    fig = plt.figure(
        figsize=(frames[0].shape[1] / 100, frames[0].shape[0] / 100), dpi=100
    )
    ax = fig.add_axes([0, 0, 1, 1])
    ax.set_axis_off()
    im = ax.imshow(frames[0])

    def update(i):
        im.set_data(frames[i])
        return (im,)

    anim = animation.FuncAnimation(
        fig, update, frames=len(frames), interval=1000 / fps
    )
    if path.endswith(".mp4"):
        try:
            anim.save(path, writer=animation.FFMpegWriter(fps=fps))
        except Exception:
            path = path[:-4] + ".gif"
            anim.save(path, writer=animation.PillowWriter(fps=fps))
    else:
        anim.save(path, writer=animation.PillowWriter(fps=fps))
    plt.close(fig)
    return path


def render_training_videos(
    env,
    policy,
    variables,
    out_dir,
    global_step: int,
    num_worlds: int = 1,
    fmt: str = "gif",
    max_steps: int = 91,
) -> List[str]:
    """Checkpoint-adjacent rollout videos with the CURRENT policy — the
    training-telemetry hook (reference: gpudrive/env/env_puffer.py:405-483
    renders rollouts into wandb during training).

    Rolls the env's own (trainer-independent) state with argmax actions and
    writes one video per world to ``out_dir/world{i}_step{global_step}.gif``.
    Returns the written paths."""
    import jax
    import jax.numpy as jnp

    from pathlib import Path

    apply = jax.jit(policy.apply)

    def policy_fn(obs):
        logits, _ = apply(variables, jnp.asarray(obs))
        return np.asarray(jnp.argmax(logits, axis=-1))

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    paths = []
    for w in range(min(num_worlds, env.num_worlds)):
        frames = render_rollout(
            env, policy_fn, env_idx=w, max_steps=max_steps
        )
        paths.append(
            save_video(frames, str(out / f"world{w}_step{global_step}.{fmt}"))
        )
    # leave the env freshly reset so later callers see a clean state
    env.reset()
    return paths
