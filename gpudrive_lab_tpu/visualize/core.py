"""Matplotlib scene visualizer.

Re-implementation of the reference's MatplotlibVisualizer
(reference: gpudrive/visualize/core.py:105-1872) over the Scene/SimState
pytrees: multi-world figures with road graph, oriented agent boxes colored by
state or policy, goals, optional expert-trajectory overlays, plus the
egocentric per-agent view (plot_agent_observation)."""

from __future__ import annotations

from typing import Optional, Sequence

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from gpudrive_lab_tpu import constants as C
from gpudrive_lab_tpu.core.types import Scene, SimState
from gpudrive_lab_tpu.visualize.color import (
    AGENT_COLOR_BY_STATE,
    POLICY_COLORS,
    ROAD_GRAPH_COLORS,
)
from gpudrive_lab_tpu.visualize.utils import img_from_fig, plot_bounding_box


class MatplotlibVisualizer:
    def __init__(self, scene: Scene, vis_config=None):
        self.update_scene(scene)
        self.config = vis_config

    def update_scene(self, scene: Scene):
        """Refresh cached host copies after set_maps
        (reference: env_torch.py:1372-1384)."""
        self.scene = scene
        self._roads = {
            "pos": np.asarray(scene.roads.pos),
            "yaw": np.asarray(scene.roads.yaw),
            "scale": np.asarray(scene.roads.scale),
            "etype": np.asarray(scene.roads.etype),
            "valid": np.asarray(scene.roads.valid),
        }
        self._agents = {
            "valid": np.asarray(scene.agents.valid),
            "size": np.asarray(scene.agents.size),
            "goal": np.asarray(scene.agents.goal),
            "static": np.asarray(scene.agents.static),
            "controlled": np.asarray(scene.agents.controlled),
            "traj_pos": np.asarray(scene.agents.traj_pos),
            "traj_valid": np.asarray(scene.agents.traj_valid),
        }

    def _plot_roads(self, ax, w: int):
        r = self._roads
        valid = r["valid"][w]
        pos = r["pos"][w][valid]
        yaw = r["yaw"][w][valid]
        scale = r["scale"][w][valid]
        etype = r["etype"][w][valid]
        for t in np.unique(etype):
            m = etype == t
            color = ROAD_GRAPH_COLORS.get(int(t), "#cccccc")
            if t in (C.ET_ROAD_EDGE, C.ET_ROAD_LINE, C.ET_ROAD_LANE):
                # segments: draw as line from midpoint -+ half-length
                dx = scale[m, 0] * np.cos(yaw[m])
                dy = scale[m, 0] * np.sin(yaw[m])
                x0, y0 = pos[m, 0] - dx, pos[m, 1] - dy
                x1, y1 = pos[m, 0] + dx, pos[m, 1] + dy
                lw = 1.0 if t == C.ET_ROAD_EDGE else 0.4
                segs = np.stack(
                    [np.stack([x0, y0], -1), np.stack([x1, y1], -1)], axis=1
                )
                from matplotlib.collections import LineCollection

                ax.add_collection(
                    LineCollection(segs, colors=color, linewidths=lw, zorder=1)
                )
            elif t == C.ET_STOP_SIGN:
                ax.scatter(pos[m, 0], pos[m, 1], s=12, marker="H",
                           color=color, zorder=2)
            else:  # crosswalk / speed bump rectangles
                for k in np.nonzero(m)[0]:
                    plot_bounding_box(
                        ax, pos[k, 0], pos[k, 1], yaw[k],
                        2 * scale[k, 0], 2 * scale[k, 1], color,
                        alpha=0.35, zorder=1,
                    )

    def _agent_color(self, w: int, i: int, state: Optional[SimState],
                     policy_masks=None):
        if policy_masks is not None:
            for p, mask in enumerate(policy_masks):
                if np.asarray(mask)[w, i]:
                    return POLICY_COLORS[p % len(POLICY_COLORS)]
        if state is not None:
            if np.asarray(state.collided)[w, i]:
                return AGENT_COLOR_BY_STATE["collided"]
            if np.asarray(state.reached_goal)[w, i]:
                return AGENT_COLOR_BY_STATE["goal_achieved"]
        if self._agents["static"][w, i]:
            return AGENT_COLOR_BY_STATE["static"]
        if not self._agents["controlled"][w, i]:
            return AGENT_COLOR_BY_STATE["expert"]
        return AGENT_COLOR_BY_STATE["ok"]

    def plot_simulator_state(
        self,
        state: SimState,
        env_indices: Sequence[int] = (0,),
        zoom_radius: Optional[float] = None,
        draw_expert_trajectories: bool = False,
        policy_masks=None,
        center_agent_indices: Optional[Sequence[int]] = None,
        return_single_figure: bool = False,
        figsize=(8, 8),
    ):
        """Top-down views of selected worlds
        (reference: visualize/core.py:105-1400).  Returns a list of RGB
        arrays (or matplotlib figures when return_single_figure)."""
        pos = np.asarray(state.pos)
        yaw = np.asarray(state.yaw)
        outs = []
        for w in env_indices:
            fig, ax = plt.subplots(figsize=figsize)
            ax.set_aspect("equal")
            ax.set_axis_off()
            self._plot_roads(ax, w)
            valid = self._agents["valid"][w]
            done = np.asarray(state.done)[w]
            for i in np.nonzero(valid)[0]:
                x, y = pos[w, i]
                if x < -10000:  # teleported-away padding position
                    continue
                size = self._agents["size"][w, i]
                plot_bounding_box(
                    ax, x, y, yaw[w, i],
                    size[0] * C.VEHICLE_LENGTH_SCALE,
                    size[1] * C.VEHICLE_LENGTH_SCALE,
                    self._agent_color(w, i, state, policy_masks),
                )
                if self._agents["controlled"][w, i]:
                    g = self._agents["goal"][w, i]
                    ax.scatter(g[0], g[1], s=14, marker="*",
                               color="#1a9641", zorder=2)
                if draw_expert_trajectories:
                    tv = self._agents["traj_valid"][w, i] > 0
                    tp = self._agents["traj_pos"][w, i][tv]
                    ax.plot(tp[:, 0], tp[:, 1], color="#9e9e9e",
                            linewidth=0.5, alpha=0.6, zorder=0)
            if zoom_radius is not None:
                ci = (center_agent_indices[list(env_indices).index(w)]
                      if center_agent_indices is not None else None)
                if ci is not None:
                    cx, cy = pos[w, ci]
                else:
                    live = valid & (pos[w, :, 0] > -10000)
                    cx, cy = (pos[w][live].mean(axis=0)
                              if live.any() else (0.0, 0.0))
                ax.set_xlim(cx - zoom_radius, cx + zoom_radius)
                ax.set_ylim(cy - zoom_radius, cy + zoom_radius)
            else:
                ax.autoscale_view()
            if return_single_figure:
                outs.append(fig)
            else:
                outs.append(img_from_fig(fig))
        return outs

    def plot_agent_observation(
        self,
        state: SimState,
        env_idx: int,
        agent_idx: int,
        observation_radius: float = 50.0,
        figsize=(6, 6),
    ):
        """Egocentric view of one agent's neighborhood
        (reference: visualize/core.py:1404+)."""
        from gpudrive_lab_tpu.core.geometry import (
            quat_yaw_diff,
            rotate_into_frame,
        )
        import jax.numpy as jnp

        pos = np.asarray(state.pos)
        yaw = np.asarray(state.yaw)
        fig, ax = plt.subplots(figsize=figsize)
        ax.set_aspect("equal")
        ego = pos[env_idx, agent_idx]
        eyaw = yaw[env_idx, agent_idx]
        c, s = np.cos(eyaw), np.sin(eyaw)
        R = np.array([[c, s], [-s, c]])

        r = self._roads
        valid = r["valid"][env_idx]
        rel = (r["pos"][env_idx][valid][:, :2] - ego) @ R.T
        within = np.linalg.norm(rel, axis=-1) <= observation_radius
        for k in np.nonzero(within)[0]:
            t = int(r["etype"][env_idx][valid][k])
            ry = r["yaw"][env_idx][valid][k] - eyaw
            half = r["scale"][env_idx][valid][k]
            dx, dy = half[0] * np.cos(ry), half[0] * np.sin(ry)
            ax.plot(
                [rel[k, 0] - dx, rel[k, 0] + dx],
                [rel[k, 1] - dy, rel[k, 1] + dy],
                color=ROAD_GRAPH_COLORS.get(t, "#cccccc"), linewidth=0.6,
            )

        a_valid = self._agents["valid"][env_idx]
        for i in np.nonzero(a_valid)[0]:
            p = (pos[env_idx, i] - ego) @ R.T
            if np.linalg.norm(p) > observation_radius and i != agent_idx:
                continue
            size = self._agents["size"][env_idx, i]
            color = "#d7191c" if i == agent_idx else "#2b83ba"
            plot_bounding_box(
                ax, p[0], p[1], yaw[env_idx, i] - eyaw,
                size[0] * C.VEHICLE_LENGTH_SCALE,
                size[1] * C.VEHICLE_LENGTH_SCALE, color,
            )
        ax.set_xlim(-observation_radius, observation_radius)
        ax.set_ylim(-observation_radius, observation_radius)
        ax.set_axis_off()
        return fig
