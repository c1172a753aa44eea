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
from gpudrive_lab_tpu.visualize.utils import (
    img_from_fig,
    plot_bounding_box,
    plot_crosswalk,
    plot_speed_bump,
    plot_stop_sign,
)


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
                for k in np.nonzero(m)[0]:
                    plot_stop_sign(ax, pos[k, 0], pos[k, 1])
            elif t == C.ET_CROSSWALK:
                for k in np.nonzero(m)[0]:
                    plot_crosswalk(
                        ax, pos[k, 0], pos[k, 1], yaw[k],
                        2 * scale[k, 0], 2 * scale[k, 1],
                    )
            elif t == C.ET_SPEED_BUMP:
                for k in np.nonzero(m)[0]:
                    plot_speed_bump(
                        ax, pos[k, 0], pos[k, 1], yaw[k],
                        2 * scale[k, 0], 2 * scale[k, 1],
                    )
            else:
                for k in np.nonzero(m)[0]:
                    plot_bounding_box(
                        ax, pos[k, 0], pos[k, 1], yaw[k],
                        2 * scale[k, 0], 2 * scale[k, 1], color,
                        alpha=0.35, zorder=1,
                    )

    def _plot_roads_3d(self, ax, w: int):
        """Road graph as ground-plane 3-D line segments with a per-type
        gradient (reference: visualize/core.py:371-406 Line3DCollection)."""
        from mpl_toolkits.mplot3d.art3d import Line3DCollection

        r = self._roads
        valid = r["valid"][w]
        pos = r["pos"][w][valid]
        yaw = r["yaw"][w][valid]
        scale = r["scale"][w][valid]
        etype = r["etype"][w][valid]
        for t in np.unique(etype):
            if t not in (C.ET_ROAD_EDGE, C.ET_ROAD_LINE, C.ET_ROAD_LANE):
                continue
            m = etype == t
            dx = scale[m, 0] * np.cos(yaw[m])
            dy = scale[m, 0] * np.sin(yaw[m])
            z = np.zeros(m.sum())
            segs = np.stack(
                [
                    np.stack([pos[m, 0] - dx, pos[m, 1] - dy, z], -1),
                    np.stack([pos[m, 0] + dx, pos[m, 1] + dy, z], -1),
                ],
                axis=1,
            )
            color = ROAD_GRAPH_COLORS.get(int(t), "#cccccc")
            lw = 1.0 if t == C.ET_ROAD_EDGE else 0.4
            ax.add_collection3d(
                Line3DCollection(segs, colors=color, linewidths=lw)
            )

    @staticmethod
    def _agent_box_3d(ax, x, y, yaw, length, width, height, color):
        """One oriented 3-D vehicle box (Poly3DCollection of 6 faces;
        reference render_3d agent drawing)."""
        from mpl_toolkits.mplot3d.art3d import Poly3DCollection

        c, s = np.cos(yaw), np.sin(yaw)
        hx, hy = length / 2, width / 2
        corners = np.array(
            [[hx, hy], [hx, -hy], [-hx, -hy], [-hx, hy]]
        ) @ np.array([[c, s], [-s, c]])
        corners += (x, y)
        lo = [(cx, cy, 0.0) for cx, cy in corners]
        hi = [(cx, cy, height) for cx, cy in corners]
        faces = [lo, hi] + [
            [lo[i], lo[(i + 1) % 4], hi[(i + 1) % 4], hi[i]]
            for i in range(4)
        ]
        ax.add_collection3d(
            Poly3DCollection(
                faces, facecolors=color, edgecolors="black",
                linewidths=0.3, alpha=0.9,
            )
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
        """Top-down views of selected worlds; 3-D perspective when the
        vis config sets ``render_3d`` (reference: visualize/core.py:105-1400,
        3-D branch :274-475).  Returns a list of RGB arrays (or matplotlib
        figures when return_single_figure)."""
        render_3d = bool(getattr(self.config, "render_3d", False))
        veh_height = float(getattr(self.config, "vehicle_height", 0.06) or 0.06)
        pos = np.asarray(state.pos)
        yaw = np.asarray(state.yaw)
        outs = []
        for w in env_indices:
            if render_3d:
                fig = plt.figure(figsize=figsize)
                ax = fig.add_subplot(projection="3d")
                ax.set_axis_off()
                self._plot_roads_3d(ax, w)
            else:
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
                color = self._agent_color(w, i, state, policy_masks)
                if render_3d:
                    self._agent_box_3d(
                        ax, x, y, yaw[w, i],
                        size[0] * C.VEHICLE_LENGTH_SCALE,
                        size[1] * C.VEHICLE_LENGTH_SCALE,
                        max(size[0], 1.0) * veh_height * 30, color,
                    )
                else:
                    plot_bounding_box(
                        ax, x, y, yaw[w, i],
                        size[0] * C.VEHICLE_LENGTH_SCALE,
                        size[1] * C.VEHICLE_LENGTH_SCALE, color,
                    )
                if self._agents["controlled"][w, i]:
                    g = self._agents["goal"][w, i]
                    if render_3d:
                        ax.scatter(g[0], g[1], 0.0, s=14, marker="*",
                                   color="#1a9641")
                    else:
                        ax.scatter(g[0], g[1], s=14, marker="*",
                                   color="#1a9641", zorder=2)
                if draw_expert_trajectories:
                    tv = self._agents["traj_valid"][w, i] > 0
                    tp = self._agents["traj_pos"][w, i][tv]
                    if render_3d:
                        ax.plot(tp[:, 0], tp[:, 1], 0.05,
                                color="#9e9e9e", linewidth=0.5, alpha=0.6)
                    else:
                        ax.plot(tp[:, 0], tp[:, 1], color="#9e9e9e",
                                linewidth=0.5, alpha=0.6, zorder=0)
            if render_3d:
                live = valid & (pos[w, :, 0] > -10000)
                cx, cy = (pos[w][live].mean(axis=0) if live.any()
                          else (0.0, 0.0))
                r3 = zoom_radius or 100.0
                ax.set_xlim(cx - r3, cx + r3)
                ax.set_ylim(cy - r3, cy + r3)
                ax.set_zlim(0, r3 * 0.05)
                outs.append(fig if return_single_figure else img_from_fig(fig))
                continue
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

    def plot_importance_weight(
        self,
        state: SimState,
        env_idx: int,
        importance: np.ndarray,
        ego_agent: int,
        zoom_radius: Optional[float] = None,
        figsize=(8, 8),
    ):
        """Per-head figures with partner boxes colored by ego->partner
        attention (reference: visualize/core.py:1641-1734
        _plot_importance_weight + plot_bar_plot inset).

        importance: [H, A-1] per-head attention over the ego's partner obs
        slots (il.analysis collects it).  Returns a list of RGB arrays, one
        per head."""
        from matplotlib import cm

        from gpudrive_lab_tpu.il.analysis import partner_slot_map

        pos = np.asarray(state.pos)
        yaw = np.asarray(state.yaw)
        A = pos.shape[1]
        slots = partner_slot_map(A)[ego_agent]  # [A-1] agent idx per slot
        valid = self._agents["valid"][env_idx][slots]
        live = valid & (pos[env_idx, slots, 0] > -10000)

        outs = []
        for h in range(importance.shape[0]):
            fig, ax = plt.subplots(figsize=figsize)
            ax.set_aspect("equal")
            ax.set_axis_off()
            self._plot_roads(ax, env_idx)
            # ego box in red
            size = self._agents["size"][env_idx, ego_agent]
            plot_bounding_box(
                ax, *pos[env_idx, ego_agent], yaw[env_idx, ego_agent],
                size[0] * C.VEHICLE_LENGTH_SCALE,
                size[1] * C.VEHICLE_LENGTH_SCALE, "#d7191c",
            )
            w = importance[h][live]
            span = w.max() - w.min()
            score = (w - w.min()) / span if span > 1e-6 else np.zeros_like(w)
            colors = cm.viridis(score)[:, :3]
            for color, slot_agent in zip(colors, slots[live]):
                s = self._agents["size"][env_idx, slot_agent]
                plot_bounding_box(
                    ax, *pos[env_idx, slot_agent], yaw[env_idx, slot_agent],
                    s[0] * C.VEHICLE_LENGTH_SCALE,
                    s[1] * C.VEHICLE_LENGTH_SCALE, tuple(color),
                )
            # attention bar inset (reference utils.plot_bar_plot)
            if w.size:
                inset = fig.add_axes([0.72, 0.74, 0.24, 0.22])
                inset.bar(np.arange(w.size), np.sort(w)[::-1],
                          color="#2b83ba")
                inset.set_title(f"head {h} attention", fontsize=7)
                inset.tick_params(labelsize=5)
            if zoom_radius is not None:
                cx, cy = pos[env_idx, ego_agent]
                ax.set_xlim(cx - zoom_radius, cx + zoom_radius)
                ax.set_ylim(cy - zoom_radius, cy + zoom_radius)
            else:
                ax.autoscale_view()
            outs.append(img_from_fig(fig))
        return outs

    def plot_linear_probing(
        self,
        state: SimState,
        env_idx: int,
        ego_agent: int,
        ego_pred: Sequence[int],
        ego_pred_prime: Sequence[int],
        partner_pred: Sequence[int],
        partner_log_cells: Optional[Sequence[int]] = None,
        figsize=(8, 8),
    ):
        """Ego-centered probe grid with predicted future-cell paths
        (reference: visualize/core.py:1736-1873 _plot_linear_probing):
        dashed numbered 8x8 grid around the ego, dashed ego path over the
        probe horizons, dotted intervened-ego path, dashed partner path,
        solid logged-partner path when labels are given.  Returns an RGB
        array."""
        from gpudrive_lab_tpu.il.analysis import (
            GRID_CORNER_LINES,
            GRID_EXTENT,
            cell_centers_ego_frame,
        )

        pos = np.asarray(state.pos)
        yaw = np.asarray(state.yaw)
        fig, ax = plt.subplots(figsize=figsize)
        ax.set_aspect("equal")
        ax.set_axis_off()
        self._plot_roads(ax, env_idx)
        ex, ey = pos[env_idx, ego_agent]
        eyaw = float(yaw[env_idx, ego_agent])
        c, s = np.cos(eyaw), np.sin(eyaw)
        R = np.array([[c, -s], [s, c]])  # ego->world

        corners = np.linspace(-GRID_EXTENT, GRID_EXTENT, GRID_CORNER_LINES)
        gx, gy = np.meshgrid(corners, corners)
        pts = R @ np.stack([gx.ravel(), gy.ravel()])
        wx = pts[0].reshape(gx.shape) + ex
        wy = pts[1].reshape(gy.shape) + ey
        for i in range(GRID_CORNER_LINES):
            ax.plot(wx[i], wy[i], color="black", ls="--", lw=0.7, zorder=3)
            ax.plot(wx[:, i], wy[:, i], color="black", ls="--", lw=0.7,
                    zorder=3)
        side = GRID_CORNER_LINES - 1
        for r_i in range(side):
            for c_i in range(side):
                ax.text(wx[r_i, c_i], wy[r_i, c_i], str(r_i * side + c_i),
                        fontsize=6, color="black", zorder=3)

        centers = cell_centers_ego_frame()  # [cells, 2] ego frame

        def to_world(cells):
            p = centers[np.asarray(cells, int)]
            return (R @ p.T).T + np.array([ex, ey])

        for cells, style, color in (
            (ego_pred, "--", "#d7191c"),
            (ego_pred_prime, ":", "#d7191c"),
            (partner_pred, "--", "#2b83ba"),
        ):
            if len(cells):
                p = to_world(cells)
                ax.plot(p[:, 0], p[:, 1], ls=style, color=color, lw=2,
                        zorder=4)
        if partner_log_cells is not None and len(partner_log_cells):
            p = to_world(partner_log_cells)
            ax.plot(p[:, 0], p[:, 1], ls="-", color="#2b83ba", lw=2,
                    zorder=4)

        size = self._agents["size"][env_idx, ego_agent]
        plot_bounding_box(
            ax, ex, ey, eyaw,
            size[0] * C.VEHICLE_LENGTH_SCALE,
            size[1] * C.VEHICLE_LENGTH_SCALE, "#d7191c",
        )
        ax.set_xlim(ex - GRID_EXTENT * 1.2, ex + GRID_EXTENT * 1.2)
        ax.set_ylim(ey - GRID_EXTENT * 1.2, ey + GRID_EXTENT * 1.2)
        return img_from_fig(fig)

    def plot_log_replay_comparison(
        self,
        positions: np.ndarray,
        env_idx: int,
        agent_indices: Optional[Sequence[int]] = None,
        figsize=(8, 8),
    ):
        """Rollout trajectories (solid) against the logged expert
        trajectories (dashed) for the selected agents (the reference's
        log-replay comparison overlays).  positions: [T, W, A, 2] rollout
        position history.  Returns an RGB array."""
        fig, ax = plt.subplots(figsize=figsize)
        ax.set_aspect("equal")
        ax.set_axis_off()
        self._plot_roads(ax, env_idx)
        valid = self._agents["valid"][env_idx]
        if agent_indices is None:
            agent_indices = np.nonzero(
                valid & self._agents["controlled"][env_idx]
            )[0]
        for j, i in enumerate(agent_indices):
            color = POLICY_COLORS[j % len(POLICY_COLORS)]
            tv = self._agents["traj_valid"][env_idx, i] > 0
            tp = self._agents["traj_pos"][env_idx, i][tv]
            if len(tp):
                ax.plot(tp[:, 0], tp[:, 1], ls="--", color=color, lw=1.0,
                        alpha=0.7, label=f"agent {i} log" if j < 6 else None)
            rp = positions[:, env_idx, i]
            live = rp[:, 0] > -10000
            ax.plot(rp[live, 0], rp[live, 1], ls="-", color=color, lw=1.2,
                    label=f"agent {i} policy" if j < 6 else None)
        ax.legend(fontsize=6, loc="upper right")
        ax.autoscale_view()
        return img_from_fig(fig)

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
