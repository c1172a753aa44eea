"""Drawing primitives (reference: gpudrive/visualize/utils.py)."""

from __future__ import annotations

import io

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
from matplotlib.patches import Polygon


def img_from_fig(fig) -> np.ndarray:
    """Render a figure to an RGB uint8 array
    (reference: visualize/utils.py:17-37)."""
    buf = io.BytesIO()
    fig.savefig(buf, format="raw", dpi=fig.dpi)
    buf.seek(0)
    w, h = fig.canvas.get_width_height()
    img = np.frombuffer(buf.getvalue(), np.uint8).reshape(h, w, 4)[..., :3]
    plt.close(fig)
    return img


def box_corners(cx, cy, yaw, half_l, half_w):
    """[4, 2] world-frame corners of an oriented box."""
    c, s = np.cos(yaw), np.sin(yaw)
    local = np.array(
        [[-half_l, -half_w], [half_l, -half_w], [half_l, half_w], [-half_l, half_w]]
    )
    rot = np.array([[c, -s], [s, c]])
    return local @ rot.T + np.array([cx, cy])


def plot_bounding_box(ax, cx, cy, yaw, length, width, color, alpha=1.0,
                      label=None, zorder=3):
    """Oriented vehicle rectangle (reference: visualize/utils.py bounding-box
    prims)."""
    corners = box_corners(cx, cy, yaw, length / 2, width / 2)
    ax.add_patch(
        Polygon(corners, closed=True, facecolor=color, edgecolor="black",
                linewidth=0.4, alpha=alpha, zorder=zorder, label=label)
    )
    # heading tick
    tip = corners[1:3].mean(axis=0)
    ax.plot([cx, tip[0]], [cy, tip[1]], color="black", linewidth=0.4,
            zorder=zorder + 1)
