"""Frame / map visualization helpers (host-side, offline).

Covers the roles of `FrameDrawer` (`src/FrameDrawer.cc`: annotated current
frame with tracked keypoints + status text) and parts of `MapDrawer` /
`MapPublisher` as offline renders — there is no Pangolin/ROS here; outputs
are PNG/PLY artifacts (see also tools/visualize_map.py).
"""
from __future__ import annotations

import numpy as np


def draw_frame(img: np.ndarray, frame, status: str = "",
               n_inliers: int = 0) -> np.ndarray:
    """Annotate a grayscale frame with its keypoints: tracked (with a map
    point) bright squares, untracked dim dots.  Returns an RGB uint8 image.
    """
    g = np.clip(np.asarray(img), 0, 255).astype(np.uint8)
    out = np.stack([g, g, g], axis=-1)
    xy = np.asarray(frame.feats.xy)
    valid = np.asarray(frame.feats.valid)
    tracked = np.asarray(frame.pt_idx) >= 0
    h, w = g.shape

    def mark(x, y, color, r):
        x0, x1 = max(x - r, 0), min(x + r + 1, w)
        y0, y1 = max(y - r, 0), min(y + r + 1, h)
        out[y0:y1, x0, :] = color
        out[y0:y1, x1 - 1, :] = color
        out[y0, x0:x1, :] = color
        out[y1 - 1, x0:x1, :] = color

    for i in np.nonzero(valid)[0]:
        x, y = int(round(xy[i, 0])), int(round(xy[i, 1]))
        if not (0 <= x < w and 0 <= y < h):
            continue
        if tracked[i]:
            mark(x, y, np.asarray([0, 255, 0], np.uint8), 3)
        else:
            out[y, x] = [120, 120, 255]
    return out


def save_frame_png(path: str, img: np.ndarray, frame, status: str = "",
                   n_inliers: int = 0):
    from PIL import Image

    Image.fromarray(draw_frame(img, frame, status, n_inliers)).save(path)


def trajectory_figure(poses_cw: np.ndarray, pts: np.ndarray | None = None,
                      out_png: str | None = None):
    """Top-down (x, z) trajectory + map plot (MapDrawer role)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from dsp_slam_rgbd_tpu.ops import lie
    import jax.numpy as jnp

    centers = np.stack(
        [np.asarray(lie.inv_se3(jnp.asarray(T)))[:3, 3] for T in poses_cw]
    ) if len(poses_cw) else np.zeros((0, 3))
    fig, ax = plt.subplots(figsize=(7, 7))
    if pts is not None and len(pts):
        ax.scatter(pts[:, 0], pts[:, 2], s=0.4, c="gray", alpha=0.4)
    if len(centers):
        ax.plot(centers[:, 0], centers[:, 2], "g-", lw=1.5)
        ax.plot(centers[-1, 0], centers[-1, 2], "ro", ms=5)
    ax.set_aspect("equal")
    ax.set_xlabel("x [m]")
    ax.set_ylabel("z [m]")
    if out_png:
        fig.savefig(out_png, dpi=130, bbox_inches="tight")
        plt.close(fig)
    return fig
