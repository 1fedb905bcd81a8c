"""Object detection containers + LiDAR/mask preprocessing.

Covers `ObjectDetection` (`src/ObjectDetection.cc`: Sim3/SE3 pose
measurement with scale decomposition, surface points, rays, depths) and the
detection assembly of `reconstruct/kitti_sequence.py:99-216` (box→pose,
LiDAR crop + subsample, rays + depth packaging) in fixed-capacity form.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np

MAX_SURFACE = 256   # reference caps LiDAR points at 250 (config num_lidar_max)
MAX_RAYS = 512      # fg rays + ≤200 background rays


class ObjectDetection(NamedTuple):
    """One detection, camera frame.  Fixed-size arrays + masks."""
    t_co: np.ndarray      # (4, 4) SE(3) object→camera pose measurement
    scale: float          # object scale (factored out of t_co)
    pts: np.ndarray       # (MAX_SURFACE, 3) surface points (camera frame)
    pts_mask: np.ndarray  # (MAX_SURFACE,)
    rays: np.ndarray      # (MAX_RAYS, 3) ray directions
    ray_mask: np.ndarray  # (MAX_RAYS,)
    depth: np.ndarray     # (MAX_RAYS,) observed depth (fg slots)
    fg_mask: np.ndarray   # (MAX_RAYS,) foreground flags


class MonoDetection(NamedTuple):
    """A monocular mask-only detection: no 3D pose measurement — just the
    keypoints of the current keyframe that fall inside the (eroded)
    instance mask, plus background rays from the inflated box around it
    (reference `ObjectDetection` mono fields + `GetObjectDetectionsMono`,
    `Tracking_util.cc:163-208`).  The 3D pose is recovered downstream from
    the owned map points (PCA cuboid → GN reconstruction)."""
    kp_idx: np.ndarray   # (n,) keypoint indices inside the mask (host, ragged)
    bg_rays: np.ndarray  # (m, 3) background rays (camera frame, z = 1)
    is_good: bool        # ≥ 20 keypoints in the mask (reference :199-202)


def make_detection(t_co_sim3: np.ndarray, pts=None, rays=None, depth=None,
                   n_fg: int | None = None) -> ObjectDetection:
    """Build a padded detection from ragged inputs.

    t_co_sim3 may be Sim(3): scale = det(R)^(1/3) is factored out
    (reference `ObjectDetection.cc:24-46` SetPoseMeasurementSim3).
    """
    t = np.asarray(t_co_sim3, np.float32).copy()
    scale = float(np.cbrt(np.linalg.det(t[:3, :3])))
    t[:3, :3] /= scale

    P = np.zeros((MAX_SURFACE, 3), np.float32)
    pm = np.zeros(MAX_SURFACE, bool)
    if pts is not None and len(pts):
        n = min(len(pts), MAX_SURFACE)
        P[:n] = pts[:n]
        pm[:n] = True

    R = np.zeros((MAX_RAYS, 3), np.float32)
    rm = np.zeros(MAX_RAYS, bool)
    D = np.zeros(MAX_RAYS, np.float32)
    fg = np.zeros(MAX_RAYS, bool)
    if rays is not None and len(rays):
        n = min(len(rays), MAX_RAYS)
        R[:n] = rays[:n]
        rm[:n] = True
        if depth is not None:
            nf = min(len(depth), n) if n_fg is None else min(n_fg, n)
            D[:nf] = np.asarray(depth)[:nf]
            fg[:nf] = True
    return ObjectDetection(t, scale, P, pm, R, rm, D, fg)


def crop_lidar_to_box(velo_cam: np.ndarray, t_co: np.ndarray, extent,
                      margin: float = 1.1, max_pts: int = MAX_SURFACE):
    """Select LiDAR points inside an (inflated) 3D box and subsample
    (reference `kitti_sequence.py:124-143`)."""
    t_oc = np.linalg.inv(t_co)
    local = velo_cam @ t_oc[:3, :3].T + t_oc[:3, 3]
    half = np.asarray(extent) * 0.5 * margin
    inside = np.all(np.abs(local) <= half, axis=1)
    sel = np.nonzero(inside)[0]
    if len(sel) > max_pts:
        sel = sel[np.linspace(0, len(sel) - 1, max_pts).astype(int)]
    return velo_cam[sel]


def mono_detection_from_mask(mask: np.ndarray, invK: np.ndarray,
                             feats_xy=None, erode: int = 2,
                             n_bg: int = 200, rng=None):
    """Assemble a monocular detection from a 2D instance mask
    (reference `Tracking::GetObjectDetectionsMono`, Tracking_util.cc:163-208:
    mask erosion, keypoints-in-mask, background-pixel rays).

    Returns a MonoDetection (keypoint indices in mask, bg rays, is_good);
    the pose is seeded downstream from the PCA cuboid of the owned map
    points (mono path).
    """
    m = np.asarray(mask, bool)
    if erode > 0:
        from scipy.ndimage import binary_erosion

        m = binary_erosion(m, iterations=erode)
    ys, xs = np.nonzero(m)
    if len(xs) == 0:
        return MonoDetection(np.zeros(0, np.int64),
                             np.zeros((0, 3), np.float32), False)
    # background pixels come from an inflated bbox around the mask (the
    # detector's 2D box in the reference is larger than the instance mask)
    h_img, w_img = m.shape
    bw, bh = xs.max() - xs.min(), ys.max() - ys.min()
    mx, my = max(int(0.2 * bw), 4), max(int(0.2 * bh), 4)
    bbox = (max(xs.min() - mx, 0), max(ys.min() - my, 0),
            min(xs.max() + 1 + mx, w_img), min(ys.max() + 1 + my, h_img))
    bg = sample_background_rays(bbox, m, invK, n_bg=n_bg, rng=rng)

    kp_in = np.zeros(0, np.int64)
    if feats_xy is not None:
        pix = np.round(np.asarray(feats_xy)).astype(int)
        ok = (
            (pix[:, 0] >= 0) & (pix[:, 0] < m.shape[1])
            & (pix[:, 1] >= 0) & (pix[:, 1] < m.shape[0])
        )
        inside = np.zeros(len(pix), bool)
        inside[ok] = m[pix[ok, 1], pix[ok, 0]]
        kp_in = np.nonzero(inside)[0]
    return MonoDetection(kp_in, bg, len(kp_in) >= 20)


def sample_background_rays(bbox, mask, invK, n_bg: int = 200, rng=None):
    """Sample non-object pixels inside the 2D box and lift to rays
    (reference `pixels_sampler` `kitti_sequence.py:70-92`)."""
    rng = rng or np.random.default_rng(0)
    x0, y0, x1, y1 = [int(v) for v in bbox]
    ys, xs = np.mgrid[y0:y1, x0:x1]
    m = mask[y0:y1, x0:x1] if mask is not None else np.zeros_like(xs, bool)
    bg = ~m.astype(bool)
    pix = np.stack([xs[bg], ys[bg]], -1)
    if len(pix) > n_bg:
        pix = pix[rng.choice(len(pix), n_bg, replace=False)]
    hom = np.concatenate([pix, np.ones((len(pix), 1))], -1)
    return (hom @ invK.T).astype(np.float32)
