"""Trajectory / map writers in the reference's exact text formats.

Byte-format parity with `src/System_util.cc:109-149` (SaveEntireMap:
MapPoints.txt / MapObjects.txt / Cameras.txt) and `src/System.cc:380-525`
(SaveTrajectoryTUM / SaveTrajectoryKITTI) so downstream tooling
(`extract_map_objects.py`, `visualize_map.py`, TUM/KITTI evaluation
scripts) works unchanged against our output.
"""
from __future__ import annotations

import os

import numpy as np

from dsp_slam_rgbd_tpu.ops import lie


def save_trajectory_kitti(path: str, poses_cw: np.ndarray,
                          valid: np.ndarray | None = None):
    """KITTI format: one row per frame, 12 floats of T_wc (3x4)."""
    poses_cw = np.asarray(poses_cw)
    with open(path, "w") as f:
        for i, T in enumerate(poses_cw):
            if valid is not None and not valid[i]:
                continue
            Twc = np.asarray(lie.inv_se3(T))
            row = Twc[:3, :].reshape(-1)
            f.write(" ".join(f"{v:.9e}" for v in row) + "\n")


def save_trajectory_tum(path: str, poses_cw: np.ndarray,
                        timestamps: np.ndarray,
                        valid: np.ndarray | None = None):
    """TUM format: `timestamp tx ty tz qx qy qz qw` (camera-to-world)."""
    poses_cw = np.asarray(poses_cw)
    with open(path, "w") as f:
        for i, T in enumerate(poses_cw):
            if valid is not None and not valid[i]:
                continue
            Twc = np.asarray(lie.inv_se3(T))
            q = np.asarray(lie.rot_to_quat(Twc[:3, :3]))  # (w, x, y, z)
            t = Twc[:3, 3]
            f.write(
                f"{timestamps[i]:.6f} {t[0]:.7f} {t[1]:.7f} {t[2]:.7f} "
                f"{q[1]:.7f} {q[2]:.7f} {q[3]:.7f} {q[0]:.7f}\n"
            )


def save_entire_map(dirname: str, state, frame_poses_cw=None,
                    frame_valid=None):
    """MapPoints.txt (xyz rows), MapObjects.txt (id / 12-float Two(Sim3) /
    code row), Cameras.txt (KITTI rows of keyframe poses) — reference
    `SaveEntireMap` layout."""
    os.makedirs(dirname, exist_ok=True)
    pts = np.asarray(state.pt_pos)
    pt_ok = np.asarray(state.pt_valid)
    with open(os.path.join(dirname, "MapPoints.txt"), "w") as f:
        for p in pts[pt_ok]:
            f.write(f"{p[0]:.9f} {p[1]:.9f} {p[2]:.9f}\n")

    obj_ok = np.asarray(state.obj_valid) & ~np.asarray(state.obj_dynamic)
    poses = np.asarray(state.obj_pose)
    scales = np.asarray(state.obj_scale)
    codes = np.asarray(state.obj_code)
    with open(os.path.join(dirname, "MapObjects.txt"), "w") as f:
        for oid in np.nonzero(obj_ok)[0]:
            Two = poses[oid].copy()
            Two[:3, :3] *= scales[oid]  # Sim(3) pose as in GetPoseSim3
            f.write(f"{oid}\n")
            row = Two[:3, :].reshape(-1)
            f.write(" ".join(f"{v:.9f}" for v in row) + "\n")
            f.write(" ".join(f"{v:.9f}" for v in codes[oid]) + "\n")

    kf_poses = np.asarray(state.kf_pose)
    kf_ok = np.asarray(state.kf_valid)
    save_trajectory_kitti(os.path.join(dirname, "Cameras.txt"), kf_poses,
                          kf_ok)
    if frame_poses_cw is not None:
        save_trajectory_kitti(os.path.join(dirname, "FrameTrajectory.txt"),
                              frame_poses_cw, frame_valid)


def load_map_objects(path: str):
    """Parse MapObjects.txt back into (ids, Two(Sim3) (N,4,4), codes)."""
    ids, poses, codes = [], [], []
    lines = [ln.strip() for ln in open(path) if ln.strip()]
    i = 0
    while i + 2 < len(lines):  # need id + pose row + code row
        ids.append(int(lines[i]))
        vals = np.fromstring(lines[i + 1], sep=" ")
        T = np.eye(4, dtype=np.float32)
        T[:3, :] = vals.reshape(3, 4)
        poses.append(T)
        codes.append(np.fromstring(lines[i + 2], sep=" ").astype(np.float32))
        i += 3
    return (np.asarray(ids), np.stack(poses) if poses else np.zeros((0, 4, 4)),
            np.stack(codes) if codes else np.zeros((0, 0)))
