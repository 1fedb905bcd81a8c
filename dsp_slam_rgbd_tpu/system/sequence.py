"""Dataset sequence loaders: KITTI stereo+LiDAR, mono, Redwood RGB-D.

Covers `reconstruct/kitti_sequence.py` (calib parsing :240-254, frame
loading, detection assembly :99-216), `reconstruct/mono_sequence.py` and
the RGB-D association convention.  Detections default to **offline labels**
(the reference's `detect_online: false` `.lbl` fixture mode,
`README.md:171-177`) stored as npz per frame — deterministic and decoupled
from any detector checkpoints; online mmdet-style detectors are out of
parity scope (SURVEY.md §7 step 9) and can be plugged via `detector_fn`.
"""
from __future__ import annotations

import os
from typing import Callable, Optional

import numpy as np

from dsp_slam_rgbd_tpu.system.detections import ObjectDetection, make_detection


def load_gray(path: str) -> np.ndarray:
    from PIL import Image

    # keep uint8: host→device image transfers ship 1 byte/px (the tracker
    # casts to f32 on device — Tracker._upload_image)
    return np.asarray(Image.open(path).convert("L"), np.uint8)


def load_depth_png(path: str, scale: float = 1.0 / 5000.0) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path), np.float32) * scale


class KittiSequence:
    """KITTI odometry layout: image_2/, image_3/, velodyne/, calib.txt."""

    def __init__(self, root: str, labels_dir: Optional[str] = None,
                 detector_fn: Optional[Callable] = None):
        self.root = root
        self.left = sorted(os.listdir(os.path.join(root, "image_2"))) \
            if os.path.isdir(os.path.join(root, "image_2")) else []
        self.labels_dir = labels_dir
        self.detector_fn = detector_fn
        calib_path = os.path.join(root, "calib.txt")
        if os.path.isfile(calib_path):
            self.P2, self.T_cam_velo = self._parse_calib(calib_path)
        else:
            self.P2, self.T_cam_velo = None, np.eye(4, dtype=np.float32)

    @staticmethod
    def _parse_calib(path: str):
        """P2 projection + Tr (velo→cam0) -> T_cam_velo (reference
        `kitti_sequence.py:240-254`)."""
        vals = {}
        for line in open(path):
            if ":" not in line:
                continue
            k, v = line.split(":", 1)
            vals[k.strip()] = np.fromstring(v, sep=" ")
        P2 = vals["P2"].reshape(3, 4).astype(np.float32)
        T = np.eye(4, dtype=np.float32)
        if "Tr" in vals:
            T[:3, :] = vals["Tr"].reshape(3, 4)
        # cam0→cam2 offset folds into T_cam_velo = T_cam2_cam0 · T_cam0_velo
        # (reference `kitti_sequence.py:250-254`: offset = +P2[0,3]/P2[0,0])
        offset = np.eye(4, dtype=np.float32)
        offset[0, 3] = P2[0, 3] / P2[0, 0]
        return P2, (offset @ T).astype(np.float32)

    def __len__(self):
        return len(self.left)

    def frame(self, i: int):
        name = self.left[i]
        img_l = load_gray(os.path.join(self.root, "image_2", name))
        img_r = load_gray(os.path.join(self.root, "image_3", name))
        return img_l, img_r

    def velodyne_cam(self, i: int) -> np.ndarray:
        """LiDAR points in the camera frame (native reader: float32 x,y,z,r
        .bin — uses the C++ loader when built, numpy otherwise)."""
        name = os.path.splitext(self.left[i])[0] + ".bin"
        path = os.path.join(self.root, "velodyne", name)
        try:
            from dsp_slam_rgbd_tpu.native import runtime as native_rt

            pts = native_rt.read_velodyne(path)
        except Exception:
            pts = np.fromfile(path, np.float32).reshape(-1, 4)[:, :3]
        return pts @ self.T_cam_velo[:3, :3].T + self.T_cam_velo[:3, 3]

    def detections(self, i: int) -> list[ObjectDetection]:
        if self.labels_dir is not None:
            base = os.path.splitext(self.left[i])[0]
            raw = os.path.join(self.labels_dir, base + "_raw.npz")
            if os.path.isfile(raw):
                return self.detections_from_raw(i, raw)
            return load_label_file(
                os.path.join(self.labels_dir, base + ".npz")
            )
        if self.detector_fn is not None:
            return self.detector_fn(self, i)
        return []

    def detections_from_raw(self, i: int, path: str):
        """Assemble detections in-framework from RAW detector outputs —
        3D boxes (PointPillars-style (N, 7) rows) + 2D instance masks —
        via projected-LiDAR mask voting + occlusion masks (the reference's
        online assembly, `kitti_sequence.py:99-216`).  The raw npz carries
        `boxes_3d`, `masks` (M, H, W) and `bboxes_2d` (M, 4)."""
        from dsp_slam_rgbd_tpu.system.detections import (
            assemble_kitti_detections)

        z = np.load(path)
        name = os.path.splitext(self.left[i])[0] + ".bin"
        velo = np.fromfile(os.path.join(self.root, "velodyne", name),
                           np.float32).reshape(-1, 4)[:, :3]
        K = self.P2[:3, :3]
        masks = z["masks"].astype(bool) if "masks" in z.files else \
            np.zeros((0, 1, 1), bool)
        img_hw = masks.shape[1:] if len(masks) else (376, 1241)
        bboxes = z["bboxes_2d"] if "bboxes_2d" in z.files else \
            np.zeros((len(masks), 4))
        dets, _ = assemble_kitti_detections(
            K, np.linalg.inv(K), self.T_cam_velo, velo,
            z["boxes_3d"].astype(np.float32), masks, bboxes, img_hw,
        )
        return dets


class RgbdSequence:
    """Redwood-style layout: rgb/, depth/ (+ optional association file)."""

    def __init__(self, root: str, depth_scale: float = 1.0 / 1000.0,
                 labels_dir: Optional[str] = None):
        self.root = root
        self.rgb = sorted(os.listdir(os.path.join(root, "rgb"))) \
            if os.path.isdir(os.path.join(root, "rgb")) else []
        self.depth = sorted(os.listdir(os.path.join(root, "depth"))) \
            if os.path.isdir(os.path.join(root, "depth")) else []
        self.depth_scale = depth_scale
        self.labels_dir = labels_dir

    def __len__(self):
        return min(len(self.rgb), len(self.depth))

    def frame(self, i: int):
        img = load_gray(os.path.join(self.root, "rgb", self.rgb[i]))
        dep = load_depth_png(os.path.join(self.root, "depth", self.depth[i]),
                             self.depth_scale)
        return img, dep

    def detections(self, i: int) -> list[ObjectDetection]:
        if self.labels_dir is not None:
            name = os.path.splitext(self.rgb[i])[0] + ".npz"
            return load_label_file(os.path.join(self.labels_dir, name))
        return []


class MonoSequence:
    """Plain image-directory sequence (Freiburg cars / Redwood chairs)."""

    def __init__(self, root: str, labels_dir: Optional[str] = None):
        self.root = root
        self.images = sorted(
            f for f in os.listdir(root)
            if f.lower().endswith((".png", ".jpg", ".jpeg"))
        ) if os.path.isdir(root) else []
        self.labels_dir = labels_dir

    def __len__(self):
        return len(self.images)

    def frame(self, i: int):
        return load_gray(os.path.join(self.root, self.images[i]))

    def detections(self, i: int):
        if self.labels_dir is not None:
            base = os.path.splitext(self.images[i])[0]
            masks = os.path.join(self.labels_dir, base + "_masks.npz")
            if os.path.isfile(masks):
                # mask-only labels: the reference mono path
                # (`mono_sequence.py:95-107`) — the system assembles
                # MonoDetections from these at keyframe time
                return load_mask_labels(masks)
            return load_label_file(os.path.join(self.labels_dir,
                                                base + ".npz"))
        return []


# ---------------------------------------------------------------------------
# offline label fixtures (npz): the `.lbl` idea in a numpy-native format
# ---------------------------------------------------------------------------

def save_label_file(path: str, dets: list[ObjectDetection]):
    flat = {"n": np.asarray(len(dets))}
    for i, d in enumerate(dets):
        for f in ObjectDetection._fields:
            flat[f"{i}_{f}"] = np.asarray(getattr(d, f))
    np.savez_compressed(path, **flat)


def save_mask_labels(path: str, masks) -> None:
    """Persist per-frame instance masks ((M, H, W) bool) — the mono
    offline-label fixture format."""
    np.savez_compressed(path, masks=np.asarray(masks, bool))


def load_mask_labels(path: str) -> list:
    from dsp_slam_rgbd_tpu.system.detections import MaskLabel

    if not os.path.isfile(path):
        return []
    z = np.load(path)
    return [MaskLabel(m) for m in z["masks"].astype(bool)]


def load_label_file(path: str) -> list[ObjectDetection]:
    if not os.path.isfile(path):
        return []
    z = np.load(path)
    out = []
    for i in range(int(z["n"])):
        out.append(ObjectDetection(
            **{f: z[f"{i}_{f}"] for f in ObjectDetection._fields}
        ))
    return out


def get_sequence(seq_dir: str, cfg) -> object:
    """Dispatch by data layout (reference `reconstruct/__init__.py:16`)."""
    if os.path.isdir(os.path.join(seq_dir, "image_2")):
        return KittiSequence(seq_dir)
    if os.path.isdir(os.path.join(seq_dir, "rgb")):
        return RgbdSequence(seq_dir)
    return MonoSequence(seq_dir)
