#!/usr/bin/env python3
"""Convert the reference's offline detection fixtures to our npz format.

The reference's `detect_online: false` mode reads torch-saved `.lbl` files
(`kitti_sequence.py:106-107,163-165`: a dict/tensor of 3D boxes per frame)
plus Mask-RCNN label files.  This tool converts a directory of them into
the npz ObjectDetection fixtures consumed by `system/sequence.py`, so the
reference's exact detection inputs drive our pipeline (deterministic A/B).

Usage:
  python tools/convert_reference_labels.py <lbl_dir> <out_dir> \
      --calib calib.txt [--velodyne velo_dir]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def boxes_to_detections(boxes: np.ndarray, velo_cam=None):
    """KITTI-style 3D boxes (N, 7): x, y, z, l, h, w (or w, h, l), yaw in
    camera coords -> ObjectDetection list (pose + cropped LiDAR surface
    points), replicating `kitti_sequence.py:118-146`'s box→T_co with
    scale = l and LiDAR crop."""
    from dsp_slam_rgbd_tpu.system.detections import (
        crop_lidar_to_box,
        make_detection,
    )

    dets = []
    for b in np.atleast_2d(boxes):
        if len(b) < 7:
            continue
        x, y, z, l, h, w, yaw = b[:7]
        c, s = np.cos(yaw), np.sin(yaw)
        R = np.asarray([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        t_co = np.eye(4, dtype=np.float32)
        scale = float(l) / 2.0
        t_co[:3, :3] = R * scale
        t_co[:3, 3] = [x, y - h / 2.0, z]  # box bottom-center -> centroid
        pts = None
        if velo_cam is not None:
            t_se3 = t_co.copy()
            t_se3[:3, :3] = R
            pts = crop_lidar_to_box(velo_cam, t_se3,
                                    np.asarray([w, h, l], np.float32))
        dets.append(make_detection(t_co, pts=pts))
    return dets


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("lbl_dir")
    ap.add_argument("out_dir")
    ap.add_argument("--velodyne", default=None)
    args = ap.parse_args()

    import torch

    from dsp_slam_rgbd_tpu.system.sequence import save_label_file

    os.makedirs(args.out_dir, exist_ok=True)
    for name in sorted(os.listdir(args.lbl_dir)):
        if not name.endswith(".lbl"):
            continue
        stem = os.path.splitext(name)[0]
        data = torch.load(os.path.join(args.lbl_dir, name),
                          map_location="cpu", weights_only=False)
        boxes = np.asarray(data["boxes"] if isinstance(data, dict) else data)
        velo = None
        if args.velodyne:
            bin_path = os.path.join(args.velodyne, stem + ".bin")
            if os.path.isfile(bin_path):
                velo = np.fromfile(bin_path, np.float32).reshape(-1, 4)[:, :3]
        dets = boxes_to_detections(boxes, velo)
        save_label_file(os.path.join(args.out_dir, stem + ".npz"), dets)
        print(f"{stem}: {len(dets)} detections")


if __name__ == "__main__":
    main()
