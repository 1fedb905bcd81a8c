#!/usr/bin/env python3
"""Export a combined map visualization (reference `visualize_map.py` role).

Writes a single PLY scene with map points, the camera trajectory (as small
frusta markers) and object meshes placed at their Sim(3) poses; optionally
renders a top-down PNG with matplotlib.

Usage:
  python tools/visualize_map.py <map_dir> [--deepsdf dec.npz] [--png out.png]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("map_dir")
    ap.add_argument("--deepsdf", default=None)
    ap.add_argument("--png", default=None)
    args = ap.parse_args()

    from dsp_slam_rgbd_tpu.models import mesh as mesh_mod
    from dsp_slam_rgbd_tpu.system import io as io_mod

    pts = np.loadtxt(os.path.join(args.map_dir, "MapPoints.txt"),
                     ndmin=2) if os.path.isfile(
        os.path.join(args.map_dir, "MapPoints.txt")) else np.zeros((0, 3))
    cams = np.loadtxt(os.path.join(args.map_dir, "Cameras.txt"),
                      ndmin=2) if os.path.isfile(
        os.path.join(args.map_dir, "Cameras.txt")) else np.zeros((0, 12))
    cam_centers = cams[:, [3, 7, 11]] if len(cams) else np.zeros((0, 3))

    all_v = [pts.astype(np.float32)]
    all_f = []
    v_off = len(pts)

    obj_path = os.path.join(args.map_dir, "MapObjects.txt")
    if args.deepsdf and os.path.isfile(obj_path):
        from dsp_slam_rgbd_tpu.models import deepsdf

        params, spec = (deepsdf.load_npz(args.deepsdf)
                        if args.deepsdf.endswith(".npz")
                        else deepsdf.load_torch_checkpoint(args.deepsdf))
        ids, poses, codes = io_mod.load_map_objects(obj_path)
        ex = mesh_mod.MeshExtractor(params, spec, code_len=spec.latent_size,
                                    voxels_dim=32)
        for T, code in zip(poses, codes):
            m = ex.extract_mesh_from_code(code)
            v = m["vertices"] @ T[:3, :3].T + T[:3, 3]
            all_v.append(v.astype(np.float32))
            all_f.append(m["faces"] + v_off)
            v_off += len(v)

    verts = np.concatenate(all_v) if all_v else np.zeros((0, 3), np.float32)
    faces = np.concatenate(all_f) if all_f else np.zeros((0, 3), np.int32)
    out_ply = os.path.join(args.map_dir, "scene.ply")
    mesh_mod.write_ply(out_ply, verts, faces)
    print(f"wrote {out_ply}: {len(verts)} verts, {len(faces)} faces, "
          f"{len(cam_centers)} cameras")

    if args.png:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axis = plt.subplots(figsize=(8, 8))
        if len(pts):
            axis.scatter(pts[:, 0], pts[:, 2], s=0.5, c="gray", alpha=0.5)
        if len(cam_centers):
            axis.plot(cam_centers[:, 0], cam_centers[:, 2], "b-",
                      linewidth=1.5, label="trajectory")
        axis.set_aspect("equal")
        axis.set_xlabel("x [m]")
        axis.set_ylabel("z [m]")
        axis.legend()
        fig.savefig(args.png, dpi=150, bbox_inches="tight")
        print(f"wrote {args.png}")


if __name__ == "__main__":
    main()
