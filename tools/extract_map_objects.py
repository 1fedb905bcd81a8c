#!/usr/bin/env python3
"""Regenerate object meshes from a saved map (reference
`extract_map_objects.py`: MapObjects.txt -> per-object .ply + pose .npy —
the shape code IS the checkpoint format for objects, SURVEY.md §5).

Usage:
  python tools/extract_map_objects.py <map_dir> <deepsdf.npz> [--voxels 64]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("map_dir")
    ap.add_argument("deepsdf")
    ap.add_argument("--voxels", type=int, default=64)
    args = ap.parse_args()

    from dsp_slam_rgbd_tpu.models import deepsdf, mesh
    from dsp_slam_rgbd_tpu.system import io as io_mod

    params, spec = (deepsdf.load_npz(args.deepsdf)
                    if args.deepsdf.endswith(".npz")
                    else deepsdf.load_torch_checkpoint(args.deepsdf))
    ids, poses, codes = io_mod.load_map_objects(
        os.path.join(args.map_dir, "MapObjects.txt")
    )
    extractor = mesh.MeshExtractor(params, spec,
                                   code_len=spec.latent_size,
                                   voxels_dim=args.voxels)
    out_dir = os.path.join(args.map_dir, "meshes")
    os.makedirs(out_dir, exist_ok=True)
    for oid, T, code in zip(ids, poses, codes):
        m = extractor.extract_mesh_from_code(code)
        mesh.write_ply(os.path.join(out_dir, f"{oid}.ply"),
                       m["vertices"], m["faces"])
        np.save(os.path.join(out_dir, f"{oid}.npy"), T)
        print(f"object {oid}: {len(m['vertices'])} verts, "
              f"{len(m['faces'])} faces")


if __name__ == "__main__":
    main()
