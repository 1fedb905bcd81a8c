#!/usr/bin/env python3
"""Single-frame object reconstruction — the reference's de-facto smoke test
(`reconstruct_frame.py`, README.md:160-169): load one frame's detections,
run the joint shape+pose GN for each, export meshes.

Usage:
  python tools/reconstruct_frame.py <labels.npz> <deepsdf.npz> <out_dir> \
      [--iters 10]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("labels")
    ap.add_argument("deepsdf")
    ap.add_argument("out_dir")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax.numpy as jnp

    from dsp_slam_rgbd_tpu.models import deepsdf, mesh
    from dsp_slam_rgbd_tpu.recon.optimizer import ReconConfig, reconstruct_object
    from dsp_slam_rgbd_tpu.system import sequence as seq_mod

    params, spec = (deepsdf.load_npz(args.deepsdf)
                    if args.deepsdf.endswith(".npz")
                    else deepsdf.load_torch_checkpoint(args.deepsdf))
    dets = seq_mod.load_label_file(args.labels)
    cfg = ReconConfig(code_len=spec.latent_size, num_iterations=args.iters)
    os.makedirs(args.out_dir, exist_ok=True)
    extractor = mesh.MeshExtractor(params, spec, code_len=spec.latent_size)

    for i, det in enumerate(dets):
        t0 = time.perf_counter()
        t_init = np.asarray(det.t_co, np.float32).copy()
        t_init[:3, :3] *= det.scale
        res = reconstruct_object(
            params, spec, cfg, jnp.asarray(t_init),
            jnp.asarray(det.pts), jnp.asarray(det.pts_mask),
            jnp.asarray(det.rays), jnp.asarray(det.ray_mask),
            jnp.asarray(det.depth), jnp.asarray(det.fg_mask),
        )
        code = np.asarray(res.code)
        dt = time.perf_counter() - t0
        print(f"det {i}: good={bool(res.is_good)} loss={float(res.loss):.4f} "
              f"({dt:.3f} s)")  # "Reconstruction takes %f seconds" role
        if bool(res.is_good):
            m = extractor.extract_mesh_from_code(code)
            mesh.write_ply(os.path.join(args.out_dir, f"det{i}.ply"),
                           m["vertices"], m["faces"])
            np.save(os.path.join(args.out_dir, f"det{i}_pose.npy"),
                    np.asarray(res.t_cam_obj))
            np.save(os.path.join(args.out_dir, f"det{i}_code.npy"), code)


if __name__ == "__main__":
    main()
