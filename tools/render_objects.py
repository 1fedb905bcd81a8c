#!/usr/bin/env python3
"""Render per-object depth images from a saved map.

The offline role of the reference's ObjectRenderer/ObjectDrawer
(`include/Renderer.hpp:24-80`): for each object in a map checkpoint or
MapObjects.txt-style export, ray-render the fitted SDF to a depth PNG —
both a visualization and a render-loss diagnostic.

Usage:
  python tools/render_objects.py MAP_DIR OUT_DIR --decoder weights.pth \
      [--fx 718.856 --fy 718.856 --cx 607.19 --cy 185.22 --size 376 1241]

MAP_DIR: a directory with state.npz (utils.checkpoint.save_state) or the
save_entire_map layout (MapObjects.txt).
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("map_dir")
    ap.add_argument("out_dir")
    ap.add_argument("--decoder", default=None,
                    help="torch DeepSDF checkpoint (reference format)")
    ap.add_argument("--fx", type=float, default=718.856)
    ap.add_argument("--fy", type=float, default=718.856)
    ap.add_argument("--cx", type=float, default=607.19)
    ap.add_argument("--cy", type=float, default=185.22)
    ap.add_argument("--size", type=int, nargs=2, default=(376, 1241))
    ap.add_argument("--stride", type=int, default=2)
    ap.add_argument("--standoff", type=float, default=2.5,
                    help="camera distance in object radii for the "
                         "per-object canonical view")
    args = ap.parse_args()

    import jax.numpy as jnp

    from dsp_slam_rgbd_tpu.models import deepsdf
    from dsp_slam_rgbd_tpu.system.renderer import render_object_depth
    from dsp_slam_rgbd_tpu.utils import checkpoint as ckpt

    if args.decoder:
        params, spec = deepsdf.load_torch_checkpoint(args.decoder)
    else:
        spec = deepsdf.DecoderSpec()
        import jax
        params = deepsdf.init_params(spec, jax.random.PRNGKey(0))
        print("WARNING: no --decoder given, rendering with random weights")

    state_path = os.path.join(args.map_dir, "state.npz")
    if os.path.isfile(state_path):
        state, _ = ckpt.load_state(state_path)
        poses = np.asarray(state.obj_pose)
        scales = np.asarray(state.obj_scale)
        codes = np.asarray(state.obj_code)
        valid = np.asarray(state.obj_valid)
    else:
        rows = np.loadtxt(os.path.join(args.map_dir, "MapObjects.txt"))
        rows = np.atleast_2d(rows)
        n = rows.shape[0]
        poses = rows[:, :16].reshape(n, 4, 4)
        scales = np.cbrt(np.abs(np.linalg.det(poses[:, :3, :3])))
        poses[:, :3, :3] /= scales[:, None, None]
        codes = rows[:, 16:]
        valid = np.ones(n, bool)

    os.makedirs(args.out_dir, exist_ok=True)
    K = np.array([[args.fx, 0, args.cx], [0, args.fy, args.cy],
                  [0, 0, 1]], np.float32)
    H, W = args.size
    for o in np.nonzero(valid)[0]:
        # canonical view: camera on the object's -z axis at standoff radii
        t_co = np.eye(4, dtype=np.float32)
        t_co[:3, :3] = np.eye(3) * scales[o]
        t_co[2, 3] = args.standoff * scales[o]
        d, h = render_object_depth(params, spec, jnp.asarray(codes[o]),
                                   jnp.asarray(t_co), jnp.asarray(K),
                                   (H, W), stride=args.stride)
        d = np.asarray(d)
        h = np.asarray(h)
        img = np.zeros_like(d)
        if h.any():
            dmin, dmax = d[h].min(), d[h].max() + 1e-6
            img[h] = 55 + 200 * (1.0 - (d[h] - dmin) / (dmax - dmin))
        from PIL import Image

        Image.fromarray(img.astype(np.uint8)).save(
            os.path.join(args.out_dir, f"object_{o:03d}_depth.png"))
        np.save(os.path.join(args.out_dir, f"object_{o:03d}_depth.npy"), d)
        print(f"object {o}: hit {int(h.sum())} px -> "
              f"object_{o:03d}_depth.png")


if __name__ == "__main__":
    main()
