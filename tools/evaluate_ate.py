#!/usr/bin/env python3
"""ATE-RMSE evaluation between two trajectories (TUM or KITTI format).

The reference repo has no evaluation tooling (SURVEY.md §6); this closes
the loop for trajectory parity: Sim(3)- or SE(3)-aligns the estimate to
ground truth and reports RMSE/mean/median absolute errors.

Usage:
  python tools/evaluate_ate.py <est> <gt> [--format tum|kitti] [--scale]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def load_traj(path: str, fmt: str) -> np.ndarray:
    data = np.loadtxt(path, ndmin=2)
    if fmt == "tum":
        return data[:, 1:4]  # tx ty tz
    return data[:, [3, 7, 11]]  # KITTI 3x4 rows -> translation column


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("est")
    ap.add_argument("gt")
    ap.add_argument("--format", default="kitti", choices=["tum", "kitti"])
    ap.add_argument("--scale", action="store_true",
                    help="allow Sim(3) scale in alignment (mono)")
    args = ap.parse_args()

    import jax.numpy as jnp

    from dsp_slam_rgbd_tpu.ops import lie
    from dsp_slam_rgbd_tpu.solvers import sim3

    est = load_traj(args.est, args.format)
    gt = load_traj(args.gt, args.format)
    n = min(len(est), len(gt))
    est, gt = est[:n], gt[:n]

    T, ate = sim3.align_trajectories(
        jnp.asarray(est, jnp.float32), jnp.asarray(gt, jnp.float32),
        fix_scale=not args.scale,
    )
    aligned = np.asarray(lie.transform_points(T, jnp.asarray(est,
                                                             jnp.float32)))
    err = np.linalg.norm(aligned - gt, axis=1)
    print(f"compared poses: {n}")
    print(f"ate_rmse: {float(ate):.4f} m")
    print(f"mean: {err.mean():.4f} m  median: {np.median(err):.4f} m  "
          f"max: {err.max():.4f} m")
    if args.scale:
        print(f"alignment scale: {float(lie.sim3_scale(T)):.4f}")


if __name__ == "__main__":
    main()
