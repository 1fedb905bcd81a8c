#!/usr/bin/env python3
"""Scaling-efficiency harness: batched multi-sequence object reconstruction
sharded over an (obj, ray) device mesh (BASELINE.md: report throughput and
scaling efficiency at 1 chip / N devices).

On the build machine only one TPU chip exists; pass --cpu to validate the
multi-device SPMD program on a virtual CPU mesh (the same program that runs
on a pod slice).  NOTE: virtual CPU devices share one host's FLOPs, so the
efficiency column is only meaningful on real multi-chip hardware.

Prints one JSON line per mesh size:
  {"devices": n, "recon_per_s": r, "sdf_queries_per_s": q, "efficiency": e}
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="force an 8-device virtual CPU mesh")
    ap.add_argument("--batch-per-device", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    if args.cpu:
        os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
            " --xla_force_host_platform_device_count=8"
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

    import jax.numpy as jnp
    import numpy as np

    from dsp_slam_rgbd_tpu.models import deepsdf
    from dsp_slam_rgbd_tpu.parallel import mesh as meshmod
    from dsp_slam_rgbd_tpu.parallel import sharded_recon
    from dsp_slam_rgbd_tpu.recon.optimizer import ReconConfig

    spec = deepsdf.DecoderSpec()
    params = deepsdf.init_params(spec, jax.random.PRNGKey(0))
    cfg = ReconConfig()

    n_dev = len(jax.devices())
    sizes = sorted({1, 2, n_dev} & set(range(1, n_dev + 1))) \
        if n_dev > 1 else [1]

    rng = np.random.default_rng(0)
    N_PTS, N_RAYS = 256, 512
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = [0, 0, 8.0]

    def make_batch(B):
        pts = (rng.standard_normal((B, N_PTS, 3)) * 0.5 + [0, 0, 8.0]
               ).astype(np.float32)
        rays = (rng.standard_normal((B, N_RAYS, 3)) * 0.04 + [0, 0, 1.0]
                ).astype(np.float32)
        rays /= np.linalg.norm(rays, axis=2, keepdims=True)
        return {
            "t_cam_obj": jnp.asarray(np.stack([T] * B)),
            "pts": jnp.asarray(pts),
            "pts_mask": jnp.ones((B, N_PTS), bool),
            "rays": jnp.asarray(rays),
            "ray_mask": jnp.ones((B, N_RAYS), bool),
            "depth_obs": jnp.full((B, N_RAYS), 8.0, dtype=jnp.float32),
            "fg_mask": jnp.ones((B, N_RAYS), bool),
            "code_init": jnp.zeros((B, cfg.code_len)),
        }

    base_rate = None
    for nd in sizes:
        B = args.batch_per_device * nd
        batch = make_batch(B)
        m = meshmod.make_mesh(n_obj=nd, n_ray=1,
                              devices=jax.devices()[:nd])
        out = sharded_recon.reconstruct_sharded(params, spec, cfg, batch, m)
        np.asarray(out.t_cam_obj)  # warm + fetch (axon sync quirk)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = sharded_recon.reconstruct_sharded(params, spec, cfg,
                                                    batch, m)
        np.asarray(out.t_cam_obj)
        dt = time.perf_counter() - t0
        rate = B * args.reps / dt
        # SDF queries per recon: per iteration ≈ valid-capped render samples
        # + grad points + surface points
        q_per = cfg.num_iterations * (
            min(N_RAYS * cfg.num_depth_samples, cfg.max_valid_samples)
            + cfg.max_grad_points + N_PTS
        )
        if base_rate is None:
            base_rate = rate / nd
        print(json.dumps({
            "devices": nd,
            "recon_per_s": round(rate, 2),
            "sdf_queries_per_s": round(rate * q_per, 0),
            "efficiency": round(rate / (base_rate * nd), 3),
        }))


if __name__ == "__main__":
    main()
