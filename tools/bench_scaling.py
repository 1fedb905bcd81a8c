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


def run_multiprocess(args):
    """Parent: spawn N jax.distributed CPU processes (4 virtual devices
    each) running this same script in --worker-rank mode; rank 0 prints the
    scaling row.  This is the DCN tier of SURVEY §2.4 in simulation — the
    identical code path runs across real hosts."""
    import subprocess

    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--worker-rank", str(r), "--processes", str(args.processes),
             "--port", str(args.port),
             "--batch-per-device", str(args.batch_per_device),
             "--reps", str(args.reps)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for r in range(args.processes)
    ]
    rc = 0
    for r, p in enumerate(procs):
        out, _ = p.communicate(timeout=1200)
        rc |= p.returncode
        for line in out.splitlines():
            if line.startswith("{"):
                print(line)
    sys.exit(rc)


def run_worker(args):
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from dsp_slam_rgbd_tpu.models import deepsdf
    from dsp_slam_rgbd_tpu.parallel import distributed as dist
    from dsp_slam_rgbd_tpu.parallel import sharded_recon
    from dsp_slam_rgbd_tpu.recon.optimizer import ReconConfig

    dist.initialize(f"localhost:{args.port}", args.processes,
                    args.worker_rank)
    n_dev = len(jax.devices())
    spec = deepsdf.DecoderSpec()
    params = jax.tree_util.tree_map(
        np.asarray, deepsdf.init_params(spec, jax.random.PRNGKey(0)))
    # LIGHT budget: the multiprocess mode simulates the DCN tier on CPU
    # where the full KITTI budget (1.08 TFLOP/object) takes ~minutes per
    # rep — this row measures cross-process SCALING, not absolute
    # throughput (the TPU path above measures that)
    cfg = ReconConfig(num_iterations=2, num_depth_samples=10,
                      max_grad_points=256, max_valid_samples=1024)
    rng = np.random.default_rng(0)
    N_PTS, N_RAYS = 128, 128
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = [0, 0, 8.0]
    B = args.batch_per_device * n_dev
    pts = (rng.standard_normal((B, N_PTS, 3)) * 0.5 + [0, 0, 8.0]
           ).astype(np.float32)
    rays = (rng.standard_normal((B, N_RAYS, 3)) * 0.04 + [0, 0, 1.0]
            ).astype(np.float32)
    rays /= np.linalg.norm(rays, axis=2, keepdims=True)
    host = {
        "t_cam_obj": np.stack([T] * B), "pts": pts,
        "pts_mask": np.ones((B, N_PTS), bool), "rays": rays,
        "ray_mask": np.ones((B, N_RAYS), bool),
        "depth_obs": np.full((B, N_RAYS), 8.0, np.float32),
        "fg_mask": np.ones((B, N_RAYS), bool),
        "code_init": np.zeros((B, cfg.code_len), np.float32),
    }
    mesh = dist.global_mesh("obj")
    placed = {k: dist.shard_global(v, mesh) for k, v in host.items()}
    params_r = dist.replicate(params, mesh)

    out = sharded_recon._recon_batched(params_r, spec, cfg, placed)
    dist.fetch(out.t_cam_obj)  # warm + global barrier
    t0 = time.perf_counter()
    for _ in range(args.reps):
        out = sharded_recon._recon_batched(params_r, spec, cfg, placed)
    dist.fetch(out.t_cam_obj)
    dt = time.perf_counter() - t0
    rate = B * args.reps / dt
    if args.worker_rank == 0:
        print(json.dumps({
            "processes": args.processes, "devices": n_dev,
            "recon_per_s": round(rate, 2),
            "note": "virtual CPU devices share one host's FLOPs — "
                    "efficiency meaningful on real multi-host only",
        }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="force an 8-device virtual CPU mesh")
    ap.add_argument("--batch-per-device", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--processes", type=int, default=1,
                    help="run N jax.distributed processes (CPU simulation "
                         "of the multi-host tier)")
    ap.add_argument("--port", type=int, default=39311)
    ap.add_argument("--worker-rank", type=int, default=None)
    args = ap.parse_args()

    if args.worker_rank is not None:
        return run_worker(args)
    if args.processes > 1:
        return run_multiprocess(args)

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
