"""Per-frame tracking hot-path benchmark on real TPU hardware.

Measures the reference's per-frame envelope (SURVEY.md §6: 2x ORB extraction
at 2000 kp / 8 levels + stereo scanline match + 2x motion-only pose GN at
KITTI image size) as implemented by the TPU frontend.  The reference runs
this at ~10 FPS on an RTX 2080/3080 (`README.md:3`, timing printout
`dsp_slam.cc:109-118`).

Reports per-stage and whole-frame ms.  Like bench.py, executions are chained
through a value dependency and synced by a single fetch (block_until_ready
does not synchronize through the axon tunnel).
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from dsp_slam_rgbd_tpu.frontend import orb, stereo as stereo_mod
    from dsp_slam_rgbd_tpu.ops.camera import Intrinsics
    from dsp_slam_rgbd_tpu.solvers import pose_gn

    H, W = 376, 1241  # KITTI odometry image size
    cfg = orb.OrbConfig()  # 2000 features, 8 levels (configs/KITTI00-02.yaml)
    bf = 386.1448
    cam = Intrinsics(fx=718.856, fy=718.856, cx=607.19, cy=185.22, bf=bf)

    rng = np.random.default_rng(0)
    base = rng.standard_normal((H, W)).astype(np.float32)
    # textured synthetic image pair (content does not affect timing: all
    # shapes are static)
    img_l = jnp.asarray(np.abs(base) * 80.0 + 40.0)
    img_r = jnp.asarray(np.roll(np.abs(base) * 80.0 + 40.0, 8, axis=1))

    n_pts = 1200  # typical tracked-point count per frame
    pts_w = jnp.asarray(rng.standard_normal((n_pts, 3)) * 5 + [0, 0, 15],
                        dtype=jnp.float32)
    obs = jnp.asarray(rng.uniform(0, 1, (n_pts, 3)) * [W, H, W],
                      dtype=jnp.float32)
    inv_s2 = jnp.ones(n_pts)
    valid = jnp.ones(n_pts, bool)

    @jax.jit
    def frame_step(img_l, img_r, t0):
        fl = orb.extract(img_l, cfg)
        fr = orb.extract(img_r, cfg)
        sm = stereo_mod.match_stereo(fl, fr, img_l, img_r, bf,
                                     min_z=bf / cam.fx)
        res = pose_gn.optimize_pose(cam, t0, pts_w, obs, inv_s2, valid,
                                    stereo=True)
        t1 = res.t_cw
        # 2nd pose opt (TrackLocalMap does it again, Tracking.cc:1012)
        res2 = pose_gn.optimize_pose(cam, t1, pts_w, obs, inv_s2, valid,
                                     stereo=True)
        t2 = res2.t_cw
        # fold a frontend value in so nothing is dead-code eliminated
        chk = (jnp.sum(fl.desc[:, 0]) + jnp.sum(fr.desc[:, 0])).astype(
            jnp.float32) * 1e-12 + jnp.sum(sm.u_right) * 1e-12
        return t2 + jnp.full((4, 4), chk, jnp.float32) * 0.0

    t = jnp.eye(4)
    t = frame_step(img_l, img_r, t)
    np.asarray(t)  # warmup + compile

    n_rep = 30
    t = jnp.eye(4)
    t0 = time.perf_counter()
    for _ in range(n_rep):
        t = frame_step(img_l, img_r, t)
    np.asarray(t)
    dt = (time.perf_counter() - t0) / n_rep

    fps = 1.0 / dt
    print(json.dumps({
        "metric": "kitti_frame_tracking_fps",
        "value": round(fps, 2),
        "unit": "frames/s",
        "per_frame_ms": round(dt * 1e3, 2),
        "vs_baseline": round(fps / 10.0, 3),
    }))


if __name__ == "__main__":
    main()
