#!/usr/bin/env python3
"""Whole-pipeline FPS benchmark: tracking + keyframe stages interleaved.

The reference's end-to-end envelope is ~10 FPS for the full system —
per-frame ORB extraction + stereo match + 2x motion-only BA, plus
keyframe-rate map maintenance, object GN reconstruction and local joint BA
(`README.md:3`, `dsp_slam.cc:109-118`).  This harness runs OUR full system
loop (SLAMSystem.track_stereo with detections) on a synthetic KITTI-sized
tilted-plane stereo sequence with one object detection per keyframe, and
reports end-to-end FPS plus the tracking-only and keyframe-stage split.

Synthetic rendering happens up front (host) and is excluded from timing.
Run on the TPU build machine:  python tools/bench_pipeline.py
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

H, W = 376, 1241          # KITTI odometry image size
FX = 718.856
BASELINE = 0.537          # KITTI stereo baseline (m)
PLANE_Z = 18.0
PLANE_TILT = 0.3
STEP = 0.35               # per-frame forward motion


def render(texture, cam_x, tex_scale=40.0):
    from scipy.ndimage import map_coordinates

    u, v = np.meshgrid(np.arange(W), np.arange(H))
    dx = (u - W / 2) / FX
    dy = (v - H / 2) / FX
    t = (PLANE_Z + PLANE_TILT * cam_x) / (1.0 - PLANE_TILT * dx)
    X = cam_x + dx * t
    Y = dy * t
    tx = X * tex_scale / 10.0 + texture.shape[1] / 2
    ty = Y * tex_scale / 10.0 + texture.shape[0] / 2
    return map_coordinates(texture, [ty, tx], order=1, mode="wrap").astype(
        np.float32
    )


def _measure_rtt(n: int = 6) -> float:
    """Median dispatch+fetch round trip of a trivial program (ms) — the
    remote-TPU tunnel latency varies by epoch (observed 4-40 ms), and FPS
    numbers are only comparable across runs alongside the RTT they paid."""
    import jax.numpy as jnp

    x = jnp.zeros(4)
    np.asarray(x + 1.0)  # warm the program
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(x + 1.0)
        ts.append(time.perf_counter() - t0)
    return 1e3 * float(np.median(ts))


def run(frames: int = 36, warmup: int = 6, passes: int = 3,
        pipelined: bool = False) -> dict:
    """Run the whole-pipeline FPS benchmark; returns the result dict
    (callable from bench.py so the driver records pipeline_fps per round).

    The timed pass repeats `passes` times (fresh map each time) and the
    MEDIAN pass is reported, with the measured tunnel RTT alongside —
    single-pass numbers on this machine spread ~15% with the RTT epoch
    (VERDICT r4: builder 4.97 vs driver 3.56 on the same commit).
    """
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    from scipy.ndimage import gaussian_filter

    from dsp_slam_rgbd_tpu.config import (MapConfig, SystemConfig,
                                          TrackingConfig)
    from dsp_slam_rgbd_tpu.frontend.orb import OrbConfig
    from dsp_slam_rgbd_tpu.models import deepsdf
    from dsp_slam_rgbd_tpu.ops import camera as cam_ops
    from dsp_slam_rgbd_tpu.recon.optimizer import ReconConfig
    from dsp_slam_rgbd_tpu.system.detections import make_detection
    from dsp_slam_rgbd_tpu.system.slam import SLAMSystem

    cam = cam_ops.Intrinsics(fx=FX, fy=FX, cx=W / 2, cy=H / 2,
                             bf=FX * BASELINE)
    cfg = SystemConfig(
        sensor="stereo", cam=cam,
        orb=OrbConfig(),  # 2000 features, 8 levels (KITTI00-02.yaml)
        recon=ReconConfig.tpu_fast(),
        tracking=TrackingConfig(fps=10.0, th_depth=35.0,
                                max_frames_between_kf=5,
                                pipelined=pipelined),
        map=MapConfig(max_kf=48, max_feat=2048, max_pts=32768, max_obj=8,
                      max_oobs=256, local_window=8),
    )
    spec = deepsdf.DecoderSpec()
    params = deepsdf.init_params(spec, jax.random.PRNGKey(0))
    system = SLAMSystem(cfg, decoder_params=params, decoder_spec=spec)

    print("rendering synthetic sequence...", flush=True)
    rng = np.random.default_rng(0)
    texture = gaussian_filter(rng.uniform(0, 255, (4096, 4096)), 1.2).astype(
        np.float32)
    seq = []
    for i in range(frames):
        x = i * STEP
        # uint8, as real camera images are: uploads stay 1 byte/px through
        # the tunnel, the extractor casts to f32 on device
        seq.append((np.clip(render(texture, x), 0, 255).astype(np.uint8),
                    np.clip(render(texture, x + BASELINE), 0, 255)
                    .astype(np.uint8)))

    det_t_co_w = np.eye(4, dtype=np.float32)
    det_t_co_w[:3, 3] = [2.0, 0.5, 14.0]

    def dets_for(i):
        t_cw = np.eye(4, dtype=np.float32)
        t_cw[0, 3] = -i * STEP
        t_co = t_cw @ det_t_co_w
        d = rng.standard_normal((200, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        pts_cam = (d * 0.8) @ t_co[:3, :3].T + t_co[:3, 3]
        vis = pts_cam[pts_cam[:, 2] > 0][:128]
        depths = np.linalg.norm(vis, axis=1)
        rays = vis / depths[:, None]
        return [make_detection(t_co, pts=pts_cam, rays=rays, depth=depths,
                               n_fg=len(rays))]

    # warmup = one FULL pass over the sequence: a growing SLAM map walks the
    # BA capacity-bucket ladder, and each rung compiles once per process —
    # on a real (hours-long) sequence those compiles amortize to noise, but
    # in a 30-frame benchmark they dominate.  The timed pass measures the
    # steady state: same sequence, fresh map, every program already built.
    # Frames come from FramePrefetcher: upload + ORB extraction dispatched
    # one frame AHEAD on a worker thread, overlapping tracking's stats fetch.
    from dsp_slam_rgbd_tpu.system.prefetch import FramePrefetcher

    print("warmup pass (compiles all programs)...", flush=True)
    for i, frame in enumerate(FramePrefetcher(system.tracker, iter(seq),
                                              sensor="stereo", depth=2)):
        out = system.track_frame(frame, detections=dets_for(i))
    system.flush()
    np.asarray(system.state.kf_pose[0])  # drain the dispatch queue
    system.reset()

    results = []
    for p in range(max(passes, 1)):
        rtt = _measure_rtt()
        print(f"timed pass {p + 1}/{passes} (rtt {rtt:.1f} ms)...",
              flush=True)
        system.reset()
        t_frames = []
        t_pass0 = time.perf_counter()
        for i, frame in enumerate(FramePrefetcher(system.tracker, iter(seq),
                                                  sensor="stereo", depth=2)):
            t0 = time.perf_counter()
            out = system.track_frame(frame, detections=dets_for(i))
            # per-frame host sync: the tracker's own fused-stage stats
            # fetch (once tracking is initialized); force one otherwise
            if system.tracker._stage_stats is None:
                np.asarray(out["frame"].t_cw if out.get("frame") is not None
                           else system.state.kf_pose[0])
            dt = time.perf_counter() - t0
            t_frames.append((dt, out["new_kf"]))
        system.flush()  # adopt trailing async mapping jobs (counted)
        np.asarray(system.state.kf_pose[0])  # drain trailing device work
        # FPS from the WALL CLOCK of the whole pass: queue waits on the
        # prefetcher (if the upload thread ever falls behind) count too
        total = time.perf_counter() - t_pass0
        results.append((len(t_frames) / total, t_frames, rtt))

    results.sort(key=lambda r: r[0])
    fps, t_frames, rtt = results[len(results) // 2]  # median pass
    n = len(t_frames)
    kf_frames = [d for d, k in t_frames if k]
    tr_frames = [d for d, k in t_frames if not k]
    out = {
        "metric": "pipeline_fps",
        "value": round(fps, 2),
        "unit": "frames/s (KITTI-size stereo, full system loop)",
        "vs_baseline": round(fps / 10.0, 2),
        "frames": n,
        "keyframes": len(kf_frames),
        "track_only_ms": round(1e3 * float(np.median(tr_frames)), 1)
        if tr_frames else None,
        "kf_frame_ms": round(1e3 * float(np.median(kf_frames)), 1)
        if kf_frames else None,
        # attribution note: keyframe-stage device work runs on the async
        # mapping worker, so the track/kf per-frame split is approximate —
        # KF work drains into following frames' wall time.  The headline
        # FPS is exact wall clock of the median pass.
        "split_note": "per-frame split approximate (async KF worker)",
        "passes_fps": [round(r[0], 2) for r in results],
        "tunnel_rtt_ms": round(rtt, 1),
        "n_kf_total": system.n_kf,
        "objects": int(np.asarray(system.state.obj_valid).sum()),
    }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=36)
    ap.add_argument("--pipelined", action="store_true",
                    help="EXPERIMENTAL one-frame pipelined tracking "
                    "(TrackingConfig.pipelined)")
    ap.add_argument("--warmup", type=int, default=6)
    args = ap.parse_args()
    print(json.dumps(run(args.frames, args.warmup,
                         pipelined=args.pipelined)))


if __name__ == "__main__":
    main()
