#!/usr/bin/env python3
"""Run the SLAM system over a sequence directory (the `dsp_slam` /
`dsp_slam_mono` CLI role, reference `dsp_slam.cc:33`).

Usage:
  python tools/run_slam.py <sequence_dir> <out_dir> \
      [--sensor stereo|rgbd|mono] [--yaml cfg.yaml] [--json cfg.json] \
      [--labels labels_dir] [--deepsdf checkpoint.npz] [--max-frames N] \
      [--vocab vocab.npz] [--bootstrap-vocab N]

The vocabulary enables loop closing and BoW relocalization (the reference
takes it as its first CLI argument and loads it at boot, `dsp_slam.cc:33-53`
→ `System.cc:74-88`).  `--vocab` loads a trained npz; when the file does not
exist and `--bootstrap-vocab N` is given, a k-medians vocabulary is trained
on ORB descriptors from N frames sampled across the sequence and saved to
the `--vocab` path (there is no 100 MB ORBvoc.bin to ship).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _bootstrap_vocab(seq, cfg, sensor: str, n_frames: int,
                     branching: int = 10, depth: int = 3):
    """Train a k-medians vocabulary on ORB descriptors from `n_frames`
    frames sampled evenly across the sequence (the in-framework substitute
    for the reference's shipped ORBvoc.bin)."""
    import numpy as np
    import jax.numpy as jnp

    from dsp_slam_rgbd_tpu.frontend import orb
    from dsp_slam_rgbd_tpu.loop import vocabulary

    idxs = np.unique(np.linspace(0, len(seq) - 1,
                                 min(n_frames, len(seq))).astype(int))
    descs = []
    for i in idxs:
        fr = seq.frame(int(i))
        img = fr[0] if isinstance(fr, tuple) else fr
        f = orb.extract(jnp.asarray(img, jnp.float32), cfg.orb)
        descs.append(np.asarray(f.desc)[np.asarray(f.valid)])
    all_desc = np.concatenate(descs) if descs else np.zeros((0, 8), np.uint32)
    print(f"training vocabulary on {len(all_desc)} descriptors "
          f"from {len(idxs)} frames (branching={branching}, depth={depth}, "
          f"{branching**depth} words)")
    return vocabulary.train(all_desc, branching=branching, depth=depth)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sequence")
    ap.add_argument("out_dir")
    ap.add_argument("--sensor", default="stereo",
                    choices=["stereo", "rgbd", "mono"])
    ap.add_argument("--yaml", default=None)
    ap.add_argument("--json", default=None)
    ap.add_argument("--labels", default=None)
    ap.add_argument("--deepsdf", default=None,
                    help="decoder checkpoint (.npz native or torch exp dir)")
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--map-preset", default=None, choices=["kitti_large"],
                    help="map capacity preset (kitti_large: 2048 KFs / "
                    "300k pts for full KITTI odometry sequences)")
    ap.add_argument("--vocab", default=None,
                    help="ORB vocabulary npz (enables loop closing + BoW "
                         "relocalization)")
    ap.add_argument("--bootstrap-vocab", type=int, default=0, metavar="N",
                    help="if --vocab does not exist, train it on ORB "
                         "descriptors from N frames of this sequence")
    ap.add_argument("--vocab-branching", type=int, default=10,
                    help="vocabulary tree branching factor (bootstrap mode)")
    ap.add_argument("--vocab-depth", type=int, default=3,
                    help="vocabulary tree depth: words = branching**depth. "
                         "10^3 = 1k words suits short sequences; use "
                         "depth 4-5 (10k-100k words) at KITTI scale or BoW "
                         "scores saturate and retrieval aliases "
                         "(tests/test_vocab_scale.py)")
    ap.add_argument("--live-port", type=int, default=0, metavar="PORT",
                    help="serve a live top-down map view over HTTP (the "
                    "reference Viewer's role on a headless TPU host)")
    ap.add_argument("--viz-every", type=int, default=0, metavar="N",
                    help="write an incremental top-down map/trajectory PNG "
                         "+ annotated frame every N frames (the live-viewer "
                         "role of the reference Viewer/MapDrawer, offline)")
    ap.add_argument("--gt", default=None,
                    help="ground-truth trajectory (KITTI format) for the "
                         "ATE entry in summary.json")
    ap.add_argument("--distributed", action="store_true",
                    help="join a jax.distributed collective before running "
                         "(multi-host: sharded reconstruction spans every "
                         "process's devices)")
    ap.add_argument("--coordinator", default="localhost:9911")
    ap.add_argument("--num-processes", type=int, default=1)
    ap.add_argument("--process-id", type=int, default=0)
    args = ap.parse_args()

    if args.distributed:
        from dsp_slam_rgbd_tpu.parallel import distributed as dist_mod

        dist_mod.initialize(args.coordinator, args.num_processes,
                            args.process_id)

    from dsp_slam_rgbd_tpu import config as cfg_mod
    from dsp_slam_rgbd_tpu.models import deepsdf
    from dsp_slam_rgbd_tpu.system import sequence as seq_mod
    from dsp_slam_rgbd_tpu.system.slam import SLAMSystem

    if args.yaml:
        cfg = cfg_mod.from_reference_yaml_json(args.yaml, args.json,
                                               sensor=args.sensor)
    else:
        cfg = cfg_mod.SystemConfig(sensor=args.sensor)
    if args.map_preset == "kitti_large":
        cfg = cfg_mod.replace(cfg, map=cfg_mod.MapConfig.kitti_large())

    params = spec = None
    if args.deepsdf:
        if args.deepsdf.endswith(".npz"):
            params, spec = deepsdf.load_npz(args.deepsdf)
        else:
            params, spec = deepsdf.load_torch_checkpoint(args.deepsdf)

    seq = seq_mod.get_sequence(args.sequence, cfg)
    if len(seq) == 0:
        sys.exit(f"error: no frames found in sequence dir {args.sequence!r} "
                 "(expected image_2/ + image_3/, rgb/ + depth/, or images)")
    if args.labels:
        seq.labels_dir = args.labels

    vocab = None
    if args.vocab:
        from dsp_slam_rgbd_tpu.loop import vocabulary

        if os.path.isfile(args.vocab):
            vocab = vocabulary.load_npz(args.vocab)
            print(f"vocabulary loaded: {args.vocab} "
                  f"({vocab.n_words} words)")
        elif args.bootstrap_vocab > 0:
            vocab = _bootstrap_vocab(seq, cfg, args.sensor,
                                     args.bootstrap_vocab,
                                     branching=args.vocab_branching,
                                     depth=args.vocab_depth)
            vocabulary.save_npz(args.vocab, vocab)
            print(f"vocabulary trained + saved: {args.vocab} "
                  f"({vocab.n_words} words)")
        else:
            sys.exit(f"error: vocabulary file {args.vocab!r} not found "
                     "(pass --bootstrap-vocab N to train one)")

    system = SLAMSystem(cfg, decoder_params=params, decoder_spec=spec,
                        vocab=vocab)

    n = len(seq)
    if args.max_frames:
        n = min(n, args.max_frames)

    # disk read + host→device upload + ORB extraction all run on a
    # background thread, one frame ahead of tracking (the data-loader
    # stage: transfer AND extraction ride under the previous frame's
    # device compute / stats fetch — system/prefetch.FramePrefetcher)
    from dsp_slam_rgbd_tpu.system.prefetch import FramePrefetcher

    def frames():
        for i in range(n):
            f = seq.frame(i)
            yield f if isinstance(f, tuple) else (f,)

    os.makedirs(args.out_dir, exist_ok=True)
    if args.viz_every:
        os.makedirs(os.path.join(args.out_dir, "viz"), exist_ok=True)

    import numpy as np

    viewer = None
    if args.live_port:
        from dsp_slam_rgbd_tpu.system.live_viewer import LiveViewer

        viewer = LiveViewer(system, port=args.live_port)
        print(f"live map view: http://0.0.0.0:{viewer.port}/")

    times = []
    pf = FramePrefetcher(system.tracker, frames(), sensor=args.sensor,
                         fps=cfg.tracking.fps, depth=2)
    for i, frame in enumerate(pf):
        t0 = time.perf_counter()
        dets = seq.detections(i) or None
        out = system.track_frame(frame, detections=dets)
        times.append(time.perf_counter() - t0)
        if i % 25 == 0:
            print(f"frame {i}/{n}  {times[-1]*1e3:.1f} ms  "
                  f"status={system.tracker.status}  kf={system.n_kf}")
        if args.viz_every and i % args.viz_every == 0:
            # incremental map view (Viewer.cc/MapDrawer role, offline)
            from dsp_slam_rgbd_tpu.system import viz

            st = system.state
            kv = np.asarray(st.kf_valid)
            poses = np.asarray(st.kf_pose)[kv]
            pts = np.asarray(st.pt_pos)[np.asarray(st.pt_valid)]
            viz.trajectory_figure(
                poses, pts,
                os.path.join(args.out_dir, "viz", f"map_{i:06d}.png"))

    if viewer is not None:
        viewer.close()
    system.save_trajectory_kitti(os.path.join(args.out_dir,
                                              "CameraTrajectory.txt"))
    system.save_trajectory_tum(os.path.join(args.out_dir,
                                            "CameraTrajectory_TUM.txt"))
    system.save_entire_map(args.out_dir)
    med = sorted(times)[len(times) // 2] if times else 0.0
    # reference prints median/mean track time at exit (`dsp_slam.cc:109-118`)
    print(f"median tracking time: {med*1e3:.1f} ms "
          f"({1.0/max(med,1e-9):.1f} FPS)")
    print(f"mean tracking time: {sum(times)/max(len(times),1)*1e3:.1f} ms")
    print(f"keyframes: {system.n_kf}, loop closures: {system.loop_closures}")

    # machine-readable per-run summary next to the trajectory (the
    # exit-time stats of the reference `dsp_slam.cc:109-118`, structured)
    import json as json_mod

    ts_arr = np.asarray(times) if times else np.zeros(1)
    summary = {
        "frames": len(times),
        "fps": round(len(times) / max(float(ts_arr.sum()), 1e-9), 2),
        "track_ms_p50": round(float(np.percentile(ts_arr, 50)) * 1e3, 1),
        "track_ms_p90": round(float(np.percentile(ts_arr, 90)) * 1e3, 1),
        "track_ms_p99": round(float(np.percentile(ts_arr, 99)) * 1e3, 1),
        "n_kf": system.n_kf,
        "n_kf_live": int(np.asarray(system.state.kf_valid).sum()),
        "n_points": int(np.asarray(system.state.pt_valid).sum()),
        "n_objects": int(np.asarray(system.state.obj_valid).sum()),
        "loop_closures": system.loop_closures,
        "kf_slots_exhausted": system.kf_slots_exhausted,
        # no-silent-caps observability: tracking frames whose covisible
        # window overflowed LOCAL_PTS, and object pose edges lost to ring
        # wrap (size MapConfig up if these grow)
        "local_pts_overflows": system.tracker.local_pts_overflows,
        "oobs_overwrites": system.mapping.oobs_overwrites,
        "final_status": system.tracker.status,
    }
    if args.gt and os.path.isfile(args.gt):
        import jax.numpy as jnp

        from dsp_slam_rgbd_tpu.solvers.sim3 import align_trajectories

        gt = np.loadtxt(args.gt, ndmin=2)[:, [3, 7, 11]]
        est = np.loadtxt(
            os.path.join(args.out_dir, "CameraTrajectory.txt"),
            ndmin=2)[:, [3, 7, 11]]
        m = min(len(gt), len(est))
        if m >= 3:
            _, ate = align_trajectories(
                jnp.asarray(est[:m], jnp.float32),
                jnp.asarray(gt[:m], jnp.float32), fix_scale=True)
            summary["ate_rmse"] = round(float(ate), 4)
    with open(os.path.join(args.out_dir, "summary.json"), "w") as f:
        json_mod.dump(summary, f, indent=1)
    print("summary:", json_mod.dumps(summary))


if __name__ == "__main__":
    main()
