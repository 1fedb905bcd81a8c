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


def _bootstrap_vocab(seq, cfg, sensor: str, n_frames: int):
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
          f"from {len(idxs)} frames")
    return vocabulary.train(all_desc)


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
    ap.add_argument("--vocab", default=None,
                    help="ORB vocabulary npz (enables loop closing + BoW "
                         "relocalization)")
    ap.add_argument("--bootstrap-vocab", type=int, default=0, metavar="N",
                    help="if --vocab does not exist, train it on ORB "
                         "descriptors from N frames of this sequence")
    args = ap.parse_args()

    from dsp_slam_rgbd_tpu import config as cfg_mod
    from dsp_slam_rgbd_tpu.models import deepsdf
    from dsp_slam_rgbd_tpu.system import sequence as seq_mod
    from dsp_slam_rgbd_tpu.system.slam import SLAMSystem

    if args.yaml:
        cfg = cfg_mod.from_reference_yaml_json(args.yaml, args.json,
                                               sensor=args.sensor)
    else:
        cfg = cfg_mod.SystemConfig(sensor=args.sensor)

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
                                     args.bootstrap_vocab)
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

    # disk read + host→device upload run on a background thread, one frame
    # ahead of tracking (the data-loader stage: the transfer rides under
    # the previous frame's device compute — system/prefetch.py)
    from dsp_slam_rgbd_tpu.system.prefetch import ImagePrefetcher

    def frames():
        for i in range(n):
            f = seq.frame(i)
            yield f if isinstance(f, tuple) else (f,)

    times = []
    for i, imgs in enumerate(ImagePrefetcher(frames(), depth=2)):
        t0 = time.perf_counter()
        dets = seq.detections(i) or None
        if args.sensor == "stereo":
            system.track_stereo(*imgs, timestamp=i / cfg.tracking.fps,
                                detections=dets)
        elif args.sensor == "rgbd":
            system.track_rgbd(*imgs, timestamp=i / cfg.tracking.fps,
                              detections=dets)
        else:
            system.track_mono(*imgs, timestamp=i / cfg.tracking.fps,
                              detections=dets)
        times.append(time.perf_counter() - t0)
        if i % 25 == 0:
            print(f"frame {i}/{n}  {times[-1]*1e3:.1f} ms  "
                  f"status={system.tracker.status}  kf={system.n_kf}")

    os.makedirs(args.out_dir, exist_ok=True)
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


if __name__ == "__main__":
    main()
