"""Mono mask-label data path: instance masks stored on disk drive the mono
object pipeline end-to-end (reference `reconstruct/mono_sequence.py:95-107`
reads masks per frame; `Tracking_util.cc:163-208` assembles detections from
them with the frame's keypoints).

Two layers:
  * `MonoSequence.detections` returns `MaskLabel`s from `<frame>_masks.npz`;
  * `SLAMSystem._object_stage` converts MaskLabels → MonoDetections with the
    current frame's keypoints and reconstructs the object from masks alone
    (same synthetic sphere world as test_mono_objects, but detections now
    come from rendered mask bitmaps instead of hand-built kp lists).
"""
import numpy as np
import jax.numpy as jnp

from dsp_slam_rgbd_tpu.frontend.orb import Features
from dsp_slam_rgbd_tpu.mapping import map_state as ms
from dsp_slam_rgbd_tpu.system import sequence as seq_mod
from dsp_slam_rgbd_tpu.system.detections import MaskLabel
from dsp_slam_rgbd_tpu.system.slam import SLAMSystem
from dsp_slam_rgbd_tpu.tracking.tracker import Frame

from test_mono_objects import (
    CAM, CENTER_W, CODE_LEN, N_CLUTTER, N_KF, N_SPHERE, PARAMS, RECON_CFG,
    R_TRUE, SPEC, _make_state, _make_world, _insert_kf,
)

H, W = 160, 224


def test_mono_sequence_loads_mask_labels(tmp_path):
    from PIL import Image

    root = tmp_path / "seq"
    labels = tmp_path / "labels"
    root.mkdir()
    labels.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        img = rng.uniform(0, 255, (H, W)).astype(np.uint8)
        Image.fromarray(img).save(root / f"{i:06d}.png")
        m = np.zeros((2, H, W), bool)
        m[0, 40:90, 60:120] = True
        m[1, 10:30, 10:40] = True
        seq_mod.save_mask_labels(str(labels / f"{i:06d}_masks.npz"), m)

    seq = seq_mod.MonoSequence(str(root), labels_dir=str(labels))
    assert len(seq) == 3
    dets = seq.detections(1)
    assert len(dets) == 2
    assert all(isinstance(d, MaskLabel) for d in dets)
    assert dets[0].mask.shape == (H, W)
    assert dets[0].mask[60, 80] and not dets[0].mask[0, 0]


def _render_mask(st, k, margin=6):
    """Mask bitmap covering the sphere's projected keypoints in KF k."""
    uv = np.asarray(st.kf_xy[k])[:N_SPHERE]
    m = np.zeros((H, W), bool)
    x0 = max(int(uv[:, 0].min()) - margin, 0)
    x1 = min(int(uv[:, 0].max()) + margin, W - 1)
    y0 = max(int(uv[:, 1].min()) - margin, 0)
    y1 = min(int(uv[:, 1].max()) + margin, H - 1)
    m[y0:y1 + 1, x0:x1 + 1] = True
    return m


def _frame_for_kf(st, k):
    """A minimal Frame whose keypoints mirror KF k's feature table."""
    P = N_SPHERE + N_CLUTTER
    xy = st.kf_xy[k]
    F = xy.shape[0]
    valid = jnp.zeros(F, bool).at[:P].set(True)
    feats = Features(
        xy=xy, level=jnp.zeros(F, jnp.int32), angle=jnp.zeros(F),
        score=jnp.zeros(F), desc=jnp.zeros((F, 8), jnp.uint32), valid=valid,
    )
    return Frame(feats, jnp.full(F, -1.0), jnp.full(F, -1.0),
                 st.kf_pose[k], jnp.full(F, -1, jnp.int32), float(k))


def test_mono_object_from_disk_masks(tmp_path):
    """Masks written to disk → MonoSequence → system object stage →
    reconstructed object (pose within 15% of the radius)."""
    rng = np.random.default_rng(3)
    pts_w = _make_world(rng)

    import dataclasses

    from test_system_e2e import make_cfg

    cfg = dataclasses.replace(make_cfg(sensor="mono"), cam=CAM,
                              recon=RECON_CFG)
    sys_ = SLAMSystem(cfg, decoder_params=PARAMS, decoder_spec=SPEC)
    st = _make_state(pts_w)

    labels = tmp_path / "labels"
    labels.mkdir()

    for i in range(N_KF):
        st = _insert_kf(st, i, cam_x=0.08 * i)
        sys_.mapping.state = st
        mask = _render_mask(st, i)
        seq_mod.save_mask_labels(str(labels / f"{i:06d}_masks.npz"),
                                 mask[None])
        # reload from disk — the sequence-loader path
        dets = seq_mod.load_mask_labels(str(labels / f"{i:06d}_masks.npz"))
        assert len(dets) == 1 and isinstance(dets[0], MaskLabel)
        sys_.mapping._object_stage(i, _frame_for_kf(st, i), dets,
                                   None, kid=i)
        st = sys_.mapping.state

    assert bool(st.obj_valid[0])
    assert bool(st.obj_recon[0])
    c = np.asarray(st.obj_pose)[0][:3, 3]
    np.testing.assert_allclose(c, CENTER_W, atol=0.2 * R_TRUE)
