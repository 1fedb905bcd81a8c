"""Covisibility-based local-map retrieval in the tracker (reference
`Tracking::UpdateLocalKeyFrames`, `src/Tracking.cc:1309-1365`).

Scenario: after a loop closure the camera revisits an old part of the map.
The frame's matched points are observed by OLD keyframes only; a recency
window (the pre-r3 behavior) would gather the recent far-away keyframes'
points and tracking could never re-acquire loop-side landmarks."""
import jax.numpy as jnp
import numpy as np

from dsp_slam_rgbd_tpu.config import MapConfig, SystemConfig
from dsp_slam_rgbd_tpu.mapping import map_state as ms
from dsp_slam_rgbd_tpu.tracking import tracker as tr_mod


def _revisit_state():
    st = ms.empty(max_kf=8, max_feat=16, max_pts=32, max_obj=2)
    kf_feat_pt = np.full((8, 16), -1, np.int32)
    # loop-side KFs 0-1 observe points 0..9 (at the origin)
    kf_feat_pt[0, :10] = np.arange(10)
    kf_feat_pt[1, :10] = np.arange(10)
    # recent KFs 2-7 observe points 10..19 (far away, x = 100)
    for k in range(2, 8):
        kf_feat_pt[k, :10] = np.arange(10, 20)
    pos = np.zeros((32, 3), np.float32)
    pos[:10, 2] = 5.0               # loop-side points ahead of the origin
    pos[10:20, 0] = 100.0
    pos[10:20, 2] = 5.0
    st = st._replace(
        kf_valid=jnp.asarray([True] * 8),
        kf_frame_id=jnp.arange(8, dtype=jnp.int32),
        kf_feat_valid=jnp.ones((8, 16), bool),
        kf_feat_pt=jnp.asarray(kf_feat_pt),
        pt_valid=jnp.asarray([True] * 20 + [False] * 12),
        pt_pos=jnp.asarray(pos),
    )
    return st


def test_covisibility_window_reacquires_loop_side_kfs():
    cfg = SystemConfig(map=MapConfig(max_kf=8, max_feat=16, max_pts=32,
                                     max_obj=2, local_window=6))
    tr = tr_mod.Tracker(cfg, _revisit_state())

    # the revisiting frame tracked loop-side points 0..4
    pt_idx = np.full(16, -1, np.int32)
    pt_idx[:5] = np.arange(5)
    window = tr._local_kf_window(jnp.asarray(pt_idx))

    assert 0 in window and 1 in window     # loop-side KFs retrieved
    # the reference KF becomes the strongest voter (a loop-side KF)
    assert tr.ref_kf in (0, 1)
    # the temporal window provably fails this: last 6 slots miss KF 0-1
    recent = tr._recent_window()
    assert 0 not in recent and 1 not in recent

    # the gathered candidate point set contains the loop-side points
    idx, mask = tr_mod._gather_local_points(tr.state, window)
    got = set(np.asarray(idx)[np.asarray(mask)].tolist())
    assert set(range(10)) <= got


def test_window_falls_back_to_recent_without_matches():
    cfg = SystemConfig(map=MapConfig(max_kf=8, max_feat=16, max_pts=32,
                                     max_obj=2, local_window=6))
    tr = tr_mod.Tracker(cfg, _revisit_state())
    window = tr._local_kf_window(jnp.full(16, -1, jnp.int32))
    np.testing.assert_array_equal(window, tr._recent_window())
