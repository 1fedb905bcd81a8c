"""System-level loop closing: BoW retrieval + consistency + Sim3 +
correction + global BA, on a hand-built revisit scenario with drift."""
import numpy as np
import jax
import jax.numpy as jnp

from dsp_slam_rgbd_tpu.loop import vocabulary
from dsp_slam_rgbd_tpu.mapping import map_state as ms
from dsp_slam_rgbd_tpu.ops import camera as cam_ops
from dsp_slam_rgbd_tpu.ops import lie
from dsp_slam_rgbd_tpu.system.slam import SLAMSystem

from test_system_e2e import make_cfg

CAM = cam_ops.Intrinsics(fx=200.0, fy=200.0, cx=112.0, cy=80.0, bf=100.0)


def build_revisit_state(rng):
    """8 KFs on a loop: 0..6 move away, KF 5..7 return near KF0's view.
    KF7 re-observes KF0's scene through DRIFTED duplicate points."""
    P = 80
    pts0 = np.stack(
        [rng.uniform(-3, 3, P), rng.uniform(-2, 2, P), rng.uniform(6, 10, P)],
        -1,
    ).astype(np.float32)
    drift = np.asarray(
        lie.exp_se3(jnp.asarray([0.25, 0.1, -0.1, 0.015, 0.02, -0.01]))
    )

    st = ms.empty(max_kf=8, max_feat=96, max_pts=512, max_obj=4)
    desc0 = rng.integers(0, 2 ** 32, (96, 8), dtype=np.uint32)

    kf_poses, kf_descs = [], []
    for k in range(8):
        if k < 5:
            T = np.eye(4, dtype=np.float32)
            T[0, 3] = 0.8 * k
            d = rng.integers(0, 2 ** 32, (96, 8), dtype=np.uint32) \
                if k > 0 else desc0
        else:
            # returning: views resemble KF0's progressively, with drift
            T = drift @ np.eye(4, dtype=np.float32)
            T[0, 3] += 0.3 * (7 - k)
            d = desc0.copy()
            flips = rng.integers(0, 8, (96, 4))
            for i in range(96):
                for w in flips[i]:
                    d[i, w] ^= np.uint32(1) << np.uint32(rng.integers(0, 32))
        kf_poses.append(T)
        kf_descs.append(d)

    # two point sets: originals (KF0-4 observe) and drifted duplicates
    # (KF5-7 observe) — the situation after an unclosed loop.  A camera
    # whose pose estimate drifted by D triangulates points drifted by D⁻¹
    # (its own observations stay self-consistent), so:
    inv_d = np.asarray(lie.inv_se3(jnp.asarray(drift)))
    pts_dup = pts0 @ inv_d[:3, :3].T + inv_d[:3, 3]
    pt_pos = np.zeros((512, 3), np.float32)
    pt_pos[:P] = pts0
    pt_pos[P: 2 * P] = pts_dup
    pt_valid = np.zeros(512, bool)
    pt_valid[: 2 * P] = True

    kf_xy = np.zeros((8, 96, 2), np.float32)
    kf_pt = np.full((8, 96), -1, np.int32)
    for k in range(8):
        base = 0 if k < 5 else P
        src = pts0 if k < 5 else pts_dup
        pc = src @ kf_poses[k][:3, :3].T + kf_poses[k][:3, 3]
        uv = np.asarray(cam_ops.project(CAM, jnp.asarray(pc)))
        kf_xy[k, :P] = uv
        kf_pt[k, :P] = np.arange(base, base + P)

    st = st._replace(
        kf_pose=jnp.asarray(np.stack(kf_poses)),
        kf_valid=jnp.ones(8, bool),
        kf_frame_id=jnp.arange(8, dtype=jnp.int32) * 4,
        kf_xy=jnp.asarray(kf_xy),
        kf_desc=jnp.asarray(np.stack(kf_descs)),
        kf_feat_valid=jnp.ones((8, 96), bool),
        kf_feat_pt=jnp.asarray(kf_pt),
        pt_pos=jnp.asarray(pt_pos),
        pt_valid=jnp.asarray(pt_valid),
        pt_ref_kf=jnp.asarray(
            [0] * P + [5] * P + [-1] * (512 - 2 * P), jnp.int32
        ),
        # point descriptors mirror their observations (production maintains
        # these; the loop group-projection gate matches against them)
        pt_desc=st.pt_desc.at[:P].set(jnp.asarray(desc0[:P]))
        .at[P: 2 * P].set(jnp.asarray(kf_descs[5][:P])),
    )
    return st, drift


def test_system_loop_stage_closes_loop():
    rng = np.random.default_rng(0)
    st, drift = build_revisit_state(rng)

    import dataclasses

    from dsp_slam_rgbd_tpu.config import MapConfig

    cfg = dataclasses.replace(
        make_cfg(), cam=CAM,
        map=MapConfig(max_kf=8, max_feat=96, max_pts=512, max_obj=4,
                      max_oobs=64, local_window=6),
    )
    vocab = vocabulary.train(
        rng.integers(0, 2 ** 32, (3000, 8), dtype=np.uint32),
        branching=6, depth=3,
    )
    sys_ = SLAMSystem(cfg, vocab=vocab)
    mp = sys_.mapping
    mp.state = st
    sys_.state = st
    sys_.tracker.state = st
    for k in range(8):
        mp._update_bow(k)

    # feed the returning keyframes through the loop stage; consistency
    # requires 3 consecutive detections before closing on the 4th
    # (kid=7: eight keyframes exist)
    for q, frame_id in ((5, 20), (6, 24), (7, 28)):
        mp._loop_stage(q, kid=7, frame_id=frame_id + 10)
    # one more pass of the final keyframe to cross the consistency bar
    mp._loop_stage(7, kid=7, frame_id=38)

    assert sys_.loop_closures >= 1
    # post-loop global BA is STAGED (the reference's abortable-GBA-thread
    # role): one bounded slice ran at closure, the rest is owed and drained
    # on subsequent keyframes
    assert 0 < mp._gba_iters_left < 10
    drains = 0
    while mp._gba_iters_left > 0:
        mp._drain_gba_budget()
        drains += 1
        assert drains <= 10
    assert mp._gba_iters_left == 0
    # KF7 should now coincide with KF0's (undrifted) viewpoint: the
    # loop-correction pulls the drifted pose back
    e_before = np.asarray(lie.log_se3(
        jnp.asarray(st.kf_pose[7]) @ lie.inv_se3(st.kf_pose[0])
    ))
    e_after = np.asarray(lie.log_se3(
        mp.state.kf_pose[7] @ lie.inv_se3(mp.state.kf_pose[0])
    ))
    assert np.linalg.norm(e_after) < 0.6 * np.linalg.norm(e_before)


def test_object_obs_ring_is_per_object():
    """One busy object can no longer evict another object's pose edges:
    the observation buffer is partitioned into per-object rings."""
    cfg = make_cfg()  # map: max_obj=4, max_oobs=64 -> 16 slots per object
    sys_ = SLAMSystem(cfg)
    t = np.eye(4, dtype=np.float32)
    mp = sys_.mapping
    mp._add_object_obs(1, 0, t)              # one edge for object 1
    for k in range(40):                      # object 0 floods its ring
        mp._add_object_obs(0, k % 8, t)
    oobs_obj = np.asarray(mp.state.oobs_obj)
    oobs_valid = np.asarray(mp.state.oobs_valid)
    # object 1's edge survived
    assert ((oobs_obj == 1) & oobs_valid).sum() == 1
    # object 0 occupies exactly its own region (16 slots)
    assert ((oobs_obj == 0) & oobs_valid).sum() == 16
    assert np.all(np.nonzero((oobs_obj == 0) & oobs_valid)[0] < 16)
