"""BA / pose-graph / map-state tests on simulated pose graphs with known
optima (SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np

from dsp_slam_rgbd_tpu.mapping import ba, covisibility, map_state, objects, pose_graph
from dsp_slam_rgbd_tpu.ops import camera as cam_ops
from dsp_slam_rgbd_tpu.ops import lie

CAM = cam_ops.Intrinsics(fx=500.0, fy=500.0, cx=320.0, cy=240.0, bf=50.0)


def sim_ba_problem(rng, K=6, P=120, noise_pose=0.05, noise_pt=0.05,
                   with_objects=False, O=2, stereo=False):
    # ground truth: cameras on a line looking at a point cloud
    pts_true = np.stack(
        [rng.uniform(-4, 4, P), rng.uniform(-2, 2, P), rng.uniform(6, 12, P)],
        -1,
    ).astype(np.float32)
    kf_true = []
    for k in range(K):
        x = np.array([0.3 * k, 0.0, 0.0, 0.0, 0.01 * k, 0.0], np.float32)
        kf_true.append(np.asarray(lie.exp_se3(jnp.asarray(x))))
    kf_true = np.stack(kf_true)

    # observations: every KF sees every point
    obs_kf, obs_pt, obs_uv = [], [], []
    for k in range(K):
        pc = np.asarray(
            lie.transform_points(jnp.asarray(kf_true[k]), jnp.asarray(pts_true))
        )
        if stereo:
            uv = np.asarray(cam_ops.project_stereo(CAM, jnp.asarray(pc)))
        else:
            uv = np.concatenate(
                [np.asarray(cam_ops.project(CAM, jnp.asarray(pc))),
                 np.full((P, 1), -1.0)], -1
            )
        obs_kf.append(np.full(P, k))
        obs_pt.append(np.arange(P))
        obs_uv.append(uv + rng.normal(0, 0.3, uv.shape) * [1, 1, 1 if stereo else 0])
    obs_kf = np.concatenate(obs_kf).astype(np.int32)
    obs_pt = np.concatenate(obs_pt).astype(np.int32)
    obs_uv = np.concatenate(obs_uv).astype(np.float32)

    # noisy initialization (first KF fixed at truth)
    kf_init = kf_true.copy()
    for k in range(1, K):
        d = rng.standard_normal(6).astype(np.float32) * noise_pose
        kf_init[k] = np.asarray(lie.exp_se3(jnp.asarray(d))) @ kf_init[k]
    pts_init = pts_true + rng.standard_normal((P, 3)).astype(np.float32) * noise_pt

    # objects
    if with_objects:
        obj_true = []
        for o in range(O):
            T = np.eye(4, dtype=np.float32)
            T[:3, 3] = [2.0 * o - 1.0, 0.0, 9.0]
            obj_true.append(T)
        obj_true = np.stack(obj_true)
        oobs_kf, oobs_obj, oobs_t = [], [], []
        for k in range(K):
            for o in range(O):
                t_co = kf_true[k] @ obj_true[o]
                oobs_kf.append(k)
                oobs_obj.append(o)
                oobs_t.append(t_co)
        obj_init = obj_true.copy()
        for o in range(O):
            d = rng.standard_normal(6).astype(np.float32) * noise_pose
            obj_init[o] = np.asarray(lie.exp_se3(jnp.asarray(d))) @ obj_init[o]
        oobs = (
            np.asarray(oobs_kf, np.int32),
            np.asarray(oobs_obj, np.int32),
            np.stack(oobs_t).astype(np.float32),
        )
    else:
        obj_true = np.broadcast_to(np.eye(4, dtype=np.float32), (1, 4, 4))
        obj_init = obj_true
        oobs = (np.zeros(1, np.int32), np.zeros(1, np.int32),
                np.broadcast_to(np.eye(4, dtype=np.float32), (1, 4, 4)))

    # mono BA has a free scale gauge: anchor the first TWO keyframes (the
    # reference's local BA keeps a fixed frontier serving the same role)
    n_fixed = 1 if (stereo or with_objects) else 2
    kf_init[:n_fixed] = kf_true[:n_fixed]
    prob = ba.BAProblem(
        kf_pose=jnp.asarray(kf_init),
        kf_fixed=jnp.asarray([True] * n_fixed + [False] * (K - n_fixed)),
        kf_valid=jnp.ones(K, bool),
        pts=jnp.asarray(pts_init),
        pt_valid=jnp.ones(P, bool),
        obs_kf=jnp.asarray(obs_kf),
        obs_pt=jnp.asarray(obs_pt),
        obs_uv=jnp.asarray(obs_uv),
        obs_info=jnp.ones(len(obs_kf)),
        obs_mask=jnp.ones(len(obs_kf), bool),
        obj_pose=jnp.asarray(obj_init),
        obj_valid=jnp.asarray([with_objects] * len(obj_init)),
        oobs_kf=jnp.asarray(oobs[0]),
        oobs_obj=jnp.asarray(oobs[1]),
        oobs_t_co=jnp.asarray(oobs[2]),
        oobs_mask=jnp.asarray([with_objects] * len(oobs[0])),
    )
    return prob, kf_true, pts_true, obj_true


def pose_errors(est, true):
    errs = []
    for k in range(len(true)):
        e = lie.log_se3(jnp.asarray(est[k]) @ lie.inv_se3(jnp.asarray(true[k])))
        errs.append(np.linalg.norm(np.asarray(e)))
    return np.asarray(errs)


def test_local_ba_mono_converges():
    rng = np.random.default_rng(0)
    prob, kf_true, pts_true, _ = sim_ba_problem(rng)
    res = ba.local_ba(CAM, prob)
    err0 = pose_errors(np.asarray(prob.kf_pose), kf_true)
    err1 = pose_errors(np.asarray(res.kf_pose), kf_true)
    assert err1.mean() < 0.25 * err0.mean()
    # points pulled toward truth
    pe0 = np.linalg.norm(np.asarray(prob.pts) - pts_true, axis=1).mean()
    pe1 = np.linalg.norm(np.asarray(res.pts) - pts_true, axis=1).mean()
    # points land at the triangulation noise floor (~0.05 m for 0.3 px noise
    # at 9 m depth with 0.3 m baselines)
    assert pe1 < 0.7 * pe0
    assert pe1 < 0.06
    # most observations survive gating
    assert float(jnp.mean(res.obs_mask)) > 0.9


def test_local_ba_stereo_converges():
    rng = np.random.default_rng(1)
    prob, kf_true, pts_true, _ = sim_ba_problem(rng, stereo=True)
    res = ba.local_ba(CAM, prob)
    err1 = pose_errors(np.asarray(res.kf_pose), kf_true)
    assert err1.mean() < 0.02


def test_joint_ba_with_objects():
    rng = np.random.default_rng(2)
    prob, kf_true, pts_true, obj_true = sim_ba_problem(rng, with_objects=True)
    res = ba.local_ba(CAM, prob)
    # object poses recovered
    for o in range(len(obj_true)):
        e = lie.log_se3(
            jnp.asarray(np.asarray(res.obj_pose)[o])
            @ lie.inv_se3(jnp.asarray(obj_true[o]))
        )
        assert np.linalg.norm(np.asarray(e)) < 0.05
    assert float(jnp.mean(res.oobs_mask)) > 0.9


def test_ba_fixed_frame_stays():
    rng = np.random.default_rng(3)
    prob, kf_true, *_ = sim_ba_problem(rng)
    res = ba.local_ba(CAM, prob)
    np.testing.assert_allclose(
        np.asarray(res.kf_pose[0]), np.asarray(prob.kf_pose[0]), atol=1e-6
    )


def test_ba_gates_outlier_observations():
    rng = np.random.default_rng(4)
    prob, *_ = sim_ba_problem(rng, noise_pose=0.01, noise_pt=0.01)
    uv = np.asarray(prob.obs_uv).copy()
    uv[:30, :2] += 50.0  # corrupt 30 observations
    prob = prob._replace(obs_uv=jnp.asarray(uv))
    res = ba.local_ba(CAM, prob)
    assert np.asarray(res.obs_mask)[:30].sum() == 0
    assert np.asarray(res.obs_mask)[30:].mean() > 0.9


def test_pose_graph_loop_correction():
    """Odometry drift corrected by one loop edge — the essential-graph
    scenario."""
    rng = np.random.default_rng(5)
    K = 12
    # ground truth: poses around a circle (loop)
    true = []
    for k in range(K):
        a = 2 * np.pi * k / K
        x = np.array([np.cos(a) * 3, np.sin(a) * 3, 0, 0, 0, a], np.float32)
        true.append(np.asarray(lie.exp_se3(jnp.asarray(x))))
    true = np.stack(true)

    # odometry chain with drift
    est = [true[0]]
    for k in range(1, K):
        rel_true = true[k] @ np.asarray(lie.inv_se3(jnp.asarray(true[k - 1])))
        d = rng.standard_normal(6).astype(np.float32) * 0.03
        rel_noisy = np.asarray(lie.exp_se3(jnp.asarray(d))) @ rel_true
        est.append(rel_noisy @ est[-1])
    est = np.stack(est)

    # edges: odometry (noisy rel) + one exact loop edge K−1 -> 0
    ei, ej, meas = [], [], []
    for k in range(1, K):
        ei.append(k - 1)
        ej.append(k)
        meas.append(est[k] @ np.asarray(lie.inv_se3(jnp.asarray(est[k - 1]))))
    ei.append(0)
    ej.append(K - 1)
    meas.append(true[K - 1] @ np.asarray(lie.inv_se3(jnp.asarray(true[0]))))

    res = pose_graph.optimize_pose_graph(
        jnp.asarray(est),
        jnp.ones(K, bool),
        jnp.asarray([True] + [False] * (K - 1)),
        jnp.asarray(ei, jnp.int32),
        jnp.asarray(ej, jnp.int32),
        jnp.asarray(np.stack(meas)),
        jnp.ones(len(ei), bool),
        fix_scale=True,
        n_iters=30,
    )
    err_before = pose_errors(est, true)
    err_after = pose_errors(np.asarray(res.poses), true)
    # loop closure should cut the endpoint drift substantially
    assert err_after[-1] < 0.35 * max(err_before[-1], 1e-9)
    assert err_after.mean() < err_before.mean()


def test_map_state_and_covisibility():
    st = map_state.empty(max_kf=4, max_feat=8, max_pts=16, max_obj=2)
    # KF 0 and 1 share points 0..5; KF 2 shares 3 with KF 1
    st = st._replace(
        kf_valid=jnp.asarray([True, True, True, False]),
        pt_valid=jnp.asarray([True] * 10 + [False] * 6),
        kf_feat_valid=jnp.ones((4, 8), bool),
        kf_feat_pt=jnp.asarray(
            [
                [0, 1, 2, 3, 4, 5, -1, -1],
                [0, 1, 2, 3, 4, 5, 6, 7],
                [5, 6, 7, 8, 9, -1, -1, -1],
                [0, 1, 2, 3, 4, 5, 6, 7],
            ],
            jnp.int32,
        ),
    )
    W = covisibility.covisibility_matrix(st)
    assert int(W[0, 1]) == 6
    assert int(W[1, 2]) == 3
    assert int(W[0, 2]) == 1
    assert int(W[0, 3]) == 0  # invalid KF contributes nothing
    assert int(W[0, 0]) == 0  # diagonal zeroed

    in_w, frontier, wpts = covisibility.local_window(st, 0, max_kfs=4,
                                                     min_weight=5)
    assert bool(in_w[0]) and bool(in_w[1])
    assert not bool(in_w[2])
    assert bool(frontier[2])  # sees window points but below weight


def test_object_association():
    centers = jnp.asarray([[0.0, 0, 5], [3.0, 0, 5]])
    det = np.stack([np.eye(4), np.eye(4)]).astype(np.float32)
    det[0, :3, 3] = [0.2, 0, 5.1]   # near object 0
    det[1, :3, 3] = [10.0, 0, 5.0]  # unmatched
    assoc, unmatched = objects.associate_detections(
        centers, jnp.ones(2, bool), jnp.zeros(2, bool), jnp.zeros((2, 3)),
        jnp.asarray(det), jnp.ones(2, bool), jnp.eye(4),
    )
    assert int(assoc[0]) == 0
    assert int(assoc[1]) == -1
    assert not bool(unmatched[0])
    assert bool(unmatched[1])


def test_cuboid_pca():
    rng = np.random.default_rng(6)
    # box-shaped cloud: long in world x, flat in world y
    pts = np.stack(
        [rng.uniform(-2, 2, 200), rng.uniform(-0.3, 0.3, 200),
         rng.uniform(-0.8, 0.8, 200)], -1
    ).astype(np.float32)
    pts += [1.0, 2.0, 3.0]
    cub = objects.cuboid_from_points_pca(jnp.asarray(pts),
                                         jnp.ones(200, bool))
    c = np.asarray(cub.t_wo)[:3, 3]
    np.testing.assert_allclose(c, [1.0, 2.0, 3.0], atol=0.15)
    # principal (z) axis of the object should align with world x
    ez = np.asarray(cub.t_wo)[:3, 2]
    assert abs(ez[0]) > 0.99
    assert float(cub.scale) > 0.5


def test_nbv_reflection():
    nbv = objects.compute_nbv(jnp.asarray([0.0, 0, 5]), jnp.zeros(3))
    pos = np.asarray(nbv)[:3, 3]
    np.testing.assert_allclose(pos, [0, 0, 10], atol=1e-5)
    # looks back toward the object: camera z axis ≈ −z world
    z_axis = np.asarray(nbv)[:3, 2]
    np.testing.assert_allclose(z_axis, [0, 0, -1], atol=1e-5)


def test_cull_points_judges_recent_only():
    """MapPointCulling parity (`LocalMapping.cc:222-250`): the found/visible
    ratio and obs gates apply only while a point is RECENT (age < 3 in
    monotonic keyframe ids).  A mature drifted point that has become
    visible-but-unmatched on a revisit must NOT be culled — the regression
    here ate the outbound map on the loop test's return leg."""
    from dsp_slam_rgbd_tpu.mapping import local_mapping as lm

    st = map_state.empty(max_kf=4, max_feat=8, max_pts=8, max_obj=2)
    st = st._replace(
        kf_valid=jnp.asarray([True, True, True, False]),
        kf_feat_valid=jnp.ones((4, 8), bool),
        # point 0: mature (first id 0), bad ratio -> must survive
        # point 1: recent (first id 9), bad ratio -> culled
        # point 2: recent, good ratio, 2 stereo obs -> survives (obs gate)
        # point 3: recent at age 2, single mono obs -> culled (obs gate)
        pt_valid=jnp.asarray([True, True, True, True] + [False] * 4),
        pt_first_kf=jnp.asarray([0, 9, 8, 8] + [-1] * 4, jnp.int32),
        pt_visible=jnp.asarray([100, 100, 4, 4] + [1] * 4, jnp.int32),
        pt_found=jnp.asarray([2, 2, 4, 4] + [1] * 4, jnp.int32),
        kf_feat_pt=jnp.asarray(
            [[0, 1, 2, 3, -1, -1, -1, -1],
             [2, -1, -1, -1, -1, -1, -1, -1],
             [-1, -1, -1, -1, -1, -1, -1, -1],
             [-1, -1, -1, -1, -1, -1, -1, -1]], jnp.int32),
        kf_ur=jnp.where(jnp.arange(8)[None, :] < 4, 5.0, -1.0)
        * jnp.ones((4, 1)),
    )
    out = lm.cull_points(st, current_id=10, min_obs_after=4)
    keep = np.asarray(out.pt_valid)
    assert keep[0], "mature point must not be ratio-culled"
    assert not keep[1], "recent bad-ratio point must die"
    assert keep[2], "2 stereo obs = weighted 4 passes the stereo gate"
    assert not keep[3], "single obs at age 2 dies"
    # dead points are detached from the KF feature tables
    assert int(np.asarray(out.kf_feat_pt)[0, 1]) == -1


def test_spawn_resets_recycled_counters():
    """A point spawned into a recycled slot must start with fresh
    found/visible counters, not inherit the evicted point's ratio (which
    insta-culled every respawn once slot reuse began)."""
    from dsp_slam_rgbd_tpu.frontend.orb import Features
    from dsp_slam_rgbd_tpu.mapping import local_mapping as lm
    from dsp_slam_rgbd_tpu.tracking.tracker import Frame

    cam = cam_ops.Intrinsics(fx=100.0, fy=100.0, cx=32.0, cy=32.0, bf=50.0)
    st = map_state.empty(max_kf=4, max_feat=8, max_pts=8, max_obj=2)
    # slot 0 is FREE but carries stale counters from a culled point
    st = st._replace(
        pt_visible=st.pt_visible.at[0].set(100),
        pt_found=st.pt_found.at[0].set(2),
    )
    F = 8
    feats = Features(
        xy=jnp.tile(jnp.asarray([[32.0, 32.0]]), (F, 1)),
        level=jnp.zeros(F, jnp.int32),
        angle=jnp.zeros(F),
        score=jnp.ones(F),
        desc=jnp.zeros((F, 8), jnp.uint32),
        valid=jnp.asarray([True] + [False] * (F - 1)),
    )
    frame = Frame(feats, ur=jnp.full(F, 10.0), depth=jnp.full(F, 5.0),
                  t_cw=jnp.eye(4), pt_idx=jnp.full(F, -1, jnp.int32),
                  timestamp=0.0)
    out = lm.spawn_depth_points(st, cam, 0, frame, th_depth=10.0,
                                first_id=7)
    assert bool(out.pt_valid[0])
    assert int(out.pt_visible[0]) == 1 and int(out.pt_found[0]) == 1
    assert int(out.pt_first_kf[0]) == 7
