"""Solver tests on simulated geometry with known optima (SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np

from dsp_slam_rgbd_tpu.ops import camera as cam_ops
from dsp_slam_rgbd_tpu.ops import lie
from dsp_slam_rgbd_tpu.solvers import initializer, pnp, pose_gn, sim3, triangulate

CAM = cam_ops.Intrinsics(fx=500.0, fy=500.0, cx=320.0, cy=240.0, bf=50.0)


def scene(rng, n=200, spread=4.0, depth=8.0):
    pts = np.stack(
        [
            rng.uniform(-spread, spread, n),
            rng.uniform(-spread * 0.6, spread * 0.6, n),
            rng.uniform(depth * 0.5, depth * 1.5, n),
        ],
        axis=-1,
    ).astype(np.float32)
    return jnp.asarray(pts)


def make_pose(rng, rot=0.1, trans=0.5):
    x = np.concatenate(
        [rng.standard_normal(3) * trans, rng.standard_normal(3) * rot]
    ).astype(np.float32)
    return lie.exp_se3(jnp.asarray(x))


def test_pose_gn_mono_converges():
    rng = np.random.default_rng(0)
    pts = scene(rng)
    T_true = make_pose(rng)
    uv = cam_ops.project(CAM, lie.transform_points(T_true, pts))
    uv = uv + jnp.asarray(rng.normal(0, 0.5, uv.shape), dtype=jnp.float32)
    T0 = make_pose(rng)  # bad init
    res = pose_gn.optimize_pose(
        CAM, T0, pts, uv, jnp.ones(len(pts)), jnp.ones(len(pts), bool)
    )
    err = np.asarray(lie.log_se3(res.t_cw @ lie.inv_se3(T_true)))
    assert np.linalg.norm(err[:3]) < 0.02
    assert np.linalg.norm(err[3:]) < 0.005
    assert int(res.n_inliers) > 180


def test_pose_gn_rejects_outliers():
    rng = np.random.default_rng(1)
    pts = scene(rng)
    T_true = make_pose(rng)
    uv = np.asarray(cam_ops.project(CAM, lie.transform_points(T_true, pts))).copy()
    n_out = 40
    uv[:n_out] += rng.uniform(20, 80, (n_out, 2)) * rng.choice(
        [-1, 1], (n_out, 2)
    )
    res = pose_gn.optimize_pose(
        CAM, T_true, pts, jnp.asarray(uv), jnp.ones(len(pts)),
        jnp.ones(len(pts), bool),
    )
    inl = np.asarray(res.inliers)
    assert inl[:n_out].sum() <= 2          # outliers gated out
    assert inl[n_out:].sum() >= 150        # inliers kept
    err = np.asarray(lie.log_se3(res.t_cw @ lie.inv_se3(T_true)))
    assert np.linalg.norm(err) < 0.01


def test_pose_gn_stereo():
    rng = np.random.default_rng(2)
    pts = scene(rng)
    T_true = make_pose(rng)
    obs = cam_ops.project_stereo(CAM, lie.transform_points(T_true, pts))
    T0 = jnp.eye(4)
    res = pose_gn.optimize_pose(
        CAM, T0, pts, obs, jnp.ones(len(pts)), jnp.ones(len(pts), bool),
        stereo=True,
    )
    err = np.asarray(lie.log_se3(res.t_cw @ lie.inv_se3(T_true)))
    assert np.linalg.norm(err) < 0.01


def test_triangulation_roundtrip():
    rng = np.random.default_rng(3)
    pts = scene(rng, n=100)
    T1 = jnp.eye(4)
    T2 = make_pose(rng, rot=0.05, trans=1.0)
    uv1 = cam_ops.project(CAM, lie.transform_points(T1, pts))
    uv2 = cam_ops.project(CAM, lie.transform_points(T2, pts))
    rec = triangulate.triangulate_two_views(CAM, CAM, T1, T2, uv1, uv2)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(pts), atol=0.02)
    masks = triangulate.acceptance_masks(CAM, CAM, T1, T2, rec, uv1, uv2)
    assert np.asarray(masks["depth"]).all()
    assert np.asarray(masks["reproj"]).all()


def test_pnp_ransac_with_outliers():
    rng = np.random.default_rng(4)
    pts = scene(rng)
    T_true = make_pose(rng, rot=0.2, trans=1.0)
    uv = np.asarray(cam_ops.project(CAM, lie.transform_points(T_true, pts))).copy()
    uv[:60] += rng.uniform(30, 120, (60, 2)) * rng.choice([-1, 1], (60, 2))
    res = pnp.solve_pnp_ransac(
        CAM, pts, jnp.asarray(uv), jnp.ones(len(pts)),
        jnp.ones(len(pts), bool), jax.random.PRNGKey(0),
    )
    assert bool(res.ok)
    err = np.asarray(lie.log_se3(res.t_cw @ lie.inv_se3(T_true)))
    assert np.linalg.norm(err) < 0.02


def test_horn_alignment_exact():
    rng = np.random.default_rng(5)
    p1 = jnp.asarray(rng.standard_normal((50, 3)), dtype=jnp.float32)
    x = jnp.asarray(
        np.concatenate([rng.standard_normal(3), rng.standard_normal(3) * 0.4,
                        [0.3]]),
        dtype=jnp.float32,
    )
    T_true = lie.exp_sim3(x)
    p2 = lie.transform_points(T_true, p1)
    T = sim3.horn_align(p1, p2, fix_scale=False)
    np.testing.assert_allclose(np.asarray(T), np.asarray(T_true), atol=1e-3)
    # fixed scale variant on a pure SE(3) motion
    T_se = lie.exp_se3(jnp.asarray(np.random.default_rng(6).standard_normal(6),
                                   dtype=jnp.float32) * 0.3)
    p2s = lie.transform_points(T_se, p1)
    Ts = sim3.horn_align(p1, p2s, fix_scale=True)
    np.testing.assert_allclose(np.asarray(Ts), np.asarray(T_se), atol=1e-3)


def test_sim3_ransac():
    rng = np.random.default_rng(7)
    pts1 = scene(rng, n=80)
    T_true = make_pose(rng, rot=0.3, trans=2.0)
    pts2 = lie.transform_points(T_true, pts1)
    # corrupt 20 correspondences
    pts2 = np.asarray(pts2).copy()
    pts2[:20] += rng.uniform(1, 3, (20, 3))
    pts2 = jnp.asarray(pts2)
    uv1 = cam_ops.project(CAM, pts1)
    uv2 = cam_ops.project(CAM, pts2)
    # observations of the TRUE points (so outlier pts disagree with uv)
    uv2_true = cam_ops.project(CAM, lie.transform_points(T_true, pts1))
    res = sim3.solve_sim3_ransac(
        CAM, CAM, pts1, pts2, uv1, uv2_true, jnp.ones(80), jnp.ones(80),
        jnp.ones(80, bool), jax.random.PRNGKey(1),
    )
    assert bool(res.ok)
    err = np.asarray(lie.log_se3(res.t_21 @ lie.inv_se3(T_true)))
    assert np.linalg.norm(err) < 0.05


def test_ate_alignment():
    rng = np.random.default_rng(8)
    traj = jnp.asarray(np.cumsum(rng.standard_normal((100, 3)), 0),
                       dtype=jnp.float32)
    T = lie.exp_se3(jnp.asarray([1.0, -2.0, 0.5, 0.1, 0.2, -0.1]))
    est = lie.transform_points(lie.inv_se3(T), traj)
    _, ate = sim3.align_trajectories(est, traj)
    assert float(ate) < 1e-3


def _init_case(rng, planar: bool):
    n = 300
    if planar:
        pts = np.stack(
            [rng.uniform(-4, 4, n), rng.uniform(-3, 3, n),
             8.0 + 0.6 * rng.uniform(-4, 4, n)], -1
        )  # tilted plane
        pts[:, 2] = 8.0 + 0.4 * pts[:, 0] + 0.2 * pts[:, 1]
    else:
        pts = np.stack(
            [rng.uniform(-4, 4, n), rng.uniform(-3, 3, n),
             rng.uniform(5, 14, n)], -1
        )
    pts = jnp.asarray(pts.astype(np.float32))
    T2 = lie.exp_se3(jnp.asarray([0.8, 0.05, 0.1, 0.02, -0.06, 0.01]))
    uv1 = cam_ops.project(CAM, pts)
    uv2 = cam_ops.project(CAM, lie.transform_points(T2, pts))
    noise = lambda: jnp.asarray(rng.normal(0, 0.4, (n, 2)), dtype=jnp.float32)
    return pts, T2, uv1 + noise(), uv2 + noise()


def test_mono_init_general_scene():
    rng = np.random.default_rng(9)
    pts, T2, uv1, uv2 = _init_case(rng, planar=False)
    res = initializer.initialize(
        CAM, uv1, uv2, jnp.ones(len(uv1), bool), jax.random.PRNGKey(2)
    )
    assert bool(res.ok)
    assert not bool(res.is_homography)
    # translation direction matches (scale is free in mono)
    t_est = np.asarray(res.t_21)[:3, 3]
    t_true = np.asarray(T2)[:3, 3]
    cos = np.dot(t_est, t_true) / (
        np.linalg.norm(t_est) * np.linalg.norm(t_true)
    )
    assert cos > 0.99
    R_err = np.asarray(
        lie.log_so3(res.t_21[:3, :3] @ jnp.asarray(T2)[:3, :3].T)
    )
    assert np.linalg.norm(R_err) < 0.01
    assert int(jnp.sum(res.good)) > 150


def test_mono_init_planar_scene():
    rng = np.random.default_rng(10)
    pts, T2, uv1, uv2 = _init_case(rng, planar=True)
    res = initializer.initialize(
        CAM, uv1, uv2, jnp.ones(len(uv1), bool), jax.random.PRNGKey(3)
    )
    assert bool(res.ok)
    assert bool(res.is_homography)
    t_est = np.asarray(res.t_21)[:3, 3]
    t_true = np.asarray(T2)[:3, 3]
    cos = np.dot(t_est, t_true) / (
        np.linalg.norm(t_est) * np.linalg.norm(t_true)
    )
    assert cos > 0.98
    R_err = np.asarray(
        lie.log_so3(res.t_21[:3, :3] @ jnp.asarray(T2)[:3, :3].T)
    )
    assert np.linalg.norm(R_err) < 0.02


def test_pnp_planar_scene():
    """Relocalization PnP on a PLANAR scene (road/wall pathology): every
    RANSAC sample is coplanar, where the 12-dof DLT is rank-deficient and
    its pose is garbage — the homography-decomposition minimal solver
    (`pnp._planar_pnp`, the reference EPnP's planar case,
    `PnPsolver.cc:667-858`) must carry the trial (VERDICT r4 weak #5)."""
    rng = np.random.default_rng(6)
    # ground plane y = 1.5, camera looking forward/down
    xz = rng.uniform([-4.0, 4.0], [4.0, 14.0], (120, 2))
    pts = jnp.asarray(np.stack(
        [xz[:, 0], np.full(120, 1.5), xz[:, 1]], axis=1), jnp.float32)
    T_true = make_pose(rng, rot=0.15, trans=0.8)
    uv = cam_ops.project(CAM, lie.transform_points(T_true, pts))

    # the general DLT alone IS degenerate here: a coplanar minimal sample
    # produces a pose whose reprojection is off by orders of magnitude
    xn = cam_ops.pixel_rays(CAM, uv)[:, :2]
    T_dlt = pnp._dlt_pnp(pts[:6], xn[:6])
    pc = lie.transform_points(T_dlt, pts)
    err_dlt = np.linalg.norm(
        np.asarray(cam_ops.project(CAM, pc)) - np.asarray(uv), axis=1)
    assert np.median(err_dlt) > 5.0, "DLT unexpectedly fine on planar"

    res = pnp.solve_pnp_ransac(
        CAM, pts, uv, jnp.ones(len(pts)), jnp.ones(len(pts), bool),
        jax.random.PRNGKey(1),
    )
    assert bool(res.ok)
    err = np.asarray(lie.log_se3(res.t_cw @ lie.inv_se3(T_true)))
    assert np.linalg.norm(err) < 0.02
    assert int(res.n_inliers) > 100
