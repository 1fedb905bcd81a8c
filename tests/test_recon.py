"""GN object-reconstruction tests on synthetic analytic SDFs.

The decoder is swapped for a closed-form sphere SDF whose radius is
controlled by the first code entry, so GN convergence can be checked against
exact ground truth (SURVEY.md §4: "GN on synthetic SDF quadrics").
"""
import jax
import jax.numpy as jnp
import numpy as np

from dsp_slam_rgbd_tpu.models import deepsdf
from dsp_slam_rgbd_tpu.ops import lie
from dsp_slam_rgbd_tpu.recon import losses
from dsp_slam_rgbd_tpu.recon.optimizer import (
    ReconConfig,
    estimate_pose_cam_obj,
    reconstruct_object,
)

CODE_LEN = 4
R_BASE = 0.5
R_GAIN = 0.2


def sphere_fn(params, inputs):
    """SDF of a sphere with radius R_BASE + R_GAIN * code[0]."""
    code = inputs[..., :CODE_LEN]
    xyz = inputs[..., CODE_LEN:]
    r = R_BASE + R_GAIN * code[..., 0]
    return jnp.linalg.norm(xyz, axis=-1) - r


SPEC = deepsdf.AnalyticSdfSpec(latent_size=CODE_LEN, fn=sphere_fn)
PARAMS = {"layers": []}


def make_observations(rng, t_cam_obj, r_true, n_pts=128, n_rays=96,
                      n_bg=32):
    """Surface points + rays + depths for a sphere seen from the origin."""
    # surface points in object frame
    d = rng.standard_normal((n_pts, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    pts_obj = (d * r_true).astype(np.float32)
    pts_cam = np.asarray(
        lie.transform_points(jnp.asarray(t_cam_obj), jnp.asarray(pts_obj))
    )

    # foreground rays: toward visible surface points (camera at origin)
    vis = pts_cam[: n_rays - n_bg]
    depths = np.linalg.norm(vis, axis=1).astype(np.float32)
    fg_rays = (vis / depths[:, None]).astype(np.float32)
    # background rays: offset directions that miss the object
    center = np.asarray(t_cam_obj)[:3, 3]
    cdir = center / np.linalg.norm(center)
    perp = np.cross(cdir, [0.0, 0.0, 1.0])
    perp /= np.linalg.norm(perp)
    bg_rays = np.tile(cdir, (n_bg, 1)) + 2.0 * perp[None, :] \
        + 0.1 * rng.standard_normal((n_bg, 3))
    bg_rays = (bg_rays / np.linalg.norm(bg_rays, axis=1, keepdims=True)
               ).astype(np.float32)

    rays = np.concatenate([fg_rays, bg_rays], axis=0)
    depth_obs = np.concatenate([depths, np.zeros(n_bg, np.float32)])
    fg_mask = np.zeros(n_rays, bool)
    fg_mask[: n_rays - n_bg] = True
    return pts_cam, rays, depth_obs, fg_mask


def gt_pose(scale=1.0):
    """Object 3 m in front of the camera, slight rotation, given scale."""
    R = np.asarray(lie.exp_so3(jnp.asarray([0.05, -0.1, 0.02])))
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = scale * R
    T[:3, 3] = [0.2, -0.1, 3.0]
    return T


def test_sdf_loss_zero_at_ground_truth():
    rng = np.random.default_rng(0)
    code_true = np.zeros(CODE_LEN, np.float32)  # radius R_BASE
    T = gt_pose()
    pts_cam, *_ = make_observations(rng, T, R_BASE)
    t_obj_cam = lie.inv_sim3(jnp.asarray(T))
    out = losses.compute_sdf_loss(
        PARAMS, SPEC, jnp.asarray(pts_cam), jnp.ones(len(pts_cam), bool),
        t_obj_cam, jnp.asarray(code_true),
    )
    assert float(jnp.abs(out.res).max()) < 1e-5
    assert out.jac_pose.shape == (len(pts_cam), 7)
    assert out.jac_code.shape == (len(pts_cam), CODE_LEN)


def test_render_loss_residual_small_at_ground_truth():
    rng = np.random.default_rng(1)
    T = gt_pose()
    pts_cam, rays, depth_obs, fg = make_observations(rng, T, R_BASE)
    t_obj_cam = lie.inv_sim3(jnp.asarray(T))
    sampled = jnp.linspace(2.0, 4.0, 50)
    out = losses.compute_render_loss(
        PARAMS, SPEC, jnp.asarray(rays), jnp.ones(len(rays), bool),
        jnp.asarray(np.where(fg, depth_obs, 4.4)), t_obj_cam, sampled,
        jnp.zeros(CODE_LEN), th=0.05, max_grad_points=512,
    )
    assert int(out.n_valid) > 50
    live = np.asarray(out.mask)
    assert live.sum() > 0
    # occupancy-ramp rendering biases depth near the silhouette; the bulk of
    # residuals should still be small at ground truth
    r = np.abs(np.asarray(out.res))[live]
    assert np.median(r) < 0.1
    assert r.mean() < 0.18


def cfg(**kw):
    base = dict(
        code_len=CODE_LEN, num_depth_samples=50, cut_off_threshold=0.05,
        k1=1.0, k2=100.0, k3=0.05, k4=0.0, b1=0.20, b2=0.05,
        num_iterations=12, learning_rate=0.8, scale_damping=1.0,
        max_grad_points=512,
    )
    base.update(kw)
    return ReconConfig(**base)


def test_reconstruct_recovers_shape_code():
    """Correct pose, wrong (zero) code: GN should find the true radius."""
    rng = np.random.default_rng(2)
    code_true = np.array([0.5, 0, 0, 0], np.float32)  # radius 0.6
    r_true = R_BASE + R_GAIN * code_true[0]
    T = gt_pose()
    pts_cam, rays, depth_obs, fg = make_observations(rng, T, r_true)
    res = reconstruct_object(
        PARAMS, SPEC, cfg(), jnp.asarray(T), jnp.asarray(pts_cam),
        jnp.ones(len(pts_cam), bool), jnp.asarray(rays),
        jnp.ones(len(rays), bool), jnp.asarray(depth_obs), jnp.asarray(fg),
    )
    assert bool(res.is_good)
    # Sim(3) scale and code share a gauge: the observable is the *effective*
    # radius in camera frame, scale · (R_BASE + R_GAIN·c0)
    scale = float(lie.sim3_scale(res.t_cam_obj))
    r_rec = scale * (R_BASE + R_GAIN * float(res.code[0]))
    np.testing.assert_allclose(r_rec, r_true, atol=0.03)
    assert float(res.loss) < 0.5


def test_reconstruct_recovers_pose_offset():
    """Correct code, perturbed initial pose: GN should pull pose back."""
    rng = np.random.default_rng(3)
    T = gt_pose()
    pts_cam, rays, depth_obs, fg = make_observations(rng, T, R_BASE)
    T0 = T.copy()
    T0[:3, 3] += [0.15, -0.1, 0.2]
    res = reconstruct_object(
        PARAMS, SPEC, cfg(k3=0.5), jnp.asarray(T0), jnp.asarray(pts_cam),
        jnp.ones(len(pts_cam), bool), jnp.asarray(rays),
        jnp.ones(len(rays), bool), jnp.asarray(depth_obs), jnp.asarray(fg),
    )
    assert bool(res.is_good)
    t_err = np.linalg.norm(np.asarray(res.t_cam_obj)[:3, 3] - T[:3, 3])
    t_err0 = np.linalg.norm(T0[:3, 3] - T[:3, 3])
    assert t_err < 0.3 * t_err0  # large reduction of the initial offset


def test_pose_only_estimate():
    rng = np.random.default_rng(4)
    scale = 1.0
    T = gt_pose(scale)
    pts_cam, *_ = make_observations(rng, T, R_BASE)
    T0 = T.copy()
    T0[:3, 3] += [0.1, 0.05, -0.12]
    t_rec, loss = estimate_pose_cam_obj(
        PARAMS, SPEC, cfg(pose_only_iterations=6), jnp.asarray(T0), scale,
        jnp.asarray(pts_cam), jnp.ones(len(pts_cam), bool),
        jnp.zeros(CODE_LEN),
    )
    t_err = np.linalg.norm(np.asarray(t_rec)[:3, 3] - T[:3, 3])
    t_err0 = np.linalg.norm(T0[:3, 3] - T[:3, 3])
    assert t_err < 0.3 * t_err0
    assert float(loss) < 0.05


def test_failure_flag_on_no_valid_samples():
    """Object far outside the sampled depth range -> too few valid points."""
    rng = np.random.default_rng(5)
    T = gt_pose()
    pts_cam, rays, depth_obs, fg = make_observations(rng, T, R_BASE)
    T_bad = T.copy()
    T_bad[:3, 3] = [50.0, 50.0, 200.0]  # rays never enter the unit sphere
    res = reconstruct_object(
        PARAMS, SPEC, cfg(), jnp.asarray(T_bad), jnp.asarray(pts_cam),
        jnp.ones(len(pts_cam), bool), jnp.asarray(rays),
        jnp.ones(len(rays), bool), jnp.asarray(depth_obs), jnp.asarray(fg),
    )
    assert not bool(res.is_good)


def test_batched_vmap_objects():
    from dsp_slam_rgbd_tpu.recon.optimizer import reconstruct_objects_batched

    rng = np.random.default_rng(6)
    T = gt_pose()
    B = 3
    pts, rays, dep, fg = [], [], [], []
    for _ in range(B):
        p, r, d, f = make_observations(rng, T, R_BASE)
        pts.append(p); rays.append(r); dep.append(d); fg.append(f)
    res = reconstruct_objects_batched(
        PARAMS, SPEC, cfg(num_iterations=3),
        jnp.asarray(np.stack([T] * B)), jnp.asarray(np.stack(pts)),
        jnp.ones((B, pts[0].shape[0]), bool), jnp.asarray(np.stack(rays)),
        jnp.ones((B, rays[0].shape[0]), bool), jnp.asarray(np.stack(dep)),
        jnp.asarray(np.stack(fg)), jnp.zeros((B, CODE_LEN)),
    )
    assert res.t_cam_obj.shape == (B, 4, 4)
    assert res.code.shape == (B, CODE_LEN)
    assert bool(jnp.all(res.is_good))


def test_chord_mode_normal_equations_match_dense_linspace():
    """ADVICE r1: the per-ray chord quadrature (production default) must
    produce the same normal-equation aggregates H, b as a dense global
    linspace over d_center ± scale when both run at the same sample density
    — protecting the per-ray delta_d quadrature weight."""
    from dsp_slam_rgbd_tpu.ops import robust

    rng = np.random.default_rng(3)
    T = gt_pose(scale=1.0)  # unit-scale object at ~3 m
    t_obj_cam = lie.inv_sim3(jnp.asarray(T))
    code = jnp.asarray(rng.standard_normal(CODE_LEN) * 0.1, jnp.float32)

    # near-axis foreground rays: their sphere chords ≈ the full diameter, so
    # chord sampling density == linspace density at equal M
    center = T[:3, 3]
    n_rays = 48
    dirs = center[None, :] + 0.03 * rng.standard_normal((n_rays, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    rays = jnp.asarray(dirs.astype(np.float32))
    ray_mask = jnp.ones(n_rays, bool)
    d_center = float(T[2, 3])
    depth_obs = jnp.full((n_rays,), d_center - 0.45)  # near-surface depths
    M = 400
    d_max = jnp.asarray(d_center + 1.0)

    def aggregates(sampled, extra_mask=None):
        mask = ray_mask if extra_mask is None else ray_mask & extra_mask
        ren = losses.compute_render_loss(
            PARAMS, SPEC, rays, mask, depth_obs, t_obj_cam, sampled, code,
            th=0.05, max_grad_points=8192, max_valid_samples=32768,
            d_max=d_max,
        )
        rr, _, _ = robust.robust_residuals(ren.res, 0.20, ren.mask)
        J = jnp.concatenate([ren.jac_pose, ren.jac_code], axis=-1)
        n = jnp.maximum(jnp.sum(ren.mask), 1).astype(jnp.float32)
        Jm = jnp.where(ren.mask[:, None], J, 0.0)
        H = (Jm.T @ Jm) / n
        b = -(Jm.T @ jnp.where(ren.mask, rr, 0.0)) / n
        return np.asarray(H), np.asarray(b)

    sampled_chord, hit = losses.chord_sample_depths(t_obj_cam, rays, M)
    H_c, b_c = aggregates(sampled_chord, hit)
    lin = jnp.linspace(d_center - 1.0, d_center + 1.0, M)
    H_l, b_l = aggregates(lin)

    assert np.linalg.norm(H_c - H_l) <= 0.12 * np.linalg.norm(H_l), (
        np.linalg.norm(H_c - H_l) / np.linalg.norm(H_l)
    )
    assert np.linalg.norm(b_c - b_l) <= 0.15 * max(np.linalg.norm(b_l), 1e-6), (
        np.linalg.norm(b_c - b_l) / max(np.linalg.norm(b_l), 1e-6)
    )
