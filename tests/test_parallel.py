import jax
import jax.numpy as jnp
import numpy as np

from dsp_slam_rgbd_tpu.parallel import mesh as meshmod
from dsp_slam_rgbd_tpu.parallel import sharded_recon
from dsp_slam_rgbd_tpu.recon.optimizer import ReconConfig

from test_recon import CODE_LEN, PARAMS, SPEC, gt_pose, make_observations, R_BASE


def make_batch(B=8, n_pts=128, n_rays=96):
    rng = np.random.default_rng(0)
    T = gt_pose()
    pts, rays, dep, fg = [], [], [], []
    for _ in range(B):
        p, r, d, f = make_observations(rng, T, R_BASE, n_pts=n_pts,
                                       n_rays=n_rays)
        pts.append(p); rays.append(r); dep.append(d); fg.append(f)
    return {
        "t_cam_obj": jnp.asarray(np.stack([T] * B)),
        "pts": jnp.asarray(np.stack(pts)),
        "pts_mask": jnp.ones((B, n_pts), bool),
        "rays": jnp.asarray(np.stack(rays)),
        "ray_mask": jnp.ones((B, n_rays), bool),
        "depth_obs": jnp.asarray(np.stack(dep)),
        "fg_mask": jnp.asarray(np.stack(fg)),
        "code_init": jnp.zeros((B, CODE_LEN)),
    }


def test_mesh_creation():
    m = meshmod.make_mesh()
    assert m.devices.size == 8
    m2 = meshmod.make_mesh(n_obj=4, n_ray=2)
    assert m2.shape == {"obj": 4, "ray": 2}


def test_sharded_ba_matches_single_device():
    from dsp_slam_rgbd_tpu.mapping import ba
    from dsp_slam_rgbd_tpu.parallel import sharded_ba
    from test_mapping import CAM, pose_errors, sim_ba_problem

    rng = np.random.default_rng(11)
    prob, kf_true, pts_true, _ = sim_ba_problem(rng, stereo=True)
    ref = ba.local_ba(CAM, prob)

    m = meshmod.make_mesh(n_obj=1, n_ray=8)
    out = sharded_ba.run_sharded_ba(CAM, prob, m)
    # same optimum (reduction order may differ slightly)
    np.testing.assert_allclose(np.asarray(out.kf_pose),
                               np.asarray(ref.kf_pose), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.pts), np.asarray(ref.pts),
                               atol=1e-3)
    err = pose_errors(np.asarray(out.kf_pose), kf_true)
    assert err.mean() < 0.02


def test_sharded_recon_matches_single_device():
    cfg = ReconConfig(code_len=CODE_LEN, num_iterations=3, k4=0.0,
                      cut_off_threshold=0.05, b2=0.05, max_grad_points=256)
    batch = make_batch(B=8)
    m = meshmod.make_mesh(n_obj=4, n_ray=2)
    out_sharded = sharded_recon.reconstruct_sharded(PARAMS, SPEC, cfg, batch, m)

    m1 = meshmod.make_mesh(n_obj=1, n_ray=1, devices=jax.devices()[:1])
    out_single = sharded_recon.reconstruct_sharded(PARAMS, SPEC, cfg, batch, m1)

    np.testing.assert_allclose(
        np.asarray(out_sharded.code), np.asarray(out_single.code), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out_sharded.t_cam_obj), np.asarray(out_single.t_cam_obj),
        atol=1e-4,
    )
    assert bool(jnp.all(out_sharded.is_good))


def test_sharded_pcg_matches_replicated():
    """Explicitly sharded PCG (edge block rows over the mesh, hand-placed
    psum boundary exchange) matches the single-device PCG solve."""
    from dsp_slam_rgbd_tpu.mapping import ba
    from dsp_slam_rgbd_tpu.parallel import sharded_ba
    from test_mapping import CAM, pose_errors, sim_ba_problem

    rng = np.random.default_rng(13)
    prob, kf_true, pts_true, _ = sim_ba_problem(rng, stereo=True)
    ref = ba.global_ba_pcg(CAM, prob)

    m = meshmod.make_mesh(n_obj=1, n_ray=8)
    out = sharded_ba.global_ba_pcg_sharded(CAM, prob, m)
    # psum reduction order differs from the single-device sum, so the LM
    # trajectory can diverge by f32 noise — compare optima loosely and the
    # ground-truth recovery tightly
    np.testing.assert_allclose(np.asarray(out.kf_pose),
                               np.asarray(ref.kf_pose), atol=2e-2)
    np.testing.assert_allclose(np.asarray(out.pts), np.asarray(ref.pts),
                               atol=5e-2)
    err = pose_errors(np.asarray(out.kf_pose), kf_true)
    err_ref = pose_errors(np.asarray(ref.kf_pose), kf_true)
    assert err.mean() < max(0.05, 1.5 * err_ref.mean())
