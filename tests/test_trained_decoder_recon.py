"""Reconstruction accuracy + precision-policy validation on a TRAINED decoder.

Random-weight decoders make GN behavior chaotic, so precision experiments on
them are meaningless.  This uses the committed fixture
(tests/fixtures/ellipsoid_decoder_64.npz — the real cars_64 8x512 arch
trained on an ellipsoid family by tools/train_fixture_decoder.py) to assert:

  1. the joint Sim(3)+code GN actually converges on a real MLP latent space
     (pose error shrinks several-fold from a perturbed init), and
  2. the validated TPU production preset (ReconConfig.tpu_fast() + bf16,
     see recon/optimizer.py) lands at the same optimum as the faithful
     f32-HIGH path.

Geometry conventions mirror the KITTI path (reference
`reconstruct/kitti_sequence.py:118-146`): camera y down, object up = -y_cam
(the k4 vertical-axis prior enforces this, `loss.py:169-192`).
"""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dsp_slam_rgbd_tpu.models import deepsdf
from dsp_slam_rgbd_tpu.ops import lie
from dsp_slam_rgbd_tpu.recon.optimizer import ReconConfig, reconstruct_object

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "ellipsoid_decoder_64.npz")


def code_to_axes(code):
    # latent->shape mapping the fixture was trained on
    # (tools/train_fixture_decoder.py)
    return 0.30 + 0.12 * jnp.tanh(code[..., :3])


def _first_hit_depth(rays, T_co, s, axes):
    """True first ray-ellipsoid intersection depth (camera at origin).

    A rendered-depth observation is the FIRST surface hit; using the depth
    of a far-side surface point biases the render term outward.
    """
    R = T_co[:3, :3] / s
    u = (R.T @ rays.T).T / s / axes          # (N, 3)
    v = (R.T @ (-T_co[:3, 3])) / s / axes    # (3,)
    a = np.sum(u * u, axis=1)
    b = 2.0 * u @ v
    c = v @ v - 1.0
    disc = np.sqrt(np.maximum(b * b - 4 * a * c, 0.0))
    return (-b - disc) / (2.0 * a)


def make_problem(seed: int = 3):
    params, spec = deepsdf.load_npz(FIXTURE)
    rng = np.random.default_rng(seed)

    code_gt = jnp.asarray(rng.standard_normal(64), jnp.float32)
    axes = np.asarray(code_to_axes(code_gt))
    s_gt, yaw = 2.0, 0.35
    Ry = np.array([[np.cos(yaw), 0, np.sin(yaw)], [0, 1, 0],
                   [-np.sin(yaw), 0, np.cos(yaw)]], np.float32)
    R = Ry @ np.diag([1.0, -1.0, -1.0]).astype(np.float32)
    t_gt = np.array([0.5, -0.2, 8.0], np.float32)
    T_co_gt = np.eye(4, dtype=np.float32)
    T_co_gt[:3, :3] = s_gt * R
    T_co_gt[:3, 3] = t_gt

    N_PTS, N_RAYS = 128, 128
    dirs = rng.standard_normal((N_PTS, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    pts_cam = (T_co_gt[:3, :3] @ (dirs * axes).T).T + t_gt

    # foreground rays: first-hit depths; background rays (as in the
    # reference, ~200 of ~450: kitti_sequence.py:203-205): directions past
    # the silhouette, depth recomputed to 1.1*d_max inside the optimizer.
    N_FG = (3 * N_RAYS) // 4
    dirs2 = rng.standard_normal((N_FG, 3))
    dirs2 /= np.linalg.norm(dirs2, axis=1, keepdims=True)
    p2 = (T_co_gt[:3, :3] @ (dirs2 * axes).T).T + t_gt
    rays_fg = p2 / np.linalg.norm(p2, axis=1, keepdims=True)
    depth_fg = _first_hit_depth(rays_fg, T_co_gt, s_gt, axes)

    dirs3 = rng.standard_normal((N_RAYS - N_FG, 3))
    dirs3 /= np.linalg.norm(dirs3, axis=1, keepdims=True)
    p3 = (T_co_gt[:3, :3] @ (dirs3 * axes * 1.35).T).T + t_gt
    rays_bg = p3 / np.linalg.norm(p3, axis=1, keepdims=True)

    rays = np.concatenate([rays_fg, rays_bg], axis=0)
    depth = np.concatenate([depth_fg, np.zeros(N_RAYS - N_FG)], axis=0)
    fg_mask = np.zeros(N_RAYS, bool)
    fg_mask[:N_FG] = True

    dx = np.concatenate([rng.standard_normal(3) * 0.15,
                         rng.standard_normal(3) * 0.03, [0.05]])
    T_init = np.asarray(lie.exp_sim3(jnp.asarray(dx, jnp.float32))) @ T_co_gt

    return dict(
        params=params, spec=spec, T_init=jnp.asarray(T_init),
        T_co_gt=T_co_gt, t_gt=t_gt, s_gt=s_gt, R=R,
        pts=jnp.asarray(pts_cam, jnp.float32),
        rays=jnp.asarray(rays, jnp.float32),
        depth=jnp.asarray(depth, jnp.float32),
        fg_mask=jnp.asarray(fg_mask),
        n_pts=N_PTS, n_rays=N_RAYS,
    )


@pytest.fixture(scope="module")
def problem():
    return make_problem(3)


def _fit(problem, cfg, dtype):
    out = reconstruct_object(
        problem["params"], problem["spec"], cfg, problem["T_init"],
        problem["pts"], jnp.ones(problem["n_pts"], bool),
        problem["rays"], jnp.ones(problem["n_rays"], bool),
        problem["depth"], problem["fg_mask"],
        compute_dtype=dtype,
    )
    T = np.asarray(out.t_cam_obj)
    s = np.cbrt(np.linalg.det(T[:3, :3]))
    t_err = np.linalg.norm(T[:3, 3] - problem["t_gt"])
    s_err = abs(s - problem["s_gt"])
    cosang = (np.trace((T[:3, :3] / s).T @ problem["R"]) - 1) / 2
    r_err = np.degrees(np.arccos(np.clip(cosang, -1, 1)))
    return out, t_err, s_err, r_err


# CPU-sized budget: KITTI's 10 iters, small grad-compaction cap
CFG_FAITHFUL = ReconConfig(num_iterations=10, max_grad_points=512)
CFG_FAST = ReconConfig.tpu_fast(num_iterations=10, max_grad_points=512)
# precision-only subset of the production preset: bf16 MXU + 1-pass value
# sweep with the algorithmic FLOPs cuts disabled — comparable to the
# faithful path ITERATION BY ITERATION, so a strict single-instance band
# applies
CFG_FAST_PRECISION_ONLY = ReconConfig.tpu_fast(
    num_iterations=10, max_grad_points=512,
    coarse_iterations=0, coarse_samples=0, active_ray_fraction=1.0)


@pytest.fixture(scope="module")
def faithful_fit(problem):
    return _fit(problem, CFG_FAITHFUL, jnp.float32)


def test_gn_converges_on_trained_decoder(problem, faithful_fit):
    T0 = np.asarray(problem["T_init"])
    t_err0 = np.linalg.norm(T0[:3, 3] - problem["t_gt"])
    out, t_err, s_err, r_err = faithful_fit
    assert bool(out.is_good)
    # convergence, not exact recovery: the k3 code-Tikhonov (faithful to the
    # reference) biases shape toward the latent mean, so pose errors floor
    # at the regularized optimum (~0.2 m / ~4 deg at 20 iters on this
    # geometry); the KITTI 10-iteration budget gets partway there
    assert t_err < 0.65 * t_err0
    assert s_err < 0.10
    assert r_err < 12.0


def test_tpu_fast_precision_matches_faithful(problem, faithful_fit):
    """The PRECISION part of the production preset (bf16 MXU, 1-pass value
    sweep) follows the faithful f32 path within a tight single-instance
    band: same sample positions every iteration, only rounding differs."""
    _, t_f, s_f, r_f = faithful_fit
    out, t_q, s_q, r_q = _fit(problem, CFG_FAST_PRECISION_ONLY, jnp.bfloat16)
    assert bool(out.is_good)
    # same optimum within noise (on this problem: 0.5106 vs 0.5126 m)
    assert abs(t_q - t_f) < 0.05
    assert abs(s_q - s_f) < 0.05
    assert abs(r_q - r_f) < 2.0


def test_tpu_fast_algorithmic_cuts_match_quality(problem):
    """The ALGORITHMIC parts of the production preset (coarse-to-fine
    sampling + fine-phase active-ray compaction, ~2x fewer value-pass
    FLOPs) change the GN path, so single-instance comparison measures path
    chaos, not quality.  Validate on MEAN converged error over several
    problem instances instead: the preset must match the faithful
    configuration's mean pose/scale/rotation error within a fraction of
    the per-instance scatter (measured: Δmean ≈ 0.03-0.07 vs σ ≈ 0.3-0.5).

    Both configs run as one vmapped program over the instance batch.
    """
    from dsp_slam_rgbd_tpu.recon.optimizer import reconstruct_objects_batched

    seeds = [3, 4, 5, 6, 7, 8]
    probs = [make_problem(s) for s in seeds]
    params, spec = probs[0]["params"], probs[0]["spec"]

    def batch_errs(cfg, dtype):
        B = len(probs)
        stack = lambda k: jnp.stack([p[k] for p in probs])
        out = reconstruct_objects_batched(
            params, spec, cfg, stack("T_init"), stack("pts"),
            jnp.ones((B, probs[0]["n_pts"]), bool), stack("rays"),
            jnp.ones((B, probs[0]["n_rays"]), bool), stack("depth"),
            stack("fg_mask"), jnp.zeros((B, cfg.code_len)),
            compute_dtype=dtype)
        T = np.asarray(out.t_cam_obj)
        errs = []
        for i, p in enumerate(probs):
            s = np.cbrt(np.linalg.det(T[i, :3, :3]))
            t_err = np.linalg.norm(T[i, :3, 3] - p["t_gt"])
            cosang = (np.trace((T[i, :3, :3] / s).T @ p["R"]) - 1) / 2
            errs.append([t_err, abs(s - p["s_gt"]),
                         np.degrees(np.arccos(np.clip(cosang, -1, 1)))])
        assert np.asarray(out.is_good).all()
        return np.asarray(errs)

    e_faith = batch_errs(CFG_FAITHFUL, jnp.float32)
    e_fast = batch_errs(CFG_FAST, jnp.bfloat16)
    d = np.abs(e_fast.mean(0) - e_faith.mean(0))
    assert d[0] < 0.10, f"mean translation error drifted: {d[0]:.3f} m"
    assert d[1] < 0.10, f"mean scale error drifted: {d[1]:.3f}"
    assert d[2] < 2.5, f"mean rotation error drifted: {d[2]:.2f} deg"
