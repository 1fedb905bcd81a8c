"""Numerical parity against the REFERENCE implementation itself.

Imports the reference's `reconstruct/loss.py` + `loss_utils.py` (pure
torch+numpy), patches `.cuda()` to a no-op, and compares our masked JAX
losses/Jacobians and Lie maps against them on identical inputs — the
strongest available evidence that the GN semantics match
(SURVEY.md §7: milestone A "numerically comparable").
"""
import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"

import jax.numpy as jnp

from dsp_slam_rgbd_tpu.models import deepsdf
from dsp_slam_rgbd_tpu.ops import lie, robust
from dsp_slam_rgbd_tpu.recon import losses


@pytest.fixture(scope="module")
def ref_modules():
    """Load reference loss modules without executing reconstruct/__init__
    (which needs mmdet), with cuda() patched out."""
    import os

    if not os.path.isdir(REF):
        pytest.skip("reference not present")
    # no-op CUDA for CPU-only torch
    torch.Tensor.cuda = lambda self, *a, **k: self
    if not torch.cuda.is_available():
        torch.cuda.synchronize = lambda *a, **k: None

    pkg = types.ModuleType("reconstruct")
    pkg.__path__ = [f"{REF}/reconstruct"]
    sys.modules.setdefault("reconstruct", pkg)

    def load(name):
        spec = importlib.util.spec_from_file_location(
            f"reconstruct.{name}", f"{REF}/reconstruct/{name}.py"
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"reconstruct.{name}"] = mod
        spec.loader.exec_module(mod)
        return mod

    lu = load("loss_utils")
    ls = load("loss")
    return lu, ls


CODE_LEN = 8
R_BASE = 0.5
R_GAIN = 0.2


def torch_sphere_decoder(inputs):
    """Analytic sphere decoder in torch with the reference's calling
    convention (…, code+3) -> (…, 1)."""
    code = inputs[..., :CODE_LEN]
    xyz = inputs[..., CODE_LEN:]
    r = R_BASE + R_GAIN * code[..., 0:1]
    return torch.linalg.norm(xyz, dim=-1, keepdim=True) - r


def jax_sphere_fn(params, inputs):
    code = inputs[..., :CODE_LEN]
    xyz = inputs[..., CODE_LEN:]
    r = R_BASE + R_GAIN * code[..., 0]
    return jnp.linalg.norm(xyz, axis=-1) - r


SPEC = deepsdf.AnalyticSdfSpec(latent_size=CODE_LEN, fn=jax_sphere_fn)


def make_pose():
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = np.asarray(lie.exp_so3(jnp.asarray([0.06, -0.12, 0.04])))
    T[:3, 3] = [0.3, -0.2, 4.0]
    return T


def test_exp_maps_match_reference(ref_modules):
    lu, _ = ref_modules
    rng = np.random.default_rng(0)
    for scale in (1e-9, 0.01, 0.6):
        x6 = (rng.standard_normal(6) * scale).astype(np.float32)
        ref = lu.exp_se3(torch.from_numpy(x6)).numpy()
        ours = np.asarray(lie.exp_se3(jnp.asarray(x6)))
        np.testing.assert_allclose(ours, ref, atol=2e-6)
        x7 = np.concatenate([x6, [0.2 * scale]]).astype(np.float32)
        ref7 = lu.exp_sim3(torch.from_numpy(x7)).numpy()
        ours7 = np.asarray(lie.exp_sim3(jnp.asarray(x7)))
        np.testing.assert_allclose(ours7, ref7, atol=2e-6)


def test_huber_matches_reference(ref_modules):
    lu, _ = ref_modules
    rng = np.random.default_rng(1)
    res = rng.standard_normal(200).astype(np.float32) * 0.1
    rr_ref, loss_ref, w_ref = lu.get_robust_res(
        torch.from_numpy(res.copy()), 0.05
    )
    rr, loss, w = robust.robust_residuals(jnp.asarray(res), 0.05)
    np.testing.assert_allclose(np.asarray(rr),
                               rr_ref.numpy().reshape(-1), atol=1e-6)
    np.testing.assert_allclose(float(loss), float(loss_ref), atol=1e-6)


def test_sdf_loss_matches_reference(ref_modules):
    lu, ls = ref_modules
    rng = np.random.default_rng(2)
    T_co = make_pose()
    t_obj_cam = np.asarray(lie.inv_se3(jnp.asarray(T_co)))
    n = 64
    d = rng.standard_normal((n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    pts_obj = (d * 0.55).astype(np.float32)
    pts_cam = pts_obj @ T_co[:3, :3].T + T_co[:3, 3]
    code = np.zeros(CODE_LEN, np.float32)
    code[0] = 0.3

    jac_ref, jac_code_ref, res_ref = ls.compute_sdf_loss(
        torch_sphere_decoder, torch.from_numpy(pts_cam),
        torch.from_numpy(t_obj_cam), torch.from_numpy(code),
    )
    out = losses.compute_sdf_loss(
        {"layers": []}, SPEC, jnp.asarray(pts_cam), jnp.ones(n, bool),
        jnp.asarray(t_obj_cam), jnp.asarray(code),
    )
    np.testing.assert_allclose(np.asarray(out.res),
                               res_ref.numpy().reshape(-1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.jac_pose),
                               jac_ref.numpy().reshape(n, 7), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.jac_code),
                               jac_code_ref.numpy().reshape(n, CODE_LEN),
                               atol=1e-4)


def test_render_loss_normal_equations_match_reference(ref_modules):
    """The render loss gathers variable-size point sets in the reference and
    masked fixed arrays here — compare the GN-relevant aggregates
    H = ΣJᵀJ/K and b = Σ Jᵀ robust_res /K instead of raw rows."""
    lu, ls = ref_modules
    rng = np.random.default_rng(3)
    T_co = make_pose()
    t_obj_cam = np.asarray(lie.inv_se3(jnp.asarray(T_co)))
    R = 96
    # rays toward the object center with jitter
    center_dir = T_co[:3, 3] / np.linalg.norm(T_co[:3, 3])
    rays = center_dir[None, :] + 0.12 * rng.standard_normal((R, 3))
    rays = (rays / rays[:, 2:3]).astype(np.float32)  # z=1 convention
    depth_obs = np.full(R, float(T_co[2, 3]), np.float32) \
        + 0.1 * rng.standard_normal(R).astype(np.float32)
    M = 24
    d_min, d_max = T_co[2, 3] - 1.0, T_co[2, 3] + 1.0
    sampled = np.linspace(d_min, d_max, M).astype(np.float32)
    code = np.zeros(CODE_LEN, np.float32)
    th = 0.05

    ref_out = ls.compute_render_loss(
        torch_sphere_decoder, torch.from_numpy(rays),
        torch.from_numpy(depth_obs), torch.from_numpy(t_obj_cam),
        torch.from_numpy(sampled), torch.from_numpy(code), th=th,
    )
    assert ref_out is not None
    jr_pose, jr_code, res_r = ref_out
    k_ref = jr_pose.shape[0]
    J_ref = torch.cat([jr_pose, jr_code], dim=-1).numpy().reshape(k_ref, -1)
    rr_ref, _, _ = lu.get_robust_res(res_r, 0.20)
    H_ref = (J_ref.T @ J_ref) / k_ref
    b_ref = -(J_ref.T @ rr_ref.numpy().reshape(-1)) / k_ref

    ours = losses.compute_render_loss(
        {"layers": []}, SPEC, jnp.asarray(rays), jnp.ones(R, bool),
        jnp.asarray(depth_obs), jnp.asarray(t_obj_cam),
        jnp.asarray(sampled), jnp.asarray(code), th=th,
        max_grad_points=1024,
    )
    k_ours = int(ours.mask.sum())
    assert k_ours == k_ref  # same gradient-point selection
    J = np.concatenate([np.asarray(ours.jac_pose),
                        np.asarray(ours.jac_code)], axis=1)
    J = np.where(np.asarray(ours.mask)[:, None], J, 0.0)
    rr, _, _ = robust.robust_residuals(ours.res, 0.20, ours.mask)
    rr = np.where(np.asarray(ours.mask), np.asarray(rr), 0.0)
    H = (J.T @ J) / k_ours
    b = -(J.T @ rr) / k_ours
    np.testing.assert_allclose(H, H_ref, atol=2e-4)
    np.testing.assert_allclose(b, b_ref, atol=2e-4)


def test_rotation_prior_matches_reference(ref_modules):
    _, ls = ref_modules
    t_obj_cam = np.asarray(lie.inv_se3(jnp.asarray(make_pose())))
    J_ref, res_ref = ls.compute_rotation_loss_sim3(
        torch.from_numpy(t_obj_cam.copy())
    )
    J, res = losses.compute_rotation_loss_sim3(jnp.asarray(t_obj_cam))
    np.testing.assert_allclose(float(res), float(res_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(J), np.asarray(J_ref), atol=1e-5)


@pytest.fixture(scope="module")
def ref_optimizer_cls(ref_modules):
    """Load the reference's `reconstruct/optimizer.py` with its heavy
    dependencies (`reconstruct.utils` → skimage/addict/open3d, absent in
    this env) stubbed to the two symbols the optimizer actually touches."""
    utils_stub = types.ModuleType("reconstruct.utils")

    class ForceKeyErrorDict(dict):
        def __getattr__(self, k):
            return self[k]

        def __setattr__(self, k, v):
            self[k] = v

    utils_stub.ForceKeyErrorDict = ForceKeyErrorDict
    utils_stub.create_voxel_grid = None
    utils_stub.convert_sdf_voxels_to_mesh = None
    sys.modules["reconstruct.utils"] = utils_stub

    spec = importlib.util.spec_from_file_location(
        "reconstruct.optimizer", f"{REF}/reconstruct/optimizer.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["reconstruct.optimizer"] = mod
    spec.loader.exec_module(mod)
    return mod.Optimizer, ForceKeyErrorDict


# ellipsoid decoder for the full-trajectory test: distinct axes make
# rotation OBSERVABLE — a sphere leaves the k4-weighted rotation direction
# in the data null space and the two GN trajectories then split on f32
# tie-breaking noise rather than on semantics
ELL_AXES = np.array([0.72, 0.44, 0.58], np.float32)


def torch_ellipsoid_decoder(inputs):
    xyz = inputs[..., CODE_LEN:]
    code = inputs[..., :CODE_LEN]
    axes = torch.from_numpy(ELL_AXES) * (1.0 + 0.2 * code[..., :3])
    return torch.linalg.norm(xyz / axes, dim=-1, keepdim=True) - 1.0


def jax_ellipsoid_fn(params, inputs):
    xyz = inputs[..., CODE_LEN:]
    code = inputs[..., :CODE_LEN]
    axes = jnp.asarray(ELL_AXES) * (1.0 + 0.2 * code[..., :3])
    return jnp.linalg.norm(xyz / axes, axis=-1) - 1.0


ELL_SPEC = deepsdf.AnalyticSdfSpec(latent_size=CODE_LEN,
                                   fn=jax_ellipsoid_fn)


def _parity_problem(rng):
    """Ellipsoid-world reconstruction inputs shared verbatim by both
    sides.  Ground truth: zero-code ellipsoid (axes ELL_AXES) at scale
    s_gt, identity orientation, center `c`."""
    n_pts, n_fg, n_bg = 96, 72, 24
    s_gt = 0.9
    center = np.array([0.25, -0.1, 4.0], np.float32)

    u = rng.standard_normal((n_pts, 3)).astype(np.float32)
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    pts_cam = center + s_gt * (ELL_AXES * u)  # on the surface

    def first_hit(rays):
        # first ray-ellipsoid intersection: |(t·d − c) / (s·a)| = 1
        d = rays / (s_gt * ELL_AXES)
        v = -center / (s_gt * ELL_AXES)
        a = np.sum(d * d, axis=1)
        b = 2.0 * d @ v
        cc = v @ v - 1.0
        disc = np.sqrt(np.maximum(b * b - 4 * a * cc, 0.0))
        return (-b - disc) / (2.0 * a)

    u2 = rng.standard_normal((n_fg, 3)).astype(np.float32)
    u2 /= np.linalg.norm(u2, axis=1, keepdims=True)
    p2 = center + s_gt * (ELL_AXES * u2)
    rays_fg = (p2 / np.linalg.norm(p2, axis=1, keepdims=True)).astype(
        np.float32)
    depth_fg = first_hit(rays_fg).astype(np.float32)

    d3 = rng.standard_normal((n_bg, 3)).astype(np.float32)
    d3 /= np.linalg.norm(d3, axis=1, keepdims=True)
    rays_bg = (center * 1.6 + 2.0 * s_gt * (ELL_AXES * d3))
    rays_bg = (rays_bg / np.linalg.norm(rays_bg, axis=1, keepdims=True)
               ).astype(np.float32)

    T0 = np.eye(4, dtype=np.float32)
    T0[:3, :3] = np.asarray(
        lie.exp_so3(jnp.asarray([0.0, 0.05, 0.0]))) * 1.1 * s_gt
    T0[:3, 3] = center + [0.06, -0.04, 0.1]
    rays = np.concatenate([rays_fg, rays_bg])
    return T0, pts_cam, rays, depth_fg


def test_full_reconstruct_trajectory_matches_reference(ref_modules,
                                                       ref_optimizer_cls):
    """END-TO-END optimizer parity: the reference's own `reconstruct_object`
    GN loop (`/root/reference/reconstruct/optimizer.py:90-205`, executed
    under torch with the losses un-stubbed) against our jitted loop in
    strict-parity mode (`chord_sampling=False`: the same global-linspace
    depth sampling), on identical inputs — poses compared after 1, 2, 3, 6
    and 10 iterations, plus ground-truth error equivalence at the end.

    Why the bands widen with iteration count: the loop is f32 and its
    normal-equation solve runs at condition ~1e5 (the k4 = 1e7 rotation
    prior), so trajectories amplify rounding noise.  MEASURED: the
    reference against ITSELF with a 1e-6 input perturbation diverges to
    dT = 0.7 by iteration 10 at the KITTI scale_damping=1 — per-iteration
    bitwise tracking at depth 10 is unattainable for any reimplementation
    (or for the reference on different hardware).  The test therefore runs
    the trajectory at scale_damping=20 (both sides), where the dynamics
    are stable and coupling is assertable at every depth; per-term H/b
    equality at the KITTI constants is covered by the term-level tests
    above."""
    Optimizer, FKED = ref_optimizer_cls
    rng = np.random.default_rng(11)
    T0, pts_cam, rays, depth_fg = _parity_problem(rng)
    n_rays = len(rays)
    n_fg = len(depth_fg)
    center = np.array([0.25, -0.1, 4.0], np.float32)
    s_gt = 0.9

    from dsp_slam_rgbd_tpu.recon.optimizer import (ReconConfig,
                                                   reconstruct_object)

    for iters, tol_t in ((1, 2e-4), (2, 1e-2), (3, 5e-2), (6, 0.12),
                         (10, 0.12)):
        cfg_ref = FKED(
            data_type="Other",
            optimizer=FKED(
                code_len=CODE_LEN, num_depth_samples=50,
                cut_off_threshold=0.01,
                joint_optim=FKED(k1=1.0, k2=100.0, k3=0.25, k4=1e7,
                                 b1=0.20, b2=0.025,
                                 num_iterations=iters, learning_rate=1.0,
                                 scale_damping=20.0),
            ),
        )
        ref_opt = Optimizer(torch_ellipsoid_decoder, cfg_ref)
        ref_out = ref_opt.reconstruct_object(
            T0.astype(np.float32), pts_cam.copy(), rays.copy(),
            depth_fg.copy())
        assert ref_out.is_good

        cfg = ReconConfig(code_len=CODE_LEN, num_depth_samples=50,
                          num_iterations=iters, chord_sampling=False,
                          max_grad_points=4096, max_valid_samples=8192,
                          scale_damping=20.0)
        out = reconstruct_object(
            {}, ELL_SPEC, cfg, jnp.asarray(T0), jnp.asarray(pts_cam),
            jnp.ones(len(pts_cam), bool), jnp.asarray(rays),
            jnp.ones(n_rays, bool),
            jnp.concatenate([jnp.asarray(depth_fg),
                             jnp.zeros(n_rays - n_fg)]),
            jnp.arange(n_rays) < n_fg,
        )
        assert bool(out.is_good)
        np.testing.assert_allclose(np.asarray(out.t_cam_obj),
                                   ref_out.t_cam_obj, atol=tol_t,
                                   err_msg=f"pose diverged at {iters} iters")

        # ground-truth error equivalence: both implementations sit at the
        # same distance from the true pose at every depth
        def gt_errs(Tm):
            Tm = np.asarray(Tm)
            s = np.cbrt(np.linalg.det(Tm[:3, :3]))
            return (np.linalg.norm(Tm[:3, 3] - center), abs(s - s_gt))

        t_r, s_r = gt_errs(ref_out.t_cam_obj)
        t_o, s_o = gt_errs(out.t_cam_obj)
        assert abs(t_o - t_r) < 0.05, (iters, t_o, t_r)
        assert abs(s_o - s_r) < 0.05, (iters, s_o, s_r)
