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
