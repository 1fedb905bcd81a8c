"""Motion-only pose optimization (batched robust reprojection GN).

Replaces the reference `Optimizer::PoseOptimization` (g2o LM over one SE3
vertex with mono/stereo unary edges, `src/Optimizer.cc:239-451`): 4 rounds of
10 iterations with χ² outlier gating at 5.991 (mono) / 7.815 (stereo) between
rounds (:369-374, outliers re-admitted if their χ² recovers).  Here the gating
is a mask update between jitted GN rounds and the robust kernel is Huber
IRLS — no graph construction, fixed shapes, vmappable over frames.

Conventions: T_cw maps world -> camera; tangent [v, w] left-perturbation
(T_cw' = exp(dx) · T_cw).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from dsp_slam_rgbd_tpu.ops import camera as cam_ops
from dsp_slam_rgbd_tpu.ops import lie

CHI2_MONO = 5.991
CHI2_STEREO = 7.815


class PoseOptResult(NamedTuple):
    t_cw: jnp.ndarray      # (4, 4) optimized pose
    inliers: jnp.ndarray   # (N,) bool
    n_inliers: jnp.ndarray # scalar int32


def _residuals_and_jac(cam, t_cw, pts_w, obs, stereo: bool):
    """Per-point residuals (N, D) and Jacobians (N, D, 6); D=2 mono, 3 stereo."""
    pc = lie.transform_points(t_cw, pts_w)  # (N, 3)
    x, y, z = pc[..., 0], pc[..., 1], pc[..., 2]
    zi = 1.0 / jnp.maximum(z, 1e-6)
    zi2 = zi * zi

    if stereo:
        pred = cam_ops.project_stereo(cam, pc)
    else:
        pred = cam_ops.project(cam, pc)
    res = pred - obs  # (N, D)

    # d(pred)/d(pc):
    du = jnp.stack([cam.fx * zi, jnp.zeros_like(z), -cam.fx * x * zi2], -1)
    dv = jnp.stack([jnp.zeros_like(z), cam.fy * zi, -cam.fy * y * zi2], -1)
    rows = [du, dv]
    if stereo:
        # uR = u − bf/z -> d uR/d pc = du + [0, 0, bf/z²]
        dur = du + jnp.stack(
            [jnp.zeros_like(z), jnp.zeros_like(z), cam.bf * zi2], -1
        )
        rows.append(dur)
        # observations without a right match carry uR = −1: mask the third
        # row so they act as mono edges (same convention as mapping/ba.py)
        has_ur = (obs[..., 2] >= 0.0).astype(res.dtype)
        res = res.at[..., 2].multiply(has_ur)
        dur = dur * has_ur[..., None]
        rows[2] = dur
    dpred_dpc = jnp.stack(rows, axis=-2)  # (N, D, 3)
    dpc_dxi = lie.points_to_pose_jacobian_se3(pc)  # (N, 3, 6)
    J = jnp.einsum("ndk,nkj->ndj", dpred_dpc, dpc_dxi)  # (N, D, 6)
    return res, J


@partial(jax.jit, static_argnames=("cam", "stereo", "n_rounds", "n_iters"))
def optimize_pose(cam, t_cw0, pts_w, obs, inv_sigma2, valid,
                  stereo: bool = False, n_rounds: int = 4,
                  n_iters: int = 10) -> PoseOptResult:
    """Robust GN pose fit.

    obs: (N, 2) pixels or (N, 3) (u, v, uR); inv_sigma2: (N,) per-point
    information (1/σ² of the detection octave); valid: (N,) live slots.
    """
    chi2_th = CHI2_STEREO if stereo else CHI2_MONO
    delta = jnp.sqrt(chi2_th)

    def gn_round(carry, _):
        t_cw, inliers = carry

        def gn_iter(i, t):
            res, J = _residuals_and_jac(cam, t, pts_w, obs, stereo)
            # Huber IRLS weight on the whitened residual norm
            e2 = jnp.sum(res * res, axis=-1) * inv_sigma2  # (N,) chi2
            en = jnp.sqrt(jnp.maximum(e2, 1e-12))
            w_huber = jnp.where(en <= delta, 1.0, delta / en)
            w = inv_sigma2 * w_huber * inliers
            H = jnp.einsum("ndi,ndj,n->ij", J, J, w)
            b = -jnp.einsum("ndi,nd,n->i", J, res, w)
            dx = jnp.linalg.solve(H + 1e-7 * jnp.eye(6), b)
            t_new = lie.exp_se3(dx) @ t
            return jnp.where(jnp.all(jnp.isfinite(dx)), t_new, t)

        t_cw = jax.lax.fori_loop(0, n_iters, gn_iter, t_cw)
        # re-gate: χ² against threshold (outliers may re-enter, :399-417)
        res, _ = _residuals_and_jac(cam, t_cw, pts_w, obs, stereo)
        chi2 = jnp.sum(res * res, axis=-1) * inv_sigma2
        inliers = valid & (chi2 <= chi2_th)
        return (t_cw, inliers.astype(jnp.float32)), None

    init = (jnp.asarray(t_cw0, jnp.float32), valid.astype(jnp.float32))
    (t_cw, inl), _ = jax.lax.scan(gn_round, init, None, length=n_rounds)
    inliers = inl > 0.5
    # SO(3) re-projection: the exp-compose chain leaves an O(eps_f32)
    # orthonormality defect that downstream transpose-inverses AMPLIFY
    # (see lie.orthonormalize_so3) — every returned pose must be clean
    t_cw = lie.orthonormalize_se3(t_cw)
    return PoseOptResult(t_cw, inliers, jnp.sum(inliers).astype(jnp.int32))
