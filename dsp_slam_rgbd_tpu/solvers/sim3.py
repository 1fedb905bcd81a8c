"""Sim(3) / SE(3) alignment: Horn closed form + batched RANSAC.

Covers the reference `Sim3Solver` (`src/Sim3Solver.cc`): Horn's quaternion
method on 3-point sets inside RANSAC with mutual reprojection inlier checks
(:226 ComputeSim3, :340 CheckInliers), scale fixed to 1 for stereo.  The
TPU version runs all trials as one batched eigendecomposition.

Also used for loop-closing relative pose and for trajectory alignment (ATE
evaluation à la the TUM benchmark tooling).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from dsp_slam_rgbd_tpu.ops import camera as cam_ops
from dsp_slam_rgbd_tpu.ops import lie


def horn_align(p1: jnp.ndarray, p2: jnp.ndarray, weights=None,
               fix_scale: bool = False):
    """Closed-form s, R, t minimizing ‖p2 − (s·R·p1 + t)‖².

    p1, p2: (N, 3) correspondences (N ≥ 3).  Returns (4,4) Sim(3) T_21
    (maps frame-1 points into frame 2).  Horn's quaternion method: largest
    eigenvector of the 4x4 N-matrix (reference `Sim3Solver.cc:226-338`).
    """
    if weights is None:
        w = jnp.ones(p1.shape[0])
    else:
        w = weights
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    c1 = jnp.einsum("n,ni->i", w, p1) / wsum
    c2 = jnp.einsum("n,ni->i", w, p2) / wsum
    q1 = p1 - c1
    q2 = p2 - c2

    M = jnp.einsum("n,ni,nj->ij", w, q1, q2)  # (3, 3) covariance
    Sxx, Sxy, Sxz = M[0, 0], M[0, 1], M[0, 2]
    Syx, Syy, Syz = M[1, 0], M[1, 1], M[1, 2]
    Szx, Szy, Szz = M[2, 0], M[2, 1], M[2, 2]
    N = jnp.array(
        [
            [Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx],
            [Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz],
            [Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy],
            [Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz],
        ]
    )
    _, vecs = jnp.linalg.eigh(N)
    q = vecs[:, -1]  # largest eigenvalue -> quaternion (w, x, y, z)
    R = lie.quat_to_rot(q)

    if fix_scale:
        s = jnp.asarray(1.0)
    else:
        # symmetric scale: sqrt(Σ‖q2‖² / Σ‖q1‖²) (Horn's closed form)
        s = jnp.sqrt(
            jnp.einsum("n,ni,ni->", w, q2, q2)
            / jnp.maximum(jnp.einsum("n,ni,ni->", w, q1, q1), 1e-12)
        )
    t = c2 - s * (R @ c1)
    return lie.rt_to_mat(s * R, t)


class Sim3Result(NamedTuple):
    t_21: jnp.ndarray
    inliers: jnp.ndarray
    n_inliers: jnp.ndarray
    ok: jnp.ndarray


@partial(jax.jit, static_argnames=("cam1", "cam2", "n_trials", "fix_scale"))
def solve_sim3_ransac(cam1, cam2, pts1_c, pts2_c, uv1, uv2, inv_sigma2_1,
                      inv_sigma2_2, valid, key, n_trials: int = 64,
                      fix_scale: bool = True, chi2_th1: float = 9.210,
                      chi2_th2: float = 9.210,
                      min_inliers: int = 6) -> Sim3Result:
    """RANSAC Sim(3) between two keyframes from 3D-3D matched map points.

    pts1_c/pts2_c: (N, 3) matched points in each camera frame; uv1/uv2 their
    pixel observations; inlier check = mutual reprojection (reference
    `CheckInliers` :340: project p2 via T12 into image 1 and vice versa).
    """
    n = pts1_c.shape[0]
    p = valid.astype(jnp.float32)
    p = p / jnp.maximum(p.sum(), 1.0)
    idx = jax.random.choice(key, n, shape=(n_trials, 3), replace=True, p=p)

    def one_trial(ids):
        T21 = horn_align(pts1_c[ids], pts2_c[ids], fix_scale=fix_scale)
        T12 = lie.inv_sim3(T21)
        e2 = cam_ops.project(cam2, lie.transform_points(T21, pts1_c)) - uv2
        e1 = cam_ops.project(cam1, lie.transform_points(T12, pts2_c)) - uv1
        chi1 = jnp.sum(e1 * e1, -1) * inv_sigma2_1
        chi2 = jnp.sum(e2 * e2, -1) * inv_sigma2_2
        inl = valid & (chi1 <= chi2_th1) & (chi2 <= chi2_th2)
        finite = jnp.all(jnp.isfinite(T21))
        return jnp.where(finite, jnp.sum(inl), -1), T21, inl

    scores, Ts, inls = jax.vmap(one_trial)(idx)
    best = jnp.argmax(scores)
    # refine on the best trial's inliers
    w = inls[best].astype(jnp.float32)
    T_ref = horn_align(pts1_c, pts2_c, weights=w, fix_scale=fix_scale)
    T_ref = jnp.where(jnp.all(jnp.isfinite(T_ref)), T_ref, Ts[best])
    ok = scores[best] >= min_inliers
    return Sim3Result(T_ref, inls[best], scores[best], ok)


@partial(jax.jit, static_argnames=("cam1", "cam2", "fix_scale", "n_iters"))
def refine_sim3_gn(cam1, cam2, t_21, pts1_c, pts2_c, uv1, uv2, valid,
                   fix_scale: bool = True, n_iters: int = 10,
                   chi2_th: float = 10.0, huber: float = 3.1623,
                   damping: float = 1e-4):
    """Gauss–Newton refinement of a Sim(3) on 3D-3D pairs with mutual
    reprojection residuals (the reference's `OptimizeSim3`,
    `Optimizer.cc:1045`: one Sim3 vertex, paired forward/inverse projection
    edges, Huber δ=√10, 5 iterations → χ²>10 edge removal → 10 more).

    t_21 maps frame-1 coords into frame 2.  The reference's two-stage
    outlier handling becomes per-iteration re-gating after a warmup
    (iterations ≥ 3 drop pairs with either directional χ² > chi2_th).

    Returns (t_21_refined, inliers, n_inliers).
    """
    t0 = jnp.asarray(t_21, jnp.float32)

    def residuals(delta, T):
        Tn = lie.exp_sim3(delta) @ T
        e2 = cam_ops.project(cam2, lie.transform_points(Tn, pts1_c)) - uv2
        e1 = cam_ops.project(
            cam1, lie.transform_points(lie.inv_sim3(Tn), pts2_c)) - uv1
        return jnp.concatenate([e1, e2], axis=0)  # (2N, 2)

    def chi2_of(T):
        e = residuals(jnp.zeros(7), T)
        n = pts1_c.shape[0]
        c1 = jnp.sum(e[:n] ** 2, -1)
        c2 = jnp.sum(e[n:] ** 2, -1)
        return c1, c2

    def body(i, carry):
        T, gate = carry
        c1, c2 = chi2_of(T)
        # re-gate after warmup (reference removes χ²>10 edges mid-way)
        gate = jnp.where(i >= 3, valid & (c1 <= chi2_th) & (c2 <= chi2_th),
                         gate)
        e = residuals(jnp.zeros(7), T)          # (2N, 2)
        J = jax.jacfwd(residuals)(jnp.zeros(7), T)  # (2N, 2, 7)
        m = jnp.concatenate([gate, gate]).astype(jnp.float32)
        # Huber reweighting on the residual norm
        en = jnp.sqrt(jnp.maximum(jnp.sum(e * e, -1), 1e-12))
        w = m * jnp.minimum(1.0, huber / en)
        H = jnp.einsum("nri,n,nrj->ij", J, w, J)
        b = -jnp.einsum("nri,n,nr->i", J, w, e)
        if fix_scale:
            # zero out the scale DOF (last tangent coordinate)
            H = H.at[6, :].set(0.0).at[:, 6].set(0.0).at[6, 6].set(1.0)
            b = b.at[6].set(0.0)
        H = H + damping * jnp.eye(7) + 1e-8 * jnp.eye(7)
        delta = jnp.linalg.solve(H, b)
        T_new = lie.exp_sim3(delta) @ T
        good = jnp.all(jnp.isfinite(T_new)) & (jnp.sum(gate) >= 3)
        return jnp.where(good, T_new, T), gate

    T_fin, gate = jax.lax.fori_loop(0, n_iters, body, (t0, valid))
    c1, c2 = chi2_of(T_fin)
    inl = valid & (c1 <= chi2_th) & (c2 <= chi2_th)
    return T_fin, inl, jnp.sum(inl)


def align_trajectories(est: jnp.ndarray, gt: jnp.ndarray,
                       fix_scale: bool = False):
    """Align estimated camera centers (N,3) to ground truth; returns
    (T_align, ate_rmse).  The ATE evaluation tool (absent from the
    reference repo — SURVEY.md §6)."""
    T = horn_align(est, gt, fix_scale=fix_scale)
    aligned = lie.transform_points(T, est)
    err = jnp.linalg.norm(aligned - gt, axis=-1)
    return T, jnp.sqrt(jnp.mean(err * err))
