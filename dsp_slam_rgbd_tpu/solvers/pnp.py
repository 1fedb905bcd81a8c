"""Robust 3D→2D pose solving (relocalization), batched RANSAC.

Replaces the reference `PnPsolver` (EPnP + RANSAC, `src/PnPsolver.cc`) with
the TPU-idiomatic fixed-trial formulation (SURVEY.md §7): T batched minimal
hypotheses solved in parallel, inliers counted densely, best hypothesis
polished with the robust GN of `pose_gn`.

The minimal solver is 6-point DLT-PnP (linear P = A⁻¹-nullspace, then
orthonormalization of R via SVD) — same role as EPnP's closed form, but a
batched eigh instead of the β-case machinery.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from dsp_slam_rgbd_tpu.ops import camera as cam_ops
from dsp_slam_rgbd_tpu.ops import lie
from dsp_slam_rgbd_tpu.solvers import pose_gn


def _dlt_pnp(pts_w: jnp.ndarray, xn: jnp.ndarray) -> jnp.ndarray:
    """Minimal linear PnP: (K, 3) world pts + (K, 2) normalized image pts
    -> (4, 4) T_cw.  K ≥ 6."""
    k = pts_w.shape[0]
    hom = jnp.concatenate([pts_w, jnp.ones((k, 1))], axis=-1)  # (K, 4)
    zero = jnp.zeros((k, 4))
    r1 = jnp.concatenate([hom, zero, -xn[:, :1] * hom], axis=-1)  # (K, 12)
    r2 = jnp.concatenate([zero, hom, -xn[:, 1:2] * hom], axis=-1)
    A = jnp.concatenate([r1, r2], axis=0)  # (2K, 12)
    AtA = A.T @ A
    _, vecs = jnp.linalg.eigh(AtA)
    p = vecs[:, 0].reshape(3, 4)
    # P ≃ s·[R | t]; s = cbrt(det) recovers sign AND scale (the ±p nullspace
    # ambiguity cancels: −p gives −s and the same R, t)
    s = jnp.cbrt(jnp.linalg.det(p[:, :3]))
    s = jnp.where(jnp.abs(s) < 1e-12, 1e-12, s)
    R_raw = p[:, :3] / s
    t = p[:, 3] / s
    # project onto SO(3)
    U, _, Vt = jnp.linalg.svd(R_raw)
    d = jnp.linalg.det(U @ Vt)
    R = U @ jnp.diag(jnp.array([1.0, 1.0, 1.0]).at[2].set(d)) @ Vt
    return lie.rt_to_mat(R, t)


def _planar_pnp(pts_w: jnp.ndarray, xn: jnp.ndarray) -> jnp.ndarray:
    """Planar minimal PnP: homography decomposition (IPPE/EPnP-planar
    role, reference `PnPsolver.cc:667-858` β-case N=3).

    The 12-dof DLT above is rank-deficient when the sample is coplanar
    (nullspace dim ≥ 2 — common on road/wall scenes), so its pose is
    garbage exactly where relocalization needs it most.  Here: fit the
    sample's plane (SVD), express points in plane coordinates, solve the
    2D→2D homography H ≃ [R·e1 | R·e2 | R·c + t], and re-orthonormalize
    the first two columns.  Valid when the points ARE planar; on a
    general sample its model scores fewer inliers than the DLT's and
    loses the per-trial argmax in `solve_pnp_ransac`.
    """
    c = jnp.mean(pts_w, axis=0)
    Q = pts_w - c
    # plane basis: right singular vectors of the centered sample
    _, _, Vt = jnp.linalg.svd(Q, full_matrices=False)
    e1, e2 = Vt[0], Vt[1]
    w = jnp.stack([Q @ e1, Q @ e2], axis=-1)          # (K, 2) plane coords
    k = w.shape[0]
    one = jnp.ones((k, 1))
    hw = jnp.concatenate([w, one], axis=-1)           # (K, 3)
    zero = jnp.zeros((k, 3))
    r1 = jnp.concatenate([hw, zero, -xn[:, :1] * hw], axis=-1)
    r2 = jnp.concatenate([zero, hw, -xn[:, 1:2] * hw], axis=-1)
    A = jnp.concatenate([r1, r2], axis=0)             # (2K, 9)
    _, vecs = jnp.linalg.eigh(A.T @ A)
    H = vecs[:, 0].reshape(3, 3)
    # sign: plane origin must sit in front of the camera (depth = H[2,2])
    H = H * jnp.where(H[2, 2] < 0, -1.0, 1.0)
    s = jnp.sqrt(jnp.maximum(
        jnp.linalg.norm(H[:, 0]) * jnp.linalg.norm(H[:, 1]), 1e-12))
    h12 = H[:, :2] / s
    # closest orthonormal 3x2 column pair
    U, _, Vt2 = jnp.linalg.svd(h12, full_matrices=False)
    r12 = U @ Vt2
    r3 = jnp.cross(r12[:, 0], r12[:, 1])
    Rp = jnp.stack([r12[:, 0], r12[:, 1], r3], axis=1)  # camera←plane
    B = jnp.stack([e1, e2, jnp.cross(e1, e2)], axis=1)  # world←plane
    R = Rp @ B.T
    t = H[:, 2] / s - R @ c
    return lie.rt_to_mat(R, t)


class PnPResult(NamedTuple):
    t_cw: jnp.ndarray
    inliers: jnp.ndarray
    n_inliers: jnp.ndarray
    ok: jnp.ndarray


@partial(jax.jit, static_argnames=("cam", "n_trials", "sample_size"))
def solve_pnp_ransac(cam, pts_w, uv, inv_sigma2, valid, key,
                     n_trials: int = 128, sample_size: int = 6,
                     chi2_th: float = 5.991,
                     min_inliers: int = 10) -> PnPResult:
    """Fixed-trial batched RANSAC + GN polish.

    pts_w (N, 3), uv (N, 2) pixel observations, valid (N,) live matches.
    """
    n = pts_w.shape[0]
    xn = cam_ops.pixel_rays(cam, uv)[:, :2]

    # sample trial index sets biased to valid slots
    p = valid.astype(jnp.float32)
    p = p / jnp.maximum(p.sum(), 1.0)
    idx = jax.random.choice(key, n, shape=(n_trials, sample_size),
                            replace=True, p=p)

    def one_trial(ids):
        # both minimal models per trial — the general 12-dof DLT and the
        # planar homography decomposition — scored by inlier count: on a
        # coplanar sample the DLT is rank-deficient (garbage pose), on a
        # general sample the homography is; the argmax keeps whichever
        # geometry the sample actually has, with no planarity threshold
        def score(T):
            pc = lie.transform_points(T, pts_w)
            err = cam_ops.project(cam, pc) - uv
            chi2 = jnp.sum(err * err, axis=-1) * inv_sigma2
            inl = valid & (chi2 <= chi2_th) & (pc[:, 2] > 0)
            return jnp.where(jnp.all(jnp.isfinite(T)), jnp.sum(inl), -1)

        T_g = _dlt_pnp(pts_w[ids], xn[ids])
        T_p = _planar_pnp(pts_w[ids], xn[ids])
        s_g, s_p = score(T_g), score(T_p)
        return jnp.maximum(s_g, s_p), jnp.where(s_g >= s_p, T_g, T_p)

    scores, Ts = jax.vmap(one_trial)(idx)
    best = jnp.argmax(scores)
    T0 = Ts[best]

    # polish with robust GN over all tentative inliers
    res = pose_gn.optimize_pose(cam, T0, pts_w, uv, inv_sigma2, valid,
                                stereo=False)
    ok = (res.n_inliers >= min_inliers) & (scores[best] > 0)
    return PnPResult(res.t_cw, res.inliers, res.n_inliers, ok)
