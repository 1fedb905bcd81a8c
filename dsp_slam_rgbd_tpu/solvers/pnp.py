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
        T = _dlt_pnp(pts_w[ids], xn[ids])
        pc = lie.transform_points(T, pts_w)
        err = cam_ops.project(cam, pc) - uv
        chi2 = jnp.sum(err * err, axis=-1) * inv_sigma2
        inl = valid & (chi2 <= chi2_th) & (pc[:, 2] > 0)
        finite = jnp.all(jnp.isfinite(T))
        return jnp.where(finite, jnp.sum(inl), -1), T

    scores, Ts = jax.vmap(one_trial)(idx)
    best = jnp.argmax(scores)
    T0 = Ts[best]

    # polish with robust GN over all tentative inliers
    res = pose_gn.optimize_pose(cam, T0, pts_w, uv, inv_sigma2, valid,
                                stereo=False)
    ok = (res.n_inliers >= min_inliers) & (scores[best] > 0)
    return PnPResult(res.t_cw, res.inliers, res.n_inliers, ok)
