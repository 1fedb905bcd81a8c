"""Two-view DLT triangulation + epipolar checks, batched.

Covers `Initializer::Triangulate` (reference `src/Initializer.cc:734`) and
the acceptance tests of `LocalMapping::CreateNewMapPoints`
(`src/LocalMapping.cc:259`): parallax, positive depth, reprojection error,
scale consistency are returned as masks for the caller to combine.
"""
from __future__ import annotations

import jax.numpy as jnp

from dsp_slam_rgbd_tpu.ops import camera as cam_ops
from dsp_slam_rgbd_tpu.ops import lie


def triangulate_dlt(P1: jnp.ndarray, P2: jnp.ndarray, x1: jnp.ndarray,
                    x2: jnp.ndarray) -> jnp.ndarray:
    """DLT: projection matrices (3,4) + normalized image points (N,2) ->
    world points (N,3).

    Solves A X = 0 with the closed-form smallest singular vector of the
    4x4 system (via eigh of AᵀA — batched-friendly on TPU).
    """
    rows = jnp.stack(
        [
            x1[..., 0, None] * P1[2] - P1[0],
            x1[..., 1, None] * P1[2] - P1[1],
            x2[..., 0, None] * P2[2] - P2[0],
            x2[..., 1, None] * P2[2] - P2[1],
        ],
        axis=-2,
    )  # (N, 4, 4)
    AtA = jnp.einsum("nij,nik->njk", rows, rows)
    _, vecs = jnp.linalg.eigh(AtA)  # ascending eigenvalues
    X = vecs[..., 0]  # smallest
    w = X[..., 3]
    w = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    return X[..., :3] / w[..., None]


def triangulate_two_views(cam1, cam2, t1_cw, t2_cw, uv1, uv2):
    """Pixel observations in two frames -> world points (N, 3).

    Uses normalized coordinates (K⁻¹ applied) so DLT conditioning is good.
    """
    x1 = cam_ops.pixel_rays(cam1, uv1)[..., :2]
    x2 = cam_ops.pixel_rays(cam2, uv2)[..., :2]
    P1 = t1_cw[:3, :]
    P2 = t2_cw[:3, :]
    return triangulate_dlt(P1, P2, x1, x2)


def _solve3x3_sym(A, b, damping: float = 1e-8):
    """Batched closed-form solve of symmetric 3x3 systems via the adjugate.

    Pure elementwise math — vectorizes on the VPU with no iterative
    factorization, unlike batched `eigh`/LU which XLA lowers poorly at
    (N, 4, 4)/(N, 3, 3) granularity (profiled at ~74 ms per keyframe for
    the DLT eigh on a v5e)."""
    a00 = A[..., 0, 0] + damping
    a01 = A[..., 0, 1]
    a02 = A[..., 0, 2]
    a11 = A[..., 1, 1] + damping
    a12 = A[..., 1, 2]
    a22 = A[..., 2, 2] + damping
    c00 = a11 * a22 - a12 * a12
    c01 = a02 * a12 - a01 * a22
    c02 = a01 * a12 - a02 * a11
    c11 = a00 * a22 - a02 * a02
    c12 = a01 * a02 - a00 * a12
    c22 = a00 * a11 - a01 * a01
    det = a00 * c00 + a01 * c01 + a02 * c02
    inv_det = jnp.where(jnp.abs(det) > 1e-20, 1.0 / det, 0.0)
    b0, b1, b2 = b[..., 0], b[..., 1], b[..., 2]
    x = jnp.stack([
        c00 * b0 + c01 * b1 + c02 * b2,
        c01 * b0 + c11 * b1 + c12 * b2,
        c02 * b0 + c12 * b1 + c22 * b2,
    ], axis=-1)
    return x * inv_det[..., None]


def triangulate_two_views_fast(cam1, cam2, t1_cw, t2_cw, uv1, uv2):
    """Inhomogeneous DLT: the SAME algebraic residual as
    `triangulate_two_views` (rows `x·P₃ − P₁`, `y·P₃ − P₂` in normalized
    coordinates) but with the point's homogeneous coordinate pinned to 1 —
    a closed-form symmetric 3x3 normal-equation solve per point instead of
    the batched 4x4 eigh (the keyframe stage's single biggest kernel cost;
    see `mapping/local_mapping.py::_triangulate_device`).

    f32 conditioning: the solve runs with the WORLD ORIGIN shifted to the
    two camera centers' midpoint, so the translation columns are ~the
    baseline rather than ~the absolute position (KITTI trajectories reach
    hundreds of meters — normal equations in absolute coordinates lose the
    baseline-scale signal to f32 cancellation, which is why a naive
    closed-form replacement regressed in round 3).  Low-parallax solutions
    are garbage-but-finite and die at the caller's parallax/reproj gates,
    exactly like the eigh-DLT's.
    """
    t1_wc = lie.inv_se3(t1_cw)
    t2_wc = lie.inv_se3(t2_cw)
    m = 0.5 * (t1_wc[:3, 3] + t2_wc[:3, 3])      # origin shift
    # T_cw' for world' = world − m: R unchanged, t' = R·m + t
    t1s = t1_cw.at[:3, 3].add(t1_cw[:3, :3] @ m)
    t2s = t2_cw.at[:3, 3].add(t2_cw[:3, :3] @ m)
    x1 = cam_ops.pixel_rays(cam1, uv1)[..., :2]
    x2 = cam_ops.pixel_rays(cam2, uv2)[..., :2]
    P1 = t1s[:3, :]
    P2 = t2s[:3, :]
    rows = jnp.stack(
        [
            x1[..., 0, None] * P1[2] - P1[0],
            x1[..., 1, None] * P1[2] - P1[1],
            x2[..., 0, None] * P2[2] - P2[0],
            x2[..., 1, None] * P2[2] - P2[1],
        ],
        axis=-2,
    )  # (N, 4, 4); A·[p; 1] ≈ 0  →  A[:, :3]·p = −A[:, 3]
    A = rows[..., :3]
    b = -rows[..., 3]
    AtA = jnp.einsum("nij,nik->njk", A, A)
    Atb = jnp.einsum("nij,ni->nj", A, b)
    # NOTE: no reprojection-GN polish here — refining against reprojection
    # error pushes borderline-WRONG matches under the caller's χ² gate (the
    # gate tests exactly the quantity such a refinement minimizes), which
    # measurably destabilized tracking on the long-run fixture.
    return _solve3x3_sym(AtA, Atb) + m[None, :]


def acceptance_masks(cam1, cam2, t1_cw, t2_cw, pts_w, uv1, uv2,
                     reproj_chi2: float = 5.991, inv_sigma2_1=1.0,
                     inv_sigma2_2=1.0, min_parallax_cos: float = 0.9998):
    """Reference `CreateNewMapPoints` gates as masks.

    Returns dict of (N,) bools: parallax, depth, reproj.
    """
    # camera center in world = inv(T_cw)[:3, 3]
    c1 = lie.inv_se3(t1_cw)[:3, 3]
    c2 = lie.inv_se3(t2_cw)[:3, 3]
    r1 = pts_w - c1
    r2 = pts_w - c2
    cosp = jnp.sum(r1 * r2, axis=-1) / jnp.maximum(
        jnp.linalg.norm(r1, axis=-1) * jnp.linalg.norm(r2, axis=-1), 1e-9
    )
    parallax_ok = cosp < min_parallax_cos

    p1 = lie.transform_points(t1_cw, pts_w)
    p2 = lie.transform_points(t2_cw, pts_w)
    depth_ok = (p1[..., 2] > 0) & (p2[..., 2] > 0)

    e1 = cam_ops.project(cam1, p1) - uv1
    e2 = cam_ops.project(cam2, p2) - uv2
    chi1 = jnp.sum(e1 * e1, axis=-1) * inv_sigma2_1
    chi2_ = jnp.sum(e2 * e2, axis=-1) * inv_sigma2_2
    reproj_ok = (chi1 <= reproj_chi2) & (chi2_ <= reproj_chi2)
    return {"parallax": parallax_ok, "depth": depth_ok, "reproj": reproj_ok}
