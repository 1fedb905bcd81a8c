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
