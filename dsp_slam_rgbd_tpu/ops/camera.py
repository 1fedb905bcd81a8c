"""Pinhole camera model: projection, backprojection, rays, undistortion.

Covers the roles of the reference's per-frame camera math
(`src/Frame.cc:421-435` keypoint undistortion, `reconstruct/loss_utils.py:23`
get_rays, `src/Tracking.cc:53-105` intrinsics parsing) as batched jnp ops.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Intrinsics(NamedTuple):
    fx: float
    fy: float
    cx: float
    cy: float
    # radial/tangential distortion (k1, k2, p1, p2, k3); zeros if rectified
    dist: tuple = (0.0, 0.0, 0.0, 0.0, 0.0)
    # stereo baseline * fx (reference's `bf`); 0 for mono
    bf: float = 0.0

    @property
    def K(self):
        return jnp.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]],
            dtype=jnp.float32,
        )

    @property
    def K_inv(self):
        return jnp.array(
            [
                [1.0 / self.fx, 0.0, -self.cx / self.fx],
                [0.0, 1.0 / self.fy, -self.cy / self.fy],
                [0.0, 0.0, 1.0],
            ],
            dtype=jnp.float32,
        )


def project(cam: Intrinsics, pts_cam: jnp.ndarray) -> jnp.ndarray:
    """(…, 3) camera-frame points -> (…, 2) pixels. No distortion."""
    z = pts_cam[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = cam.fx * pts_cam[..., 0] * inv_z + cam.cx
    v = cam.fy * pts_cam[..., 1] * inv_z + cam.cy
    return jnp.stack([u, v], axis=-1)


def project_stereo(cam: Intrinsics, pts_cam: jnp.ndarray) -> jnp.ndarray:
    """(…, 3) -> (…, 3) pixels (u, v, uR) with uR = u − bf/z."""
    uv = project(cam, pts_cam)
    z = jnp.maximum(pts_cam[..., 2], 1e-9)
    ur = uv[..., 0] - cam.bf / z
    return jnp.concatenate([uv, ur[..., None]], axis=-1)


def backproject(cam: Intrinsics, uv: jnp.ndarray, depth: jnp.ndarray) -> jnp.ndarray:
    """Pixels (…, 2) + depth (…,) -> camera-frame 3D points (…, 3)."""
    x = (uv[..., 0] - cam.cx) / cam.fx
    y = (uv[..., 1] - cam.cy) / cam.fy
    return jnp.stack([x * depth, y * depth, depth], axis=-1)


def pixel_rays(cam: Intrinsics, uv: jnp.ndarray) -> jnp.ndarray:
    """Pixels (…, 2) -> unnormalized ray directions (…, 3) with z = 1.

    Matches reference `get_rays` (`loss_utils.py:23-37`): direction =
    K⁻¹ [u, v, 1]ᵀ.
    """
    x = (uv[..., 0] - cam.cx) / cam.fx
    y = (uv[..., 1] - cam.cy) / cam.fy
    return jnp.stack([x, y, jnp.ones_like(x)], axis=-1)


def distort(cam: Intrinsics, xy: jnp.ndarray) -> jnp.ndarray:
    """Apply radtan distortion to normalized coords (…, 2)."""
    k1, k2, p1, p2, k3 = cam.dist
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + k1 * r2 + k2 * r2 * r2 + k3 * r2 * r2 * r2
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def undistort_pixels(cam: Intrinsics, uv: jnp.ndarray, iters: int = 5) -> jnp.ndarray:
    """Iteratively undistort pixel coords (…, 2) (cv::undistortPoints role).

    Fixed-point iteration xu ← xd_obs_corrected; `iters` static for jit.
    """
    if all(d == 0.0 for d in cam.dist):
        return uv
    xd = jnp.stack(
        [(uv[..., 0] - cam.cx) / cam.fx, (uv[..., 1] - cam.cy) / cam.fy], axis=-1
    )
    k1, k2, p1, p2, k3 = cam.dist
    xy = xd
    for _ in range(iters):
        x, y = xy[..., 0], xy[..., 1]
        r2 = x * x + y * y
        radial = 1.0 + k1 * r2 + k2 * r2 * r2 + k3 * r2 * r2 * r2
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        xy = jnp.stack(
            [(xd[..., 0] - dx) / radial, (xd[..., 1] - dy) / radial], axis=-1
        )
    return jnp.stack(
        [xy[..., 0] * cam.fx + cam.cx, xy[..., 1] * cam.fy + cam.cy], axis=-1
    )
