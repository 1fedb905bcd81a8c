"""Oriented BRIEF descriptors + the full ORB extraction pipeline.

Covers the reference `ORBextractor` (`src/ORBextractor.cc`):
  * orientation by intensity centroid over a circular 31x31 patch
    (`IC_Angle` :78) — here a masked weighted sum over gathered patches;
  * 256-bit rotated BRIEF (`computeOrbDescriptor` :109) — the reference uses
    the learned OpenCV point pattern; we use an original seeded Gaussian
    pattern (BRIEF-paper G-II sampling, radius-clipped so rotations stay in
    the patch).  Descriptors are internally consistent — all matching happens
    inside this framework — so pattern choice only affects bit statistics,
    and Hamming thresholds are tuned for it in matcher.py;
  * the per-level pipeline of `operator()` :1044-1118: pyramid -> FAST ->
    orientation -> blur -> descriptors, with keypoints scaled to level-0
    coordinates.

All outputs are fixed-capacity arrays + validity masks.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from dsp_slam_rgbd_tpu.frontend import fast, pyramid

PATCH_R = 15  # half-size of the orientation/descriptor patch (31x31)
N_BITS = 256


def _circular_mask_and_coords():
    size = 2 * PATCH_R + 1
    y, x = np.mgrid[-PATCH_R : PATCH_R + 1, -PATCH_R : PATCH_R + 1]
    mask = (x * x + y * y) <= PATCH_R * PATCH_R
    return (
        jnp.asarray(mask.astype(np.float32)),
        jnp.asarray(x.astype(np.float32)),
        jnp.asarray(y.astype(np.float32)),
    )


_MASK, _XC, _YC = _circular_mask_and_coords()


def make_brief_pattern(seed: int = 7, n_bits: int = N_BITS, sigma: float = 6.2,
                       r_max: float = 13.0) -> np.ndarray:
    """(n_bits, 4) int offsets (y1, x1, y2, x2), Gaussian-sampled and clipped
    to radius r_max so any in-plane rotation stays inside the 31x31 patch."""
    rng = np.random.default_rng(seed)
    pts = rng.normal(0.0, sigma, size=(n_bits, 2, 2))
    norm = np.linalg.norm(pts, axis=-1, keepdims=True)
    pts = np.where(norm > r_max, pts * (r_max / norm), pts)
    return np.round(pts.reshape(n_bits, 4)).astype(np.float32)


_PATTERN = jnp.asarray(make_brief_pattern())  # (256, 4) as (y1, x1, y2, x2)


def gather_patches(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Extract (K, 31, 31) patches centered at integer keypoint coords."""
    padded = jnp.pad(img, PATCH_R)
    size = 2 * PATCH_R + 1

    def one(p):
        x = jnp.round(p[0]).astype(jnp.int32)
        y = jnp.round(p[1]).astype(jnp.int32)
        return jax.lax.dynamic_slice(padded, (y, x), (size, size))

    return jax.vmap(one)(xy)


def orientations(patches: jnp.ndarray) -> jnp.ndarray:
    """Intensity-centroid angle per patch (radians), reference `IC_Angle`."""
    m10 = jnp.sum(patches * _XC * _MASK, axis=(-2, -1))
    m01 = jnp.sum(patches * _YC * _MASK, axis=(-2, -1))
    return jnp.arctan2(m01, m10)


def descriptors(patches: jnp.ndarray, angles: jnp.ndarray) -> jnp.ndarray:
    """Rotated BRIEF: (K, 31, 31) patches + (K,) angles -> (K, 8) uint32."""
    c, s = jnp.cos(angles), jnp.sin(angles)  # (K,)
    y1, x1, y2, x2 = (_PATTERN[:, 0], _PATTERN[:, 1], _PATTERN[:, 2],
                      _PATTERN[:, 3])

    def rot(y, x):
        # rotate offsets by angle (same convention as reference :109:
        # x' = x cosθ − y sinθ, y' = x sinθ + y cosθ), nearest-neighbor
        xr = jnp.round(x[None, :] * c[:, None] - y[None, :] * s[:, None])
        yr = jnp.round(x[None, :] * s[:, None] + y[None, :] * c[:, None])
        return (yr + PATCH_R).astype(jnp.int32), (xr + PATCH_R).astype(jnp.int32)

    ry1, rx1 = rot(y1, x1)  # (K, 256)
    ry2, rx2 = rot(y2, x2)

    def sample(patch, ry, rx):
        return patch[ry, rx]

    i1 = jax.vmap(sample)(patches, ry1, rx1)  # (K, 256)
    i2 = jax.vmap(sample)(patches, ry2, rx2)
    bits = (i1 < i2).astype(jnp.uint32)  # (K, 256)

    words = bits.reshape(-1, 8, 32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, None, :]
    return jnp.sum(words * weights, axis=-1, dtype=jnp.uint32)  # (K, 8)


class Features(NamedTuple):
    xy: jnp.ndarray      # (N, 2) level-0 pixel coords [x, y]
    level: jnp.ndarray   # (N,) int32 pyramid level
    angle: jnp.ndarray   # (N,) radians
    score: jnp.ndarray   # (N,) FAST score
    desc: jnp.ndarray    # (N, 8) uint32 packed 256-bit descriptors
    valid: jnp.ndarray   # (N,) bool

    @property
    def n(self):
        return self.xy.shape[0]


class OrbConfig(NamedTuple):
    n_features: int = 2000
    n_levels: int = 8
    scale: float = 1.2
    fast_threshold: float = 20.0
    fast_min_threshold: float = 7.0
    cell: int = 16


@partial(jax.jit, static_argnames=("cfg",))
def extract(img: jnp.ndarray, cfg: OrbConfig = OrbConfig()) -> Features:
    """Full ORB extraction on a (H, W) float32 [0,255] image."""
    levels = pyramid.build_pyramid(img, cfg.n_levels, cfg.scale)
    alloc = pyramid.per_level_features(cfg.n_features, cfg.n_levels, cfg.scale)

    outs = []
    for l, (img_l, n_l) in enumerate(zip(levels, alloc)):
        if n_l <= 0:
            continue
        xy, score, valid = fast.detect(
            img_l, n_l, cfg.cell, cfg.fast_threshold, cfg.fast_min_threshold
        )
        blurred = pyramid.gaussian_blur(img_l)
        patches_orient = gather_patches(img_l, xy)
        ang = orientations(patches_orient)
        patches_desc = gather_patches(blurred, xy)
        desc = descriptors(patches_desc, ang)
        s = cfg.scale ** l
        outs.append(Features(
            xy=xy * s,
            level=jnp.full(n_l, l, jnp.int32),
            angle=ang,
            score=score,
            desc=desc,
            valid=valid,
        ))

    return Features(*[jnp.concatenate([getattr(o, f) for o in outs], axis=0)
                      for f in Features._fields])
