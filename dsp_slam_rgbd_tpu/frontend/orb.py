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


# (256, 4) as (y1, x1, y2, x2) — kept as NUMPY at module scope: jnp.asarray
# here would initialize the XLA backend at import time, which breaks
# jax.distributed.initialize-before-first-use (jit closes over numpy fine)
_PATTERN = make_brief_pattern()


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


def _column_halfheights() -> np.ndarray:
    """h(dx): the circular mask's half-height at column offset dx."""
    dx = np.arange(-PATCH_R, PATCH_R + 1)
    # largest integer dy with dx^2 + dy^2 <= R^2 (matches _MASK exactly)
    return np.floor(np.sqrt(np.maximum(PATCH_R**2 - dx**2, 0))).astype(
        np.int32
    )


_HALF_H = _column_halfheights()


def moment_angles(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Intensity-centroid angles at keypoints via integral-image moments.

    Same values as `orientations(gather_patches(img, xy))` (up to fp
    summation order) — the TPU replacement for the per-keypoint `IC_Angle`
    loop (reference `ORBextractor.cc:78`).  A naive dense 31x31 conv is
    pathological on TPU (1 channel starves the MXU); instead each circular-
    mask column is a contiguous vertical run, so a y-cumsum turns the m10 /
    m01 maps into 31 shifted box-sum adds — pure dense VPU work.
    """
    h_img, w_img = img.shape
    pad = jnp.pad(img, PATCH_R)  # zero padding == gather_patches semantics
    # vertical prefix sums: vbox(y0..y1, x) = C[y1+1, x] - C[y0, x]; and a
    # row-weighted variant for the dy-weighted sum
    C = jnp.concatenate(
        [jnp.zeros((1, pad.shape[1])), jnp.cumsum(pad, axis=0)], axis=0
    )
    rows = jnp.arange(pad.shape[0])[:, None].astype(img.dtype)
    Wc = jnp.concatenate(
        [jnp.zeros((1, pad.shape[1])), jnp.cumsum(pad * rows, axis=0)], axis=0
    )
    m10 = jnp.zeros((h_img, w_img))
    m01 = jnp.zeros((h_img, w_img))
    yc = (jnp.arange(h_img) + PATCH_R).astype(img.dtype)[:, None]
    for i, dx in enumerate(range(-PATCH_R, PATCH_R + 1)):
        h = int(_HALF_H[i])
        # window rows [yc-h, yc+h] at column xc+dx, where (yc, xc) are
        # padded-image coords (y + PATCH_R, x + PATCH_R)
        y0 = PATCH_R - h           # top row for output pixel 0
        y1 = PATCH_R + h + 1
        x0 = PATCH_R + dx
        col_sum = (C[y1 : y1 + h_img, x0 : x0 + w_img]
                   - C[y0 : y0 + h_img, x0 : x0 + w_img])
        col_wsum = (Wc[y1 : y1 + h_img, x0 : x0 + w_img]
                    - Wc[y0 : y0 + h_img, x0 : x0 + w_img])
        m10 = m10 + dx * col_sum
        # Σ dy·I = Σ (row - yc)·I = col_wsum - yc·col_sum
        m01 = m01 + (col_wsum - yc * col_sum)
    x = jnp.round(xy[:, 0]).astype(jnp.int32)
    y = jnp.round(xy[:, 1]).astype(jnp.int32)
    return jnp.arctan2(m01[y, x], m10[y, x])


def descriptors_flat(img: jnp.ndarray, xy: jnp.ndarray,
                     angles: jnp.ndarray) -> jnp.ndarray:
    """Rotated BRIEF straight from the (blurred) image: one flat gather of
    the 512 pattern samples per keypoint instead of materializing 31x31
    patches (equivalent to `descriptors(gather_patches(img, xy), angles)`
    for in-image keypoints; zero padding outside)."""
    c, s = jnp.cos(angles), jnp.sin(angles)  # (K,)
    y1, x1, y2, x2 = (_PATTERN[:, 0], _PATTERN[:, 1], _PATTERN[:, 2],
                      _PATTERN[:, 3])

    def rot(y, x):
        xr = jnp.round(x[None, :] * c[:, None] - y[None, :] * s[:, None])
        yr = jnp.round(x[None, :] * s[:, None] + y[None, :] * c[:, None])
        return yr.astype(jnp.int32), xr.astype(jnp.int32)

    ry1, rx1 = rot(y1, x1)  # (K, 256) offsets in [-R, R]
    ry2, rx2 = rot(y2, x2)

    padded = jnp.pad(img, PATCH_R)
    w_pad = padded.shape[1]
    flat = padded.reshape(-1)
    x0 = jnp.round(xy[:, 0]).astype(jnp.int32)[:, None] + PATCH_R
    y0 = jnp.round(xy[:, 1]).astype(jnp.int32)[:, None] + PATCH_R
    i1 = jnp.take(flat, (y0 + ry1) * w_pad + (x0 + rx1), mode="clip")
    i2 = jnp.take(flat, (y0 + ry2) * w_pad + (x0 + rx2), mode="clip")
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
        ang = moment_angles(img_l, xy)
        desc = descriptors_flat(blurred, xy, ang)
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


@partial(jax.jit, static_argnames=("cfg",))
def extract_pair(img_a: jnp.ndarray, img_b: jnp.ndarray,
                 cfg: OrbConfig = OrbConfig()):
    """ORB extraction for a stereo pair as ONE dispatch, each image traced
    SEPARATELY inside the program.  A vmapped formulation was measured
    2.7x SLOWER on the v5e (29.0 vs 10.9 ms for a KITTI-size pair): the
    batch dimension pushes the per-level top_k/argsort/gather chains onto
    slow batched paths, while two independent traces let XLA schedule the
    images' pyramids side by side."""
    return extract(img_a, cfg), extract(img_b, cfg)
