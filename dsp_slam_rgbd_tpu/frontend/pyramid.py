"""Image pyramid + Gaussian blur.

Covers the role of `ORBextractor::ComputePyramid` (reference
`src/ORBextractor.cc:1120-1145`: 8 levels, scale factor 1.2) and the 7x7
sigma=2 Gaussian blur applied before descriptor extraction (:1106).  Uses
XLA's resize and separable convolutions; every level has a static shape
derived from the input resolution at trace time.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def level_shapes(h: int, w: int, n_levels: int = 8, scale: float = 1.2):
    """Static (h, w) per pyramid level."""
    shapes = []
    for l in range(n_levels):
        inv = 1.0 / (scale ** l)
        shapes.append((max(int(round(h * inv)), 16), max(int(round(w * inv)), 16)))
    return shapes


def build_pyramid(img: jnp.ndarray, n_levels: int = 8, scale: float = 1.2):
    """img (H, W) float32 -> list of (h_l, w_l) arrays."""
    h, w = img.shape
    out = [img]
    for (lh, lw) in level_shapes(h, w, n_levels, scale)[1:]:
        out.append(jax.image.resize(img, (lh, lw), method="linear"))
    return out


def gaussian_kernel(size: int = 7, sigma: float = 2.0) -> np.ndarray:
    x = np.arange(size) - (size - 1) / 2.0
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(img: jnp.ndarray, size: int = 7, sigma: float = 2.0):
    """Separable Gaussian blur with reflect padding (cv::GaussianBlur
    BORDER_REFLECT_101 role)."""
    k = jnp.asarray(gaussian_kernel(size, sigma))
    pad = size // 2
    x = jnp.pad(img, ((pad, pad), (0, 0)), mode="reflect")
    x = jax.vmap(lambda col: jnp.convolve(col, k, mode="valid"), in_axes=1,
                 out_axes=1)(x)
    x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    x = jax.vmap(lambda row: jnp.convolve(row, k, mode="valid"))(x)
    return x


def per_level_features(n_features: int, n_levels: int = 8, scale: float = 1.2):
    """Split a feature budget over levels with the reference's geometric
    allocation (`ORBextractor.cc` constructor: nDesired * (1-1/s)/ (1-(1/s)^L)
    per level, remainder to the top level)."""
    factor = 1.0 / scale
    n_first = n_features * (1 - factor) / (1 - factor ** n_levels)
    alloc = []
    acc = 0
    for l in range(n_levels - 1):
        n = int(round(n_first * factor ** l))
        alloc.append(n)
        acc += n
    alloc.append(max(n_features - acc, 0))
    return alloc
