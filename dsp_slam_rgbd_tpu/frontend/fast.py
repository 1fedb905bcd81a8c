"""Dense FAST-9/16 corner detection with score, NMS and per-cell selection.

TPU-first reformulation of the reference's per-cell cv::FAST + quad-tree
redistribution (`src/ORBextractor.cc:810-815` two-threshold grid FAST,
`DistributeOctTree` spatial balancing):

  * the 16-pixel Bresenham ring test runs densely over the whole image on
    the VPU (16 shifted copies, contiguous-arc test via boolean stacking);
  * corner score = for each 9-arc, min |ring − center| over the arc, maxed
    over arcs (the "max threshold for which this stays a corner" semantics);
  * 3x3 non-max suppression;
  * spatial distribution: the image is divided into cells and the best
    corner per cell is kept (replacing the quad-tree with a fixed-shape
    equivalent), then global top-K by score.

Everything returns fixed-capacity arrays + validity masks.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# Bresenham circle of radius 3: 16 (dy, dx) offsets in ring order
RING = np.array(
    [
        (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
        (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
    ],
    dtype=np.int32,
)


def _ring_stack(img: jnp.ndarray) -> jnp.ndarray:
    """(H, W) -> (16, H, W): ring pixel values at each position (zero-padded
    borders; border pixels are masked out by callers)."""
    padded = jnp.pad(img, 3)
    h, w = img.shape
    return jnp.stack(
        [padded[3 + dy : 3 + dy + h, 3 + dx : 3 + dx + w] for dy, dx in RING]
    )


def fast_score(img: jnp.ndarray, threshold: float, arc_len: int = 9):
    """Dense FAST: returns (score (H, W) float32, is_corner (H, W) bool).

    A pixel is a corner if some `arc_len` contiguous ring pixels are all
    brighter than center+t or all darker than center−t.  Score is the
    largest t' for which the test still passes (0 when not a corner).
    """
    ring = _ring_stack(img)  # (16, H, W)
    d = ring - img[None]  # signed differences

    # contiguous-arc extrema via a sliding window over the circular ring
    # axis — no (16, 9, H, W) materialization (a 9x HBM-traffic cut)
    d2 = jnp.concatenate([d, d[: arc_len - 1]], axis=0)  # (16+8, H, W)
    bright_min = jax.lax.reduce_window(
        d2, jnp.inf, jax.lax.min, (arc_len, 1, 1), (1, 1, 1), "VALID")
    dark_max = jax.lax.reduce_window(
        d2, -jnp.inf, jax.lax.max, (arc_len, 1, 1), (1, 1, 1), "VALID")
    # best arc scores
    score_bright = jnp.max(bright_min, axis=0)   # > t means corner (bright)
    score_dark = jnp.max(-dark_max, axis=0)      # > t means corner (dark)
    score = jnp.maximum(score_bright, score_dark)
    is_corner = score > threshold

    # exclude 3px border
    h, w = img.shape
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    interior = (yy >= 3) & (yy < h - 3) & (xx >= 3) & (xx < w - 3)
    return jnp.where(interior, score, 0.0), is_corner & interior


def nms3(score: jnp.ndarray) -> jnp.ndarray:
    """3x3 non-maximum suppression mask."""
    neigh = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
    )
    return score >= neigh


@partial(jax.jit, static_argnames=("max_kp", "cell", "threshold", "min_threshold"))
def detect(img: jnp.ndarray, max_kp: int, cell: int = 16,
           threshold: float = 20.0, min_threshold: float = 7.0):
    """Detect up to max_kp corners: per-cell best (two-threshold fallback à
    la the reference's ini/min FAST thresholds) then global top-K.

    Returns (xy (K, 2) float32 [x, y], score (K,), valid (K,) bool).
    """
    h, w = img.shape
    # the FAST score is threshold-independent (largest t' still passing),
    # so ONE dense pass serves both thresholds (was two full passes)
    score_lo, corner_lo = fast_score(img, min_threshold)
    score_hi, corner_hi = score_lo, score_lo > threshold
    keep = nms3(score_lo)

    # cell grid (pad to multiples of cell)
    ch, cw = -(-h // cell), -(-w // cell)
    ph, pw = ch * cell - h, cw * cell - w

    def cellify(a, fill):
        a = jnp.pad(a, ((0, ph), (0, pw)), constant_values=fill)
        return a.reshape(ch, cell, cw, cell).transpose(0, 2, 1, 3).reshape(
            ch * cw, cell * cell
        )

    s_hi = cellify(jnp.where(corner_hi & keep, score_hi, 0.0), 0.0)
    s_lo = cellify(jnp.where(corner_lo & keep, score_lo, 0.0), 0.0)
    # two-threshold fallback: use low-threshold corners only in cells where
    # no high-threshold corner survived
    cell_has_hi = jnp.any(s_hi > 0.0, axis=1, keepdims=True)
    s = jnp.where(cell_has_hi, s_hi, s_lo)

    best_in_cell = jnp.argmax(s, axis=1)  # (C,)
    best_score = jnp.take_along_axis(s, best_in_cell[:, None], axis=1)[:, 0]

    # global top-K cells by score
    k = min(max_kp, s.shape[0])
    top_score, top_cell = jax.lax.top_k(best_score, k)
    valid = top_score > 0.0

    cy = top_cell // cw
    cx = top_cell % cw
    iy = best_in_cell[top_cell] // cell
    ix = best_in_cell[top_cell] % cell
    # NOTE: keypoints stay at integer positions like the reference's
    # cv::FAST.  A quadratic fit on the FAST score map was tried and makes
    # accuracy WORSE — the max-threshold score is piecewise-constant around
    # corners, so the parabola fits plateau edges, adding ±0.5 px jitter.
    y = (cy * cell + iy).astype(jnp.float32)
    x = (cx * cell + ix).astype(jnp.float32)
    xy = jnp.stack([x, y], axis=-1)

    if k < max_kp:
        pad = max_kp - k
        xy = jnp.concatenate([xy, jnp.zeros((pad, 2))], axis=0)
        top_score = jnp.concatenate([top_score, jnp.zeros(pad)], axis=0)
        valid = jnp.concatenate([valid, jnp.zeros(pad, bool)], axis=0)
    return xy, top_score, valid
