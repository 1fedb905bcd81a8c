"""Descriptor matching: dense Hamming distances + the reference's gating.

Covers the roles of `ORBmatcher` (`src/ORBmatcher.cc`): SearchByProjection /
SearchByBoW / SearchForInitialization / Fuse all reduce to "build a masked
candidate matrix, take the best Hamming match, apply best/second-best ratio
and rotation-consistency checks".  Here that is one dense (N, M) popcount
matrix on the VPU plus boolean masks — no grids or inverted files needed on
TPU (the 64x48 frame grid of `Frame::GetFeaturesInArea` exists to make CPU
search O(1); a dense masked matrix is the TPU equivalent).

Thresholds: the reference uses TH_HIGH=100/TH_LOW=50 (of 256 bits) for the
OpenCV learned pattern; our seeded-Gaussian pattern has near-identical
match/non-match Hamming statistics, so the same values are kept.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

TH_HIGH = 100
TH_LOW = 50
HISTO_BINS = 30


def hamming_matrix(desc_a: jnp.ndarray, desc_b: jnp.ndarray) -> jnp.ndarray:
    """(N, 8) x (M, 8) uint32 -> (N, M) int32 Hamming distances."""
    x = jnp.bitwise_xor(desc_a[:, None, :], desc_b[None, :, :])
    return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)


class Matches(NamedTuple):
    idx: jnp.ndarray    # (N,) best match in B for each A (or -1)
    dist: jnp.ndarray   # (N,) Hamming distance of best match
    valid: jnp.ndarray  # (N,) bool


def match(desc_a, valid_a, desc_b, valid_b, mask=None, max_dist=TH_LOW,
          ratio=1.0, mutual=True, angles_a=None, angles_b=None,
          check_rotation=False) -> Matches:
    """Best-match search with the reference's gates.

    mask: optional (N, M) bool of admissible pairs (projection radius, scale
    band, epipolar bound … — supplied by the caller).
    ratio: best < ratio * second-best (reference mfNNratio).
    mutual: cross-check (B's best must be A) — replaces the reference's
    per-B bookkeeping in SearchForInitialization.
    check_rotation: keep only matches in the 3 dominant angle-difference
    histogram bins (reference `ComputeThreeMaxima` + HISTO_LENGTH=30).
    """
    n, m = desc_a.shape[0], desc_b.shape[0]
    d = hamming_matrix(desc_a, desc_b)
    pair_ok = valid_a[:, None] & valid_b[None, :]
    if mask is not None:
        pair_ok = pair_ok & mask
    BIG = jnp.int32(1 << 15)
    d = jnp.where(pair_ok, d, BIG)

    best = jnp.argmin(d, axis=1)  # (N,)
    best_d = jnp.min(d, axis=1)
    d2 = d.at[jnp.arange(n), best].set(BIG)
    second_d = jnp.min(d2, axis=1)

    ok = (best_d <= max_dist) & (best_d < ratio * second_d.astype(jnp.float32))

    if mutual:
        best_b = jnp.argmin(d, axis=0)  # (M,) best A for each B
        ok = ok & (best_b[best] == jnp.arange(n))

    if check_rotation and angles_a is not None:
        # entries with a non-finite angle (e.g. map points never seen in the
        # last frame) are exempt from the gate and kept out of the histogram
        ang_b = angles_b[best]
        has_ang = jnp.isfinite(angles_a) & jnp.isfinite(ang_b)
        rot = (angles_a - jnp.where(has_ang, ang_b, 0.0)) % (2.0 * jnp.pi)
        bins = jnp.floor(rot / (2.0 * jnp.pi) * HISTO_BINS).astype(jnp.int32)
        bins = jnp.clip(bins, 0, HISTO_BINS - 1)
        hist = jnp.zeros(HISTO_BINS, jnp.int32).at[bins].add(
            (ok & has_ang).astype(jnp.int32)
        )
        top_v, top_i = jax.lax.top_k(hist, 3)
        # reference `ComputeThreeMaxima` (ORBmatcher.cc:1444-1470): the 2nd
        # and 3rd bins are dropped when they hold < 0.1x the dominant bin
        keep = top_v.astype(jnp.float32) >= 0.1 * top_v[0].astype(jnp.float32)
        keep = keep.at[0].set(True)
        top_i = jnp.where(keep, top_i, -1)
        in_top = jnp.any(bins[:, None] == top_i[None, :], axis=1)
        ok = ok & (in_top | ~has_ang)

    return Matches(jnp.where(ok, best, -1), best_d, ok)


def radius_mask(xy_a, xy_b, radius):
    """(N, 2), (M, 2) -> (N, M) pairs within pixel radius.

    radius may be scalar or (N,) per-query (scale-dependent windows as in
    reference `SearchByProjection`)."""
    d2 = jnp.sum((xy_a[:, None, :] - xy_b[None, :, :]) ** 2, axis=-1)
    r = jnp.asarray(radius)
    r2 = (r ** 2)[..., None] if r.ndim == 1 else r ** 2
    return d2 <= r2


def level_band_mask(level_a, level_b, band=1):
    """Scale-consistency: |level_a − level_b| ≤ band (reference's
    predicted-octave window)."""
    return jnp.abs(level_a[:, None] - level_b[None, :]) <= band
