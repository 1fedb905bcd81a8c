"""Stereo matching and RGB-D depth synthesis.

Covers `Frame::ComputeStereoMatches` (reference `src/Frame.cc:467-620`: row
table -> best descriptor match along the epipolar row -> subpixel refinement
by sliding-window SAD parabola) and `ComputeStereoFromRGBD` (depth map ->
virtual right coordinate uR = u − bf/z).

TPU formulation: the row table becomes a row-band mask over a dense Hamming
matrix; the subpixel SAD correlation runs as a gathered (K, 2L+1, W) window
stack — fixed shapes, fully vectorized.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from dsp_slam_rgbd_tpu.frontend import matcher


class StereoMatches(NamedTuple):
    u_right: jnp.ndarray  # (N,) right x-coordinate (subpixel), −1 if none
    depth: jnp.ndarray    # (N,) z = bf / disparity, −1 if none
    valid: jnp.ndarray    # (N,) bool


@partial(jax.jit,
         static_argnames=("row_band", "max_disp", "sad_win", "sad_search"))
def match_stereo(feats_l, feats_r, img_l, img_r, bf: float,
                 min_z: float, row_band: float = 2.0, max_disp: float = None,
                 sad_win: int = 5, sad_search: int = 5) -> StereoMatches:
    """Match left keypoints to right keypoints along epipolar rows.

    min_z: minimum depth (= baseline in the reference, `Frame.cc:487`);
    max_disp = bf / min_z.
    """
    if max_disp is None:
        max_disp = bf / min_z
    xl, yl = feats_l.xy[:, 0], feats_l.xy[:, 1]
    xr, yr = feats_r.xy[:, 0], feats_r.xy[:, 1]

    # row band scales with octave (reference: 2 * scale of right kp)
    scale_r = 1.2 ** feats_r.level.astype(jnp.float32)
    band = row_band * scale_r[None, :]
    row_ok = jnp.abs(yl[:, None] - yr[None, :]) <= band
    disp = xl[:, None] - xr[None, :]
    disp_ok = (disp >= -1.0) & (disp <= max_disp)
    lvl_ok = matcher.level_band_mask(feats_l.level, feats_r.level, 1)

    # (TH_HIGH+TH_LOW)/2 matches the reference's thOrbDist (`Frame.cc:509`);
    # ratio+mutual kill the wrong-epipolar-candidate tail that otherwise
    # poisons depths through the subpixel refinement
    m = matcher.match(
        feats_l.desc, feats_l.valid, feats_r.desc, feats_r.valid,
        mask=row_ok & disp_ok & lvl_ok,
        max_dist=(matcher.TH_HIGH + matcher.TH_LOW) // 2,
        ratio=0.9, mutual=True,
    )

    # ---- subpixel refinement by SAD parabola (reference :530-590) ----
    w = sad_win
    L = sad_search
    pad = w + L + 1
    pl = jnp.pad(img_l, pad)
    pr = jnp.pad(img_r, pad)

    def refine(x_l, y_l, x_r0):
        yi = jnp.round(y_l).astype(jnp.int32) + pad
        xi_l = jnp.round(x_l).astype(jnp.int32) + pad
        xi_r = jnp.round(x_r0).astype(jnp.int32) + pad
        patch_l = jax.lax.dynamic_slice(
            pl, (yi - w, xi_l - w), (2 * w + 1, 2 * w + 1)
        )
        patch_l = patch_l - patch_l[w, w]
        strip_r = jax.lax.dynamic_slice(
            pr, (yi - w, xi_r - w - L), (2 * w + 1, 2 * w + 1 + 2 * L)
        )

        def sad(off):
            win = jax.lax.dynamic_slice(
                strip_r, (0, off), (2 * w + 1, 2 * w + 1)
            )
            win = win - win[w, w]
            return jnp.sum(jnp.abs(patch_l - win))

        sads = jax.vmap(sad)(jnp.arange(2 * L + 1))
        k = jnp.argmin(sads)
        ok = (k > 0) & (k < 2 * L)
        km = jnp.clip(k, 1, 2 * L - 1)
        d1, d0, d2 = sads[km - 1], sads[km], sads[km + 1]
        denom = jnp.maximum(d1 + d2 - 2.0 * d0, 1e-6)
        delta = (d1 - d2) / (2.0 * denom)
        delta = jnp.clip(delta, -1.0, 1.0)
        best_r = x_r0 + (km.astype(jnp.float32) - L) + delta
        return best_r, ok, d0

    x_r_matched = jnp.where(m.valid, xr[m.idx], 0.0)
    u_r, ref_ok, best_sad = jax.vmap(refine)(xl, yl, x_r_matched)

    disparity = xl - u_r
    ok = m.valid & ref_ok & (disparity > 0.0) & (disparity <= max_disp)
    # median-SAD outlier rejection (reference `Frame.cc:595-620`): sort the
    # accepted matches' best SAD distances and discard those beyond
    # 1.5·1.4·median — the gross mismatches that survive the descriptor +
    # epipolar gates (their wrong disparity makes grossly wrong map points)
    med = jnp.nanmedian(jnp.where(ok, best_sad, jnp.nan))
    ok = ok & jnp.where(jnp.isfinite(med), best_sad <= 1.5 * 1.4 * med, True)
    u_r = jnp.where(ok, u_r, -1.0)
    depth = jnp.where(ok, bf / jnp.maximum(disparity, 1e-6), -1.0)
    return StereoMatches(u_r, depth, ok)


@jax.jit
def depth_to_stereo(feats, depth_map: jnp.ndarray, bf: float,
                    depth_scale: float = 1.0) -> StereoMatches:
    """RGB-D: read z at each keypoint; uR = u − bf/z (reference
    `ComputeStereoFromRGBD`)."""
    x = jnp.clip(jnp.round(feats.xy[:, 0]).astype(jnp.int32), 0,
                 depth_map.shape[1] - 1)
    y = jnp.clip(jnp.round(feats.xy[:, 1]).astype(jnp.int32), 0,
                 depth_map.shape[0] - 1)
    z = depth_map[y, x] * depth_scale
    ok = feats.valid & (z > 0.0)
    u_r = jnp.where(ok, feats.xy[:, 0] - bf / jnp.maximum(z, 1e-6), -1.0)
    return StereoMatches(u_r, jnp.where(ok, z, -1.0), ok)
