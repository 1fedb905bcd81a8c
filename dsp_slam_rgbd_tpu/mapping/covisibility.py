"""Covisibility graph queries.

Replaces the reference's per-KF weighted connection lists
(`KeyFrame::UpdateConnections` / `GetBestCovisibilityKeyFrames`,
`src/KeyFrame.cc:125-203`): weight(i, j) = number of co-observed map points,
connections kept at weight ≥ 15.

Scale design: most consumers need a single row of the graph (the local-BA
window, neighbor picks, culling), which is O(K·F) via a point-mask gather —
no (K, P) intermediate.  The full (K, K) matrix — needed for loop-candidate
group scoring and essential-graph edge assembly — is one exact int8 MXU
matmul over the int8 membership matrix (counts ≤ F fit int32 accumulators),
not an f32 (K, P) product.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from dsp_slam_rgbd_tpu.mapping import map_state as ms

MIN_WEIGHT = 15


def covisibility_row(state: ms.MapState, kf: int) -> jnp.ndarray:
    """(K,) int32 co-observation counts of `kf` vs every KF (self zeroed).

    O(K·F): scatter kf's point set into a (P,) mask, gather it through the
    whole feature→point table, and sum per keyframe.
    """
    kf_mask = jnp.zeros(state.kf_valid.shape[0], bool).at[kf].set(True)
    pmask = ms.point_mask_of(state, kf_mask)
    ok = ms._obs_ok(state)
    hits = ok & pmask[jnp.maximum(state.kf_feat_pt, 0)]
    row = jnp.sum(hits, axis=1).astype(jnp.int32)
    row = row * state.kf_valid.astype(jnp.int32)
    return row.at[kf].set(0)


def covisibility_rows(state: ms.MapState, kfs: jnp.ndarray) -> jnp.ndarray:
    """(L, K) int32 co-observation counts for a batch of keyframes.

    vmapped `covisibility_row`: O(L·(P + K·F)) — the scale-safe way to get
    the covisible groups of a handful of loop/reloc candidates without the
    (K, K) matrix (reference: per-candidate `GetBestCovisibilityKeyFrames`,
    `KeyFrameDatabase.cc:131-160`)."""
    return jax.vmap(lambda k: covisibility_row(state, k))(kfs)


def covisibility_matrix(state: ms.MapState, chunk: int = 16) -> jnp.ndarray:
    """(K, K) int32 co-observation counts (diagonal zeroed).

    Memory-bounded: computed `chunk` rows at a time via `lax.map` —
    O(chunk·P) working set and O(K²·F) int ops total, instead of the
    (K, P) int8 membership matmul whose operand alone is ~600 MB at
    `MapConfig.kitti_large` capacities (2048 KF × 300k pts).  Used only by
    whole-graph consumers that run at loop-closure rate (essential-graph
    strong-edge extraction); per-keyframe retrieval uses
    `covisibility_row`/`covisibility_rows`.
    """
    K = state.kf_valid.shape[0]
    C = min(chunk, K)
    n_chunks = (K + C - 1) // C
    # row indices padded past K: covisibility_row of an always-invalid
    # virtual slot returns zeros (kf_valid gate), so padding rows are inert
    idx = jnp.minimum(jnp.arange(n_chunks * C), K - 1).reshape(n_chunks, C)
    pad_dead = (jnp.arange(n_chunks * C) < K).reshape(n_chunks, C)

    def one_chunk(args):
        ks, live = args
        rows = jax.vmap(lambda k: covisibility_row(state, k))(ks)
        return rows * live[:, None]

    W = jax.lax.map(one_chunk, (idx, pad_dead)).reshape(n_chunks * C, K)[:K]
    # covisibility_row zeroes self and gates columns by kf_valid; gate the
    # row side too so culled slots contribute nothing either way
    return W * state.kf_valid[:, None].astype(jnp.int32)


def local_window(state: ms.MapState, center_kf: int, max_kfs: int,
                 min_weight: int = MIN_WEIGHT):
    """Covisible neighborhood of a keyframe: the local-BA window
    (reference `LocalBundleAdjustment` covisible set, `Optimizer.cc:453`).

    Returns (kf_mask (K,) bool incl. center, frontier_mask (K,) bool —
    KFs that see the window's points but are not in it: held fixed,
    window_pts (P,) bool).  Row-wise: no (K, K) or dense (K, P) build.
    """
    w_center = covisibility_row(state, center_kf)
    in_window = (w_center >= min_weight) & state.kf_valid
    in_window = in_window.at[center_kf].set(True)
    # cap to the top max_kfs by weight
    score = jnp.where(in_window, w_center + 1, -1)
    score = score.at[center_kf].set(jnp.iinfo(jnp.int32).max)
    order = jnp.argsort(-score)
    keep = jnp.zeros_like(in_window).at[order[:max_kfs]].set(True)
    in_window = in_window & keep

    # frontier: any KF sharing ≥1 point with the window
    window_pts = ms.point_mask_of(state, in_window)
    sees = ms.kf_sees_mask(state, window_pts)
    frontier = sees & ~in_window & state.kf_valid
    return in_window, frontier, window_pts


def best_covisible(state: ms.MapState, kf: int, n: int):
    """Indices of the n best covisible KFs of `kf` (host helper)."""
    w = jnp.where(state.kf_valid, covisibility_row(state, kf), -1)
    return jnp.argsort(-w)[:n], jnp.sort(-w)[:n] * -1
