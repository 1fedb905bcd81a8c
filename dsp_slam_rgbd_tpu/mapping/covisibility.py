"""Covisibility graph as a dense integer weight matrix.

Replaces the reference's per-KF weighted connection lists
(`KeyFrame::UpdateConnections` / `GetBestCovisibilityKeyFrames`,
`src/KeyFrame.cc:125-203`): weight(i, j) = number of co-observed map points,
connections kept at weight ≥ 15.  On TPU the whole graph is one matmul of
the (K, P) membership matrix — recomputed from scratch each time, which is
cheaper than incremental bookkeeping at these sizes.
"""
from __future__ import annotations

import jax.numpy as jnp

from dsp_slam_rgbd_tpu.mapping import map_state as ms

MIN_WEIGHT = 15


def covisibility_matrix(state: ms.MapState) -> jnp.ndarray:
    """(K, K) int32 co-observation counts (diagonal zeroed)."""
    M = ms.membership_matrix(state).astype(jnp.float32)
    W = (M @ M.T).astype(jnp.int32)
    K = W.shape[0]
    return W * (1 - jnp.eye(K, dtype=jnp.int32))


def local_window(state: ms.MapState, center_kf: int, max_kfs: int,
                 min_weight: int = MIN_WEIGHT):
    """Covisible neighborhood of a keyframe: the local-BA window
    (reference `LocalBundleAdjustment` covisible set, `Optimizer.cc:453`).

    Returns (kf_mask (K,) bool incl. center, frontier_mask (K,) bool —
    KFs that see the window's points but are not in it: held fixed)."""
    W = covisibility_matrix(state)
    w_center = W[center_kf]
    in_window = (w_center >= min_weight) & state.kf_valid
    in_window = in_window.at[center_kf].set(True)
    # cap to the top max_kfs by weight
    score = jnp.where(in_window, w_center + 1, -1)
    score = score.at[center_kf].set(jnp.iinfo(jnp.int32).max)
    order = jnp.argsort(-score)
    keep = jnp.zeros_like(in_window).at[order[:max_kfs]].set(True)
    in_window = in_window & keep

    # frontier: any KF sharing ≥1 point with the window
    M = ms.membership_matrix(state)
    window_pts = jnp.any(M & in_window[:, None], axis=0)  # (P,)
    sees = jnp.any(M & window_pts[None, :], axis=1)  # (K,)
    frontier = sees & ~in_window & state.kf_valid
    return in_window, frontier, window_pts


def best_covisible(state: ms.MapState, kf: int, n: int):
    """Indices of the n best covisible KFs of `kf` (host helper)."""
    W = covisibility_matrix(state)
    w = jnp.where(state.kf_valid, W[kf], -1)
    return jnp.argsort(-w)[:n], jnp.sort(-w)[:n] * -1
