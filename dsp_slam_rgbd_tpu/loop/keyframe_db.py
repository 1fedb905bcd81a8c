"""Keyframe database: place-recognition retrieval over BoW vectors.

Covers `KeyFrameDatabase` (`src/KeyFrameDatabase.cc`): the inverted file +
accumulated-score grouping of `DetectLoopCandidates` (:76) and
`DetectRelocalizationCandidates` (:199).  On TPU the inverted file is simply
the dense (K, W) BoW matrix — common-word counts and L1 scores against all
keyframes are two matmul-like ops, so candidate selection is fully
vectorized instead of list-walking.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from dsp_slam_rgbd_tpu.loop import vocabulary as vocab_mod


class BowDatabase(NamedTuple):
    bow: jnp.ndarray        # (K, W) L1-normalized BoW vectors
    kf_valid: jnp.ndarray   # (K,)

    def add(self, kf_slot: int, v: jnp.ndarray):
        return self._replace(
            bow=self.bow.at[kf_slot].set(v),
            kf_valid=self.kf_valid.at[kf_slot].set(True),
        )

    def remove(self, kf_slot: int):
        """Purge a culled keyframe (reference `KeyFrameDatabase::erase`) —
        otherwise dead slots keep surfacing as loop/reloc candidates."""
        return self._replace(
            bow=self.bow.at[kf_slot].set(0.0),
            kf_valid=self.kf_valid.at[kf_slot].set(False),
        )


def empty(max_kf: int, n_words: int) -> BowDatabase:
    return BowDatabase(jnp.zeros((max_kf, n_words)),
                       jnp.zeros(max_kf, bool))


def detect_loop_candidates(db: BowDatabase, query: jnp.ndarray,
                           connected_mask: jnp.ndarray,
                           covis_weights: jnp.ndarray,
                           min_score_ref: jnp.ndarray | None = None):
    """Loop candidates for one query KF.

    connected_mask: (K,) covisibility-connected KFs (excluded — reference
    `DetectLoopCandidates` skips the connected set).
    min_score_ref: minimum L1 score among covisible neighbors (the
    reference's baseline `minScore`); computed here if None.
    scores accumulate over each candidate's covisible group
    (`accScore`, :131-160) via the covisibility weight matrix.
    Returns (candidate_mask (K,), scores (K,)).
    """
    scores = vocab_mod.l1_score(db.bow, query[None, :])  # (K,)
    if min_score_ref is None:
        cov_scores = jnp.where(connected_mask & db.kf_valid, scores, jnp.inf)
        min_score_ref = jnp.minimum(jnp.min(cov_scores), 1.0)
        min_score_ref = jnp.where(jnp.isfinite(min_score_ref),
                                  min_score_ref, 0.0)

    eligible = db.kf_valid & ~connected_mask & (scores >= min_score_ref)
    # group score: candidate + its covisible neighbors' scores
    neigh = (covis_weights > 0).astype(jnp.float32)
    acc = scores + neigh @ jnp.where(eligible, scores, 0.0)
    best_acc = jnp.max(jnp.where(eligible, acc, 0.0))
    keep = eligible & (acc >= 0.75 * best_acc)
    return keep, scores


def detect_reloc_candidates(db: BowDatabase, query: jnp.ndarray,
                            covis_weights: jnp.ndarray):
    """Relocalization candidates (no connected-set exclusion, score ≥ 0.75
    of best group score — reference :199-310)."""
    scores = vocab_mod.l1_score(db.bow, query[None, :])
    eligible = db.kf_valid & (scores > 0.0)
    neigh = (covis_weights > 0).astype(jnp.float32)
    acc = scores + neigh @ jnp.where(eligible, scores, 0.0)
    best = jnp.max(jnp.where(eligible, acc, 0.0))
    return eligible & (acc >= 0.75 * best), scores
