"""SLAM map state as fixed-capacity struct-of-arrays pytrees.

The TPU-native replacement for the reference's pointer-graph map
(`src/Map.cc`, `KeyFrame.cc`, `MapPoint.cc`, `MapObject.cc` with per-entity
mutexes): all state lives in HBM as padded arrays with validity masks; every
mutation is a functional update returning a new state (no locks — SURVEY.md
§2.4/§7 design stance).  Capacities are static so nothing recompiles as the
map grows.

Slot allocation runs on host (tracking is host-driven anyway): `alloc_slots`
returns free indices; culling just clears valid bits (`SetBadFlag` role).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class MapState(NamedTuple):
    # --- keyframes ---
    kf_pose: jnp.ndarray       # (K, 4, 4) T_cw
    kf_valid: jnp.ndarray      # (K,) bool
    kf_frame_id: jnp.ndarray   # (K,) int32 source frame index
    # per-KF features
    kf_xy: jnp.ndarray         # (K, F, 2)
    kf_level: jnp.ndarray      # (K, F) int32
    kf_desc: jnp.ndarray       # (K, F, 8) uint32
    kf_ur: jnp.ndarray         # (K, F) right coord (−1 mono)
    kf_feat_valid: jnp.ndarray # (K, F) bool
    kf_feat_pt: jnp.ndarray    # (K, F) int32 -> point slot or −1
    # --- map points ---
    pt_pos: jnp.ndarray        # (P, 3)
    pt_valid: jnp.ndarray      # (P,) bool
    pt_desc: jnp.ndarray       # (P, 8) uint32 distinctive descriptor
    pt_normal: jnp.ndarray     # (P, 3) mean viewing direction
    pt_min_d: jnp.ndarray      # (P,) scale-invariance range
    pt_max_d: jnp.ndarray
    pt_ref_kf: jnp.ndarray     # (P,) int32 reference KF
    pt_visible: jnp.ndarray    # (P,) int32 counters (found/visible ratio)
    pt_found: jnp.ndarray
    pt_first_kf: jnp.ndarray   # (P,) int32 for culling age
    pt_object: jnp.ndarray     # (P,) int32 owning object slot or −1 (fork's
                               # object_id / in_any_object, MapPoint_util.cc)
    pt_outlier: jnp.ndarray    # (P,) bool object-outlier flag (reference
                               # MapPoint SetOutlierFlag, MapPoint_util.cc)
    # --- objects ---
    obj_pose: jnp.ndarray      # (O, 4, 4) T_wo SE(3)
    obj_scale: jnp.ndarray     # (O,)
    obj_code: jnp.ndarray      # (O, L) shape codes
    obj_valid: jnp.ndarray     # (O,) bool
    obj_dynamic: jnp.ndarray   # (O,) bool
    obj_velocity: jnp.ndarray  # (O, 3)
    obj_n_obs: jnp.ndarray     # (O,) int32
    obj_last_kf: jnp.ndarray   # (O,) int32
    obj_ref_kfseq: jnp.ndarray # (O,) int32 KF sequence number at creation
                               # (mono every-5-KF schedule, reference
                               # LocalMapping_util.cc:286-299)
    obj_recon: jnp.ndarray     # (O,) bool reconstructed flag (reference
                               # MapObject::reconstructed)
    obj_bbox_min: jnp.ndarray  # (O, 3) decoded-shape bbox, normalized object
    obj_bbox_max: jnp.ndarray  # frame (reference mesh vertices min/max,
                               # MapObject.cc:285-296 RemoveOutliersModel)
    # object-KF relative pose observations (ring buffer per object)
    oobs_kf: jnp.ndarray       # (Q,) int32 KF slot
    oobs_obj: jnp.ndarray      # (Q,) int32 object slot
    oobs_t_co: jnp.ndarray     # (Q, 4, 4) measured T_co
    oobs_valid: jnp.ndarray    # (Q,) bool

    @property
    def max_kf(self):
        return self.kf_pose.shape[0]


def empty(max_kf: int = 64, max_feat: int = 1024, max_pts: int = 8192,
          max_obj: int = 16, code_len: int = 64, max_oobs: int = 256
          ) -> MapState:
    K, F, P, O, Q = max_kf, max_feat, max_pts, max_obj, max_oobs
    eye = jnp.broadcast_to(jnp.eye(4), (K, 4, 4))
    return MapState(
        kf_pose=jnp.asarray(eye),
        kf_valid=jnp.zeros(K, bool),
        kf_frame_id=jnp.full(K, -1, jnp.int32),
        kf_xy=jnp.zeros((K, F, 2)),
        kf_level=jnp.zeros((K, F), jnp.int32),
        kf_desc=jnp.zeros((K, F, 8), jnp.uint32),
        kf_ur=jnp.full((K, F), -1.0),
        kf_feat_valid=jnp.zeros((K, F), bool),
        kf_feat_pt=jnp.full((K, F), -1, jnp.int32),
        pt_pos=jnp.zeros((P, 3)),
        pt_valid=jnp.zeros(P, bool),
        pt_desc=jnp.zeros((P, 8), jnp.uint32),
        pt_normal=jnp.zeros((P, 3)),
        pt_min_d=jnp.zeros(P),
        pt_max_d=jnp.full(P, jnp.inf),
        pt_ref_kf=jnp.full(P, -1, jnp.int32),
        pt_visible=jnp.ones(P, jnp.int32),
        pt_found=jnp.ones(P, jnp.int32),
        pt_first_kf=jnp.full(P, -1, jnp.int32),
        pt_object=jnp.full(P, -1, jnp.int32),
        pt_outlier=jnp.zeros(P, bool),
        obj_pose=jnp.broadcast_to(jnp.eye(4), (O, 4, 4)),
        obj_scale=jnp.ones(O),
        obj_code=jnp.zeros((O, code_len)),
        obj_valid=jnp.zeros(O, bool),
        obj_dynamic=jnp.zeros(O, bool),
        obj_velocity=jnp.zeros((O, 3)),
        obj_n_obs=jnp.zeros(O, jnp.int32),
        obj_last_kf=jnp.full(O, -1, jnp.int32),
        obj_ref_kfseq=jnp.full(O, -1, jnp.int32),
        obj_recon=jnp.zeros(O, bool),
        obj_bbox_min=jnp.full((O, 3), -1.0),
        obj_bbox_max=jnp.full((O, 3), 1.0),
        oobs_kf=jnp.full(Q, -1, jnp.int32),
        oobs_obj=jnp.full(Q, -1, jnp.int32),
        oobs_t_co=jnp.broadcast_to(jnp.eye(4), (Q, 4, 4)),
        oobs_valid=jnp.zeros(Q, bool),
    )


def alloc_slots(valid_mask: np.ndarray, n: int) -> np.ndarray:
    """Host-side: first n free slot indices (−1 padding if full)."""
    free = np.nonzero(~np.asarray(valid_mask))[0]
    out = np.full(n, -1, np.int64)
    out[: min(n, len(free))] = free[:n]
    return out


def free_slots_device(valid_mask: jnp.ndarray, n: int) -> jnp.ndarray:
    """Device-side alloc_slots: first n free slot indices, −1 padded.

    `lax.top_k` over the free mask — ties broken by lowest index, so free
    slots come out in ascending order like the host version.  Keeping the
    allocation on device removes a per-call (capacity,)-bool fetch over
    the remote-TPU tunnel (one blocking RTT each in the keyframe stage)."""
    P = valid_mask.shape[0]
    k = min(n, P)
    vals, idx = jax.lax.top_k(jnp.where(valid_mask, 0, 1), k)
    out = jnp.where(vals > 0, idx, -1).astype(jnp.int32)
    return jnp.pad(out, (0, n - k), constant_values=-1)


def membership_matrix(state: MapState) -> jnp.ndarray:
    """(K, P) bool: KF k observes point p.  Built by scatter from the
    per-KF feature→point table; the base for covisibility (M @ Mᵀ).

    NOTE: O(K·P) memory — only for small maps / tests and the int8
    covisibility matmul.  Scale-friendly queries should use `point_mask_of`
    / `obs_indices` / `point_obs_counts` below, which stay O(K·F)."""
    K, F = state.kf_feat_pt.shape
    P = state.pt_pos.shape[0]
    kf_idx = jnp.repeat(jnp.arange(K), F)
    pt_idx = state.kf_feat_pt.reshape(-1)
    ok = (pt_idx >= 0) & state.kf_feat_valid.reshape(-1)
    pt_safe = jnp.where(ok, pt_idx, P)
    M = jnp.zeros((K, P + 1), bool).at[kf_idx, pt_safe].max(ok)
    return M[:, :P] & state.kf_valid[:, None] & state.pt_valid[None, :]


def _obs_ok(state: MapState) -> jnp.ndarray:
    """(K, F) bool: feature slot holds a live observation of a live point."""
    pt = state.kf_feat_pt
    return (
        (pt >= 0)
        & state.kf_feat_valid
        & state.kf_valid[:, None]
        & state.pt_valid[jnp.maximum(pt, 0)]
    )


def point_mask_of(state: MapState, kf_mask: jnp.ndarray) -> jnp.ndarray:
    """(P,) bool: points observed by any KF in `kf_mask` — the O(K·F)
    replacement for `membership_matrix(state)[kf_mask].any(0)`."""
    P = state.pt_pos.shape[0]
    ok = _obs_ok(state) & kf_mask[:, None]
    tgt = jnp.where(ok, state.kf_feat_pt, P)
    return jnp.zeros(P + 1, bool).at[tgt.reshape(-1)].max(
        ok.reshape(-1)
    )[:P]


def point_obs_counts(state: MapState) -> jnp.ndarray:
    """(P,) int32 number of observing keyframes per point (O(K·F))."""
    P = state.pt_pos.shape[0]
    ok = _obs_ok(state)
    tgt = jnp.where(ok, state.kf_feat_pt, P)
    return jnp.zeros(P + 1, jnp.int32).at[tgt.reshape(-1)].add(
        ok.reshape(-1).astype(jnp.int32)
    )[:P]


def point_obs_counts_weighted(state: MapState) -> jnp.ndarray:
    """(P,) int32 observation count with STEREO observations counted twice —
    the reference's `MapPoint::AddObservation` does `nObs += 2` when the
    keyframe has a right coordinate for the feature (`MapPoint.cc:100-108`),
    so the culling gate `Observations() <= 3` really means "fewer than two
    stereo keyframes"."""
    P = state.pt_pos.shape[0]
    ok = _obs_ok(state)
    w = jnp.where(state.kf_ur >= 0, 2, 1).astype(jnp.int32)
    tgt = jnp.where(ok, state.kf_feat_pt, P)
    return jnp.zeros(P + 1, jnp.int32).at[tgt.reshape(-1)].add(
        jnp.where(ok, w, 0).reshape(-1)
    )[:P]


def kf_sees_mask(state: MapState, pt_mask: jnp.ndarray) -> jnp.ndarray:
    """(K,) bool: KFs observing at least one point in `pt_mask` (O(K·F))."""
    ok = _obs_ok(state)
    hits = ok & pt_mask[jnp.maximum(state.kf_feat_pt, 0)]
    return jnp.any(hits, axis=1)
