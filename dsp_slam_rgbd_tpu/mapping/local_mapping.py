"""Local mapping: keyframe insertion, point management, local (joint) BA.

Covers the `LocalMapping` thread pipeline (`src/LocalMapping.cc:55-164`):
ProcessNewKeyFrame (:180), MapPointCulling (:222), CreateNewMapPoints
(:259 — here stereo-depth spawning + two-view triangulation with the best
covisible neighbor), SearchInNeighbors fusion (:506 — duplicate merge by
projective match), the object stage (association, pose-only/joint GN,
observation insertion — `LocalMapping_util.cc`), and
LocalJointBundleAdjustment (`Optimizer_util.cc:309`).

Host code assembles fixed-capacity problems (control plane, numpy); all
solves are the jitted kernels in ba.py / recon/optimizer.py.  BA problems
are COMPACTED to the window (LocalIndex maps local blocks → global slots)
with power-of-two capacity buckets derived from the actual window contents —
map capacity can be KITTI-00-sized (2k KFs / 300k points) while local BA
stays a ≤64-pose dense problem and global BA takes the matrix-free PCG
path.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from dsp_slam_rgbd_tpu.config import SystemConfig
from dsp_slam_rgbd_tpu.frontend import matcher
from dsp_slam_rgbd_tpu.mapping import ba, covisibility as covis
from dsp_slam_rgbd_tpu.mapping import map_state as ms
from dsp_slam_rgbd_tpu.ops import camera as cam_ops
from dsp_slam_rgbd_tpu.ops import lie
from dsp_slam_rgbd_tpu.solvers import triangulate as tri


@jax.jit
def insert_keyframe(state: ms.MapState, frame, kf_slot: int,
                    frame_id: int) -> ms.MapState:
    """Write a tracked frame into a KF slot (ProcessNewKeyFrame role).
    One fused dispatch (9 eager scatters cost 9 tunnel roundtrips)."""
    F = state.kf_xy.shape[1]
    n = min(frame.feats.xy.shape[0], F)
    pad = lambda a, fill: jnp.concatenate(
        [a[:n], jnp.full((F - n,) + a.shape[1:], fill, a.dtype)]
    ) if a.shape[0] != F else a
    state = state._replace(
        kf_pose=state.kf_pose.at[kf_slot].set(frame.t_cw),
        kf_valid=state.kf_valid.at[kf_slot].set(True),
        kf_frame_id=state.kf_frame_id.at[kf_slot].set(frame_id),
        kf_xy=state.kf_xy.at[kf_slot].set(pad(frame.feats.xy, 0.0)),
        kf_level=state.kf_level.at[kf_slot].set(pad(frame.feats.level, 0)),
        kf_desc=state.kf_desc.at[kf_slot].set(pad(frame.feats.desc, 0)),
        kf_ur=state.kf_ur.at[kf_slot].set(pad(frame.ur, -1.0)),
        kf_feat_valid=state.kf_feat_valid.at[kf_slot].set(
            pad(frame.feats.valid, False)
        ),
        kf_feat_pt=state.kf_feat_pt.at[kf_slot].set(pad(frame.pt_idx, -1)),
    )
    return state


def _pad_idx(a: np.ndarray, cap: int, drop: int) -> jnp.ndarray:
    """Pad a host index array to a FIXED capacity.  `drop` should be an
    out-of-bounds target so `mode="drop"` scatters ignore the padding (or 0
    for gathers, whose padded rows are discarded by the paired scatter).
    Fixed shapes keep one compiled scatter per capacity — a raw variable-
    length `.at[idx].set` recompiles for every distinct count, which
    profiling showed as per-keyframe XLA compiles."""
    out = np.full(cap, drop, np.int64)
    out[: len(a)] = a
    return jnp.asarray(out)


@partial(jax.jit, static_argnames=("cam", "max_new"))
def _spawn_depth_device(state: ms.MapState, cam, kf_slot, frame,
                        th_depth, first_id, max_new: int):
    P = state.pt_pos.shape[0]
    F = state.kf_feat_pt.shape[1]
    slots = ms.free_slots_device(state.pt_valid, max_new)
    has = (frame.depth > 0) & (frame.depth < th_depth) \
        & frame.feats.valid & (frame.pt_idx < 0)
    # closest-first, capped at max_new (the reference sorts by depth and
    # stops at 100 close points / `Tracking.cc:1210-1230`)
    score = jnp.where(has, -frame.depth, -jnp.inf)
    k = min(max_new, score.shape[0])
    vals, ch = jax.lax.top_k(score, k)
    live = jnp.isfinite(vals)
    sl_raw = slots[:k]
    sl = jnp.where(live & (sl_raw >= 0), jnp.maximum(sl_raw, 0), P)
    feat_tgt = jnp.where(sl < P, ch, F)

    uv = frame.feats.xy[ch]
    z = frame.depth[ch]
    p_cam = cam_ops.backproject(cam, uv, z)
    t_wc = lie.inv_se3(frame.t_cw)
    p_w = lie.transform_points(t_wc, p_cam)

    sl_val = jnp.where(sl < P, sl, -1).astype(jnp.int32)
    return state._replace(
        pt_pos=state.pt_pos.at[sl].set(p_w, mode="drop"),
        pt_valid=state.pt_valid.at[sl].set(True, mode="drop"),
        pt_desc=state.pt_desc.at[sl].set(frame.feats.desc[ch], mode="drop"),
        pt_ref_kf=state.pt_ref_kf.at[sl].set(kf_slot, mode="drop"),
        pt_first_kf=state.pt_first_kf.at[sl].set(first_id, mode="drop"),
        # reset the found/visible counters: a recycled point slot must NOT
        # inherit the evicted point's ratio (an inherited ratio < 0.25 made
        # cull_points evict fresh points the moment slot reuse began)
        pt_visible=state.pt_visible.at[sl].set(1, mode="drop"),
        pt_found=state.pt_found.at[sl].set(1, mode="drop"),
        kf_feat_pt=state.kf_feat_pt.at[kf_slot, feat_tgt].set(
            sl_val, mode="drop"
        ),
    )


def spawn_depth_points(state: ms.MapState, cam, kf_slot: int, frame,
                       th_depth: float, max_new: int = 256,
                       first_id: int | None = None) -> ms.MapState:
    """Create map points from close stereo/RGB-D depth for features without
    an associated point (reference `CreateNewKeyFrame` close-point spawning,
    `Tracking.cc:1185-1237`).  Host pre-allocates slots; selection and
    scatters run as one device program.

    first_id: MONOTONIC keyframe id stamped as the points' creation age for
    cull_points (the reference's mnFirstKFid).  KF slot indices are recycled
    after culling, so a slot index is not a usable age."""
    if first_id is None:
        first_id = kf_slot
    return _spawn_depth_device(state, cam, kf_slot, frame, th_depth,
                               jnp.int32(first_id), max_new)


@partial(jax.jit, static_argnames=("cam", "max_new", "n_neighbors"))
def _triangulate_device(state: ms.MapState, cam, kf_slot, first_id,
                        max_new: int, n_neighbors: int):
    """Two-view triangulation against the best covisible neighbors as ONE
    fused program: a `lax.scan` over the neighbor axis replaces the host
    loop (which paid per-neighbor dispatch+fetch roundtrips — ~100 per
    keyframe over the TPU tunnel).  Features claimed against one neighbor
    leave the free pool before the next, like the reference's sequential
    per-neighbor loop; a carried cursor walks the pre-allocated point
    slots so earlier neighbors never lose their claims.

    Returns (new state, n_created)."""
    K = state.kf_valid.shape[0]
    P = state.pt_pos.shape[0]
    F = state.kf_feat_pt.shape[1]
    slots = ms.free_slots_device(state.pt_valid, max_new)

    # neighbor order by covisibility weight (GetBestCovisibilityKeyFrames)
    row = covis.covisibility_row(state, kf_slot)
    w_sorted, order = jax.lax.top_k(row, min(n_neighbors, K))

    t1 = state.kf_pose[kf_slot]
    c1 = lie.inv_se3(t1)[:3, 3]
    is_stereo = cam.bf > 0.0
    uv1 = state.kf_xy[kf_slot]
    desc1 = state.kf_desc[kf_slot]
    slot_ok = slots >= 0
    slots_safe = jnp.where(slot_ok, slots, P)

    def per_neighbor(carry, nb_w):
        pt_pos, pt_valid, pt_desc, pt_ref, pt_first, pt_vis, pt_fnd, \
            kf_feat_pt, free_a, cursor = carry
        nb, w = nb_w
        nb_ok = (nb != kf_slot) & (w >= covis.MIN_WEIGHT)

        t2 = state.kf_pose[nb]
        c2 = lie.inv_se3(t2)[:3, 3]
        baseline = jnp.linalg.norm(c2 - c1)
        if is_stereo:
            # stereo baseline gate (reference :289-306)
            nb_ok = nb_ok & (baseline >= cam.bf / cam.fx)
        else:
            # mono: baseline / median scene depth > 0.01
            obs_pt = kf_feat_pt[nb]
            seen = (obs_pt >= 0) & state.kf_feat_valid[nb]
            pc2 = lie.transform_points(t2, pt_pos[jnp.maximum(obs_pt, 0)])
            z = jnp.where(seen, pc2[:, 2], jnp.nan)
            med = jnp.nanmedian(z)
            nb_ok = nb_ok & jnp.where(
                jnp.isfinite(med) & (med > 0), baseline / med > 0.01, True)

        free_b = state.kf_feat_valid[nb] & (kf_feat_pt[nb] < 0)
        m = matcher.match(desc1, free_a & nb_ok, state.kf_desc[nb],
                          free_b, max_dist=matcher.TH_LOW, ratio=0.8,
                          mutual=True)
        uv2 = state.kf_xy[nb][jnp.maximum(m.idx, 0)]
        # midpoint triangulation (closed-form 3x3, origin-shifted for f32):
        # replaces the batched 4x4-eigh DLT that cost ~74 ms/keyframe
        pts = tri.triangulate_two_views_fast(cam, cam, t1, t2, uv1, uv2)
        masks = tri.acceptance_masks(cam, cam, t1, t2, pts, uv1, uv2)
        good = m.valid & masks["parallax"] & masks["depth"] \
            & masks["reproj"] & jnp.all(jnp.isfinite(pts), axis=-1) & nb_ok

        # rank accepted features; claim slots cursor..cursor+n_good-1
        rank = jnp.cumsum(good.astype(jnp.int32)) - 1
        take = good & (cursor + rank < max_new)
        sl_i = jnp.clip(cursor + rank, 0, max_new - 1)
        sl = jnp.where(take & slot_ok[sl_i], slots_safe[sl_i], P)  # P drops
        sl_val = jnp.where(sl < P, sl, -1).astype(jnp.int32)

        pt_pos = pt_pos.at[sl].set(pts, mode="drop")
        pt_valid = pt_valid.at[sl].set(True, mode="drop")
        pt_desc = pt_desc.at[sl].set(desc1, mode="drop")
        pt_ref = pt_ref.at[sl].set(kf_slot, mode="drop")
        pt_first = pt_first.at[sl].set(first_id, mode="drop")
        # fresh counters for recycled slots (see _spawn_depth_device)
        pt_vis = pt_vis.at[sl].set(1, mode="drop")
        pt_fnd = pt_fnd.at[sl].set(1, mode="drop")
        feat_tgt = jnp.where(sl < P, jnp.arange(F), F)
        nb_tgt = jnp.where(sl < P, jnp.maximum(m.idx, 0), F)
        kf_feat_pt = kf_feat_pt.at[kf_slot, feat_tgt].set(sl_val,
                                                          mode="drop") \
                               .at[nb, nb_tgt].set(sl_val, mode="drop")
        free_a = free_a & (sl >= P)
        cursor = cursor + jnp.sum((sl < P).astype(jnp.int32))
        return (pt_pos, pt_valid, pt_desc, pt_ref, pt_first, pt_vis, pt_fnd,
                kf_feat_pt, free_a, cursor), None

    free_a0 = state.kf_feat_valid[kf_slot] & (state.kf_feat_pt[kf_slot] < 0)
    carry0 = (state.pt_pos, state.pt_valid, state.pt_desc, state.pt_ref_kf,
              state.pt_first_kf, state.pt_visible, state.pt_found,
              state.kf_feat_pt, free_a0, jnp.int32(0))
    carry, _ = jax.lax.scan(per_neighbor, carry0,
                            (order, w_sorted))
    (pt_pos, pt_valid, pt_desc, pt_ref, pt_first, pt_vis, pt_fnd,
     kf_feat_pt, _, n) = carry
    return state._replace(
        pt_pos=pt_pos, pt_valid=pt_valid, pt_desc=pt_desc,
        pt_ref_kf=pt_ref, pt_first_kf=pt_first, pt_visible=pt_vis,
        pt_found=pt_fnd, kf_feat_pt=kf_feat_pt,
    ), n


def triangulate_new_points(state: ms.MapState, cam, kf_slot: int,
                           max_new: int = 256, n_neighbors: int = 10,
                           first_id: int | None = None) -> ms.MapState:
    """Two-view triangulation against the best covisible neighbors
    (CreateNewMapPoints :259: nn = 10 stereo / 20 mono neighbors, baseline
    gate, epipolar-constrained match).  Host wrapper: pre-allocates free
    point slots, then runs the fused neighbor scan on device.

    first_id: monotonic keyframe id for point-culling age (see
    spawn_depth_points)."""
    if first_id is None:
        first_id = kf_slot
    new_state, _ = _triangulate_device(state, cam, kf_slot,
                                       jnp.int32(first_id), max_new,
                                       n_neighbors)
    return new_state


@partial(jax.jit, static_argnames=("cam",))
def fuse_neighbors(state: ms.MapState, cam, kf_slot: int,
                   radius: float = 3.0) -> ms.MapState:
    """SearchInNeighbors role (:506): project the 3 best covisible
    neighbors' points into this KF; unassociated features matching a
    projected point adopt it.  One fused dispatch — neighbor selection,
    point-mask build, projective match and the association scatter all
    stay on device."""
    from dsp_slam_rgbd_tpu.tracking.tracker import _match_body

    K = state.kf_valid.shape[0]
    row = covis.covisibility_row(state, kf_slot)
    w, order = jax.lax.top_k(row, min(3, K))
    nb_mask = jnp.zeros(K + 1, bool).at[
        jnp.where(w >= covis.MIN_WEIGHT, order, K)].set(True)[:K]
    nb_pts = ms.point_mask_of(state, nb_mask)

    free = state.kf_feat_valid[kf_slot] & (state.kf_feat_pt[kf_slot] < 0)
    pt_idx, matched, _ = _match_body(
        cam, state.kf_pose[kf_slot], state.pt_pos, nb_pts & state.pt_valid,
        state.pt_desc, state.kf_xy[kf_slot], state.kf_desc[kf_slot],
        state.kf_level[kf_slot], free, radius=radius,
    )
    new_assoc = jnp.where(matched & free, pt_idx, state.kf_feat_pt[kf_slot])
    return state._replace(
        kf_feat_pt=state.kf_feat_pt.at[kf_slot].set(
            new_assoc.astype(jnp.int32)
        )
    )


@jax.jit
def update_point_geometry(state: ms.MapState) -> ms.MapState:
    """Refresh per-point viewing normals and scale-invariance depth ranges
    (`MapPoint::UpdateNormalAndDepth`/`PredictScale`,
    `src/MapPoint.cc:336-421`): normal = mean direction from observing
    camera centers; [min_d, max_d] from the reference-KF distance and the
    octave of its observation.

    Edgewise over the (K, F) observation table — O(K·F), no (K, P) or
    (P, F) intermediates, so it scales to ≥300k-point maps."""
    K, F = state.kf_feat_pt.shape
    P = state.pt_pos.shape[0]
    t_wc = jax.vmap(lie.inv_se3)(state.kf_pose)
    centers = t_wc[:, :3, 3]  # (K, 3)

    ok = ms._obs_ok(state)                                 # (K, F)
    pt = jnp.maximum(state.kf_feat_pt, 0)                  # (K, F)
    diff = state.pt_pos[pt] - centers[:, None, :]          # (K, F, 3)
    dirs = diff / jnp.maximum(
        jnp.linalg.norm(diff, axis=-1, keepdims=True), 1e-9
    )
    tgt = jnp.where(ok, pt, P).reshape(-1)
    nsum = jnp.zeros((P + 1, 3)).at[tgt].add(
        jnp.where(ok[..., None], dirs, 0.0).reshape(-1, 3)
    )[:P]
    n_obs = jnp.maximum(ms.point_obs_counts(state), 1).astype(jnp.float32)
    normal = nsum / n_obs[:, None]

    ref = jnp.maximum(state.pt_ref_kf, 0)
    dist = jnp.linalg.norm(state.pt_pos - centers[ref], axis=-1)
    # octave of the point's observation in its reference KF: scatter levels
    # from observations whose KF is the point's reference KF
    is_ref = ok & (jnp.arange(K)[:, None] == state.pt_ref_kf[pt])
    tgt_ref = jnp.where(is_ref, pt, P).reshape(-1)
    lvl = jnp.zeros(P + 1, jnp.int32).at[tgt_ref].max(
        jnp.where(is_ref, state.kf_level, 0).reshape(-1)
    )[:P].astype(jnp.float32)
    max_d = dist * (1.2 ** lvl)
    min_d = max_d / (1.2 ** 7)
    live = state.pt_valid
    return state._replace(
        pt_normal=jnp.where(live[:, None], normal, state.pt_normal),
        pt_min_d=jnp.where(live, min_d, state.pt_min_d),
        pt_max_d=jnp.where(live, max_d, state.pt_max_d),
    )


@partial(jax.jit, static_argnames=("min_found_ratio", "min_obs_after"))
def cull_points(state: ms.MapState, current_id: int,
                min_found_ratio: float = 0.2,
                min_obs_after: int = 4) -> ms.MapState:
    """MapPointCulling (`LocalMapping.cc:222`): judge RECENT points only —
    the reference walks mlpRecentAddedMapPoints and a point leaves that list
    for good once 3 keyframes have passed since its creation.  Culling
    mature points by found/visible ratio is wrong: on a revisit, drifted
    old points become visible-but-unmatched and the whole established map
    erodes (observed as mass point loss on a loop's return leg).

    current_id: the MONOTONIC keyframe id of the keyframe being processed
    (same counter stamped into pt_first_kf at creation — KF slot indices
    are recycled and cannot express age).

    min_obs_after: a recent point with weighted obs < this at age ≥ 2 dies —
    the reference's `Observations() <= cnThObs` with cnThObs = 3 stereo / 2
    mono (`LocalMapping.cc:230-245`), i.e. pass 4 (stereo) or 3 (mono).
    Stereo observations count double (MapPoint::AddObservation nObs += 2),
    so a point seen by 2 stereo keyframes survives the stereo gate.

    min_found_ratio: 0.2 vs the reference's 0.25 — this matcher is mutual +
    second-best-ratio gated, so per-frame found coverage of in-frustum
    points is structurally lower than the reference's point-claims-feature
    search; at 0.25 healthy fresh points died in droves (measured on the
    long-run fixture), at 0.2 the arm only catches pathological points."""
    n_obs = ms.point_obs_counts_weighted(state)
    ratio = state.pt_found.astype(jnp.float32) / jnp.maximum(
        state.pt_visible.astype(jnp.float32), 1.0
    )
    age = current_id - state.pt_first_kf
    recent = (age >= 0) & (age < 3) & (state.pt_first_kf >= 0)
    bad = recent & (
        (ratio < min_found_ratio) | ((age >= 2) & (n_obs < min_obs_after)))
    keep = state.pt_valid & ~bad
    # detach dead points from KF feature tables
    dead = state.pt_valid & ~keep
    assoc = state.kf_feat_pt
    assoc = jnp.where(dead[jnp.maximum(assoc, 0)] & (assoc >= 0), -1, assoc)
    return state._replace(pt_valid=keep, kf_feat_pt=assoc)


def cull_keyframes(state: ms.MapState, kf_slot: int,
                   redundancy: float = 0.9, max_cull: int = 2):
    """KeyFrameCulling (:684): local KFs whose points are ≥90% seen by ≥3
    other KFs are removed.  Returns (state, [culled_slots]) — the caller
    must purge each slot from the BoW database and re-anchor any frame
    trajectory entries referencing it (the reference re-parents frames to
    the spanning tree on culling).  Culled slots' pose array entries are
    left intact so re-anchoring can read them.

    Like the reference's sequential per-KF loop, removal is iterative — a
    cull changes the observation counts the next candidate is judged by —
    but the rounds run as one device `lax.scan` (each round is a vectorized
    masked reduction over the (K, F) table; the host fetches one small
    culled-slot vector instead of paying an argmax roundtrip per round).
    `max_cull` bounds the rounds (the reference visits each local KF once;
    in practice ≥2 culls in one keyframe's window are rare — profiled at
    ~13 ms/round on a v5e, so the default is 2 rounds)."""
    new_state, culled_v = _cull_keyframes_device(state, kf_slot, redundancy,
                                                 max_cull)
    culled_v = np.asarray(culled_v)
    return new_state, [int(k) for k in culled_v if k >= 0]


@partial(jax.jit, static_argnames=("redundancy", "max_cull"))
def _cull_keyframes_device(state: ms.MapState, kf_slot,
                           redundancy: float, max_cull: int):
    K = state.kf_valid.shape[0]

    def one_round(carry, _):
        kf_valid, kf_feat_pt = carry
        st = state._replace(kf_valid=kf_valid, kf_feat_pt=kf_feat_pt)
        n_obs = ms.point_obs_counts(st)                     # (P,)
        local = (covis.covisibility_row(st, kf_slot) >= covis.MIN_WEIGHT) \
            & kf_valid
        local = local.at[kf_slot].set(False)  # never cull the fresh KF
        ok = ms._obs_ok(st)                                 # (K, F)
        pt = jnp.maximum(kf_feat_pt, 0)
        redundant = ok & (n_obs[pt] >= 4)                   # seen by ≥3 others
        mine = jnp.sum(ok, axis=1).astype(jnp.float32)      # (K,)
        red = jnp.sum(redundant, axis=1).astype(jnp.float32)
        cand = local & (mine > 0) & (red >= redundancy * mine)
        frac = jnp.where(cand, red / jnp.maximum(mine, 1.0), -1.0)
        k = jnp.argmax(frac)
        hit = cand[k]
        tgt = jnp.where(hit, k, K)  # K = dropped
        kf_valid = kf_valid.at[tgt].set(False, mode="drop")
        kf_feat_pt = kf_feat_pt.at[tgt].set(-1, mode="drop")
        return (kf_valid, kf_feat_pt), jnp.where(hit, k, -1).astype(jnp.int32)

    (kf_valid, kf_feat_pt), culled = jax.lax.scan(
        one_round, (state.kf_valid, state.kf_feat_pt), None,
        length=max_cull)
    state = state._replace(kf_valid=kf_valid, kf_feat_pt=kf_feat_pt)
    # re-anchor pt_ref_kf away from culled slots: loop correction and
    # point-geometry maintenance move each point WITH its reference
    # keyframe — a stale ref whose slot is later recycled makes the point
    # ride an unrelated keyframe's motion and scrambles the map exactly
    # when a loop closes (the reference reassigns mpRefKF in
    # MapPoint::EraseObservation).  New ref = the observing KF with the
    # newest frame id, found via one scatter-max over the obs table.
    P = state.pt_pos.shape[0]
    ok = ms._obs_ok(state)
    enc = jnp.where(ok, state.kf_frame_id[:, None] * K
                    + jnp.arange(K)[:, None], -1)
    tgt = jnp.where(ok, state.kf_feat_pt, P)
    best = jnp.full(P + 1, -1, enc.dtype).at[tgt.reshape(-1)].max(
        enc.reshape(-1))[:P]
    ref = state.pt_ref_kf
    ref_bad = (ref < 0) | ~kf_valid[jnp.maximum(ref, 0)]
    new_ref = jnp.where(best >= 0, best % K, -1).astype(ref.dtype)
    return state._replace(
        pt_ref_kf=jnp.where(ref_bad, new_ref, ref)), culled


def kf_point_stage(state: ms.MapState, cam, kf_slot: int, frame,
                   frame_id: int, th_depth_m: float, first_id: int,
                   stereo: bool, n_neighbors: int,
                   min_obs_after: int) -> ms.MapState:
    """One-dispatch keyframe point stage (see _kf_point_stage_fused)."""
    return _kf_point_stage_fused(state, cam, kf_slot, frame,
                                 jnp.int32(frame_id),
                                 jnp.float32(th_depth_m),
                                 jnp.int32(first_id), stereo, n_neighbors,
                                 min_obs_after)


@partial(jax.jit, static_argnames=("cam", "stereo", "n_neighbors",
                                   "min_obs_after"))
def _kf_point_stage_fused(state: ms.MapState, cam, kf_slot, frame,
                          frame_id, th_depth_m, first_id, stereo: bool,
                          n_neighbors: int, min_obs_after: int):
    """Insert + spawn + triangulate + fuse + cull + geometry as ONE
    program (six separate jits cost ~5 ms of per-program overhead EACH on
    a v5e — profiled; one program also widens XLA's fusion scope)."""
    state = insert_keyframe(state, frame, kf_slot, frame_id)
    if stereo:
        state = _spawn_depth_device(state, cam, kf_slot, frame, th_depth_m,
                                    first_id, 256)
    state, _ = _triangulate_device(state, cam, kf_slot, first_id, 256,
                                   n_neighbors)
    state = fuse_neighbors(state, cam, kf_slot)
    state = cull_points(state, first_id, min_obs_after=min_obs_after)
    state = update_point_geometry(state)
    return state


class LocalIndex(NamedTuple):
    """Compaction maps: local BA block index → global map slot (−1 pad).
    Compacting keeps the dense solve's (B, B) reduced system and (B, P_loc)
    coupling sized to the WINDOW, not the map capacity — the map can hold
    300k points / 2k keyframes while local BA stays a ≤64-pose problem."""
    kf_idx: np.ndarray    # (Kl,)
    pt_idx: np.ndarray    # (Pl,)
    obj_idx: np.ndarray   # (Ol,)


def _bucket(n: int, minimum: int = 16) -> int:
    """Round capacity up to a power of two (bounded jit-cache growth)."""
    b = minimum
    while b < n:
        b *= 2
    return b


def _ba_masks(state: ms.MapState, center_kf, max_kfs: int,
              global_window: bool):
    """Shared (traced) mask construction for the BA problem: window /
    frontier / selected observations / live object edges."""
    if global_window:
        in_w = state.kf_valid
        frontier = jnp.zeros_like(in_w)
        wpts = state.pt_valid
    else:
        in_w, frontier, wpts = covis.local_window(state, center_kf, max_kfs)
    # gauge anchor: if the frontier is empty (early map: the window IS the
    # whole map), fix the oldest keyframe — the reference always fixes KF 0
    # (`Optimizer.cc:492` setFixed for mnId==0)
    K = in_w.shape[0]
    no_frontier = ~jnp.any(frontier)
    oldest = jnp.argmin(jnp.where(in_w, state.kf_frame_id,
                                  jnp.iinfo(jnp.int32).max))
    anchor = jnp.zeros(K + 1, bool).at[
        jnp.where(no_frontier & jnp.any(in_w), oldest, K)].set(True)[:K]
    frontier = frontier | anchor
    involved = in_w | frontier

    kf_pt = state.kf_feat_pt
    sel = (kf_pt >= 0) & state.kf_feat_valid & involved[:, None] \
        & state.kf_valid[:, None]
    sel &= wpts[jnp.maximum(kf_pt, 0)] \
        & state.pt_valid[jnp.maximum(kf_pt, 0)]

    # object edges on involved KFs (static objects only: the reference only
    # adds static objects' relative-pose edges to the joint problem)
    oobs_live = state.oobs_valid \
        & involved[jnp.maximum(state.oobs_kf, 0)] \
        & ~state.obj_dynamic[jnp.maximum(state.oobs_obj, 0)] \
        & state.obj_valid[jnp.maximum(state.oobs_obj, 0)]
    return in_w, frontier, involved, sel, oobs_live


@partial(jax.jit, static_argnames=("max_kfs", "global_window"))
def _ba_counts_device(state: ms.MapState, center_kf, max_kfs: int,
                      global_window: bool):
    """Tiny counts vector [n_kf, n_pt, n_obs, n_obj, n_oobs] — ONE small
    fetch lets the host pick power-of-two buckets."""
    P = state.pt_pos.shape[0]
    _, _, involved, sel, oobs_live = _ba_masks(state, center_kf, max_kfs,
                                               global_window)
    tgt = jnp.where(sel, state.kf_feat_pt, P)
    pmask = jnp.zeros(P + 1, bool).at[tgt.reshape(-1)].max(
        sel.reshape(-1))[:P]
    O = state.obj_valid.shape[0]
    otgt = jnp.where(oobs_live, state.oobs_obj, O)
    omask = jnp.zeros(O + 1, bool).at[otgt].max(oobs_live)[:O]
    return jnp.stack([
        jnp.sum(involved), jnp.sum(pmask), jnp.sum(sel),
        jnp.sum(omask), jnp.sum(oobs_live),
    ]).astype(jnp.int32)


@partial(jax.jit, static_argnames=("max_kfs", "global_window", "Kl", "Pl",
                                   "Ol", "N", "M"))
def _ba_assemble_device(state: ms.MapState, center_kf, max_kfs: int,
                        global_window: bool, Kl: int, Pl: int, Ol: int,
                        N: int, M: int):
    """Device-side compaction + gather of the BA problem.

    The previous host assembly fetched the full (K, F) observation tables
    (tens of MB per keyframe at KITTI capacity) over the TPU tunnel; here
    only the 5-int counts vector crosses to the host.  Compaction index
    order comes from argsort over boolean masks (selected-first) — order
    differs from np.nonzero but BA is order-invariant."""
    K = state.kf_valid.shape[0]
    P = state.pt_pos.shape[0]
    F = state.kf_feat_pt.shape[1]
    in_w, frontier, involved, sel, oobs_live = _ba_masks(
        state, center_kf, max_kfs, global_window)

    # --- observation compaction: selected-first order over (K·F) ---
    flat = sel.reshape(-1)
    obs_order = jnp.argsort(~flat)[:N]
    obs_ok = flat[obs_order]
    okf = (obs_order // F).astype(jnp.int32)
    ofeat = (obs_order % F).astype(jnp.int32)
    obs_pt_g = jnp.where(obs_ok, state.kf_feat_pt[okf, ofeat], 0) \
        .astype(jnp.int32)
    uv = state.kf_xy[okf, ofeat]
    ur = state.kf_ur[okf, ofeat]
    obs_uv = jnp.where(obs_ok[:, None],
                       jnp.concatenate([uv, ur[:, None]], -1), 0.0)
    obs_info = jnp.where(
        obs_ok,
        1.0 / (1.2 ** (2.0 * state.kf_level[okf, ofeat].astype(jnp.float32))),
        0.0)

    # observability guard: a point may only be optimized if its in-problem
    # edges determine it — ≥2 observations, or ≥1 stereo (3-row) edge
    # (single mono edges leave the depth direction free and explode)
    ptgt = jnp.where(obs_ok, obs_pt_g, P)
    n_obs_pt = jnp.zeros(P + 1, jnp.int32).at[ptgt].add(1)[:P]
    has_stereo = jnp.zeros(P + 1, bool).at[
        jnp.where(obs_ok & (obs_uv[:, 2] >= 0), obs_pt_g, P)].set(True)[:P]
    determined = (n_obs_pt >= 2) | has_stereo

    # --- keyframe / point / object compaction maps ---
    kf_order = jnp.argsort(~involved)[:Kl]
    kf_ok = involved[kf_order]
    kf_idx = jnp.where(kf_ok, kf_order, -1).astype(jnp.int32)
    kf_map = jnp.zeros(K, jnp.int32).at[
        jnp.where(kf_ok, kf_order, K)].set(jnp.arange(Kl, dtype=jnp.int32),
                                           mode="drop")

    pmask = jnp.zeros(P + 1, bool).at[ptgt].max(obs_ok)[:P]
    pt_order = jnp.argsort(~pmask)[:Pl]
    pt_ok = pmask[pt_order]
    pt_idx = jnp.where(pt_ok, pt_order, -1).astype(jnp.int32)
    pt_map = jnp.zeros(P, jnp.int32).at[
        jnp.where(pt_ok, pt_order, P)].set(jnp.arange(Pl, dtype=jnp.int32),
                                           mode="drop")

    O = state.obj_valid.shape[0]
    otgt = jnp.where(oobs_live, state.oobs_obj, O)
    omask = jnp.zeros(O + 1, bool).at[otgt].max(oobs_live)[:O]
    obj_order = jnp.argsort(~omask)[:Ol]
    obj_ok = omask[obj_order]
    obj_idx = jnp.where(obj_ok, obj_order, -1).astype(jnp.int32)
    obj_map = jnp.zeros(O, jnp.int32).at[
        jnp.where(obj_ok, obj_order, O)].set(jnp.arange(Ol, dtype=jnp.int32),
                                             mode="drop")

    # --- object edge compaction ---
    oo_order = jnp.argsort(~oobs_live)[:M]
    oo_ok = oobs_live[oo_order]
    oobs_kf_g = jnp.where(oo_ok, state.oobs_kf[oo_order], 0)
    oobs_obj_g = jnp.where(oo_ok, state.oobs_obj[oo_order], 0)
    eye = jnp.broadcast_to(jnp.eye(4), (M, 4, 4))
    oobs_t = jnp.where(oo_ok[:, None, None],
                       state.oobs_t_co[oo_order], eye)

    kf_sel = jnp.maximum(kf_idx, 0)
    pt_sel = jnp.maximum(pt_idx, 0)
    obj_sel = jnp.maximum(obj_idx, 0)

    # actual counts from the FULL (untruncated) masks: callers that
    # assembled with CACHED buckets verify post-hoc that nothing was
    # truncated (the optimistic-bucket path overlaps this fetch with the
    # solve dispatch).  pmask above is derived from the compacted [:N]
    # observation view and would undercount on overflow — recount it.
    tgt_full = jnp.where(sel, state.kf_feat_pt, P)
    pmask_full = jnp.zeros(P + 1, bool).at[tgt_full.reshape(-1)].max(
        sel.reshape(-1))[:P]
    counts = jnp.stack([
        jnp.sum(involved), jnp.sum(pmask_full), jnp.sum(sel),
        jnp.sum(omask), jnp.sum(oobs_live),
    ]).astype(jnp.int32)

    prob = ba.BAProblem(
        kf_pose=state.kf_pose[kf_sel],
        kf_fixed=frontier[kf_sel] | ~in_w[kf_sel] | (kf_idx < 0),
        kf_valid=state.kf_valid[kf_sel] & (kf_idx >= 0),
        pts=state.pt_pos[pt_sel],
        pt_valid=(pt_idx >= 0) & determined[pt_sel]
        & state.pt_valid[pt_sel],
        obs_kf=jnp.where(obs_ok, kf_map[okf], 0),
        obs_pt=jnp.where(obs_ok, pt_map[obs_pt_g], 0),
        obs_uv=obs_uv,
        obs_info=obs_info,
        obs_mask=obs_ok,
        obj_pose=state.obj_pose[obj_sel],
        obj_valid=state.obj_valid[obj_sel] & (obj_idx >= 0),
        oobs_kf=kf_map[jnp.maximum(oobs_kf_g, 0)] * oo_ok,
        oobs_obj=obj_map[jnp.maximum(oobs_obj_g, 0)] * oo_ok,
        oobs_t_co=oobs_t,
        oobs_mask=oo_ok,
    )
    return prob, LocalIndex(kf_idx, pt_idx, obj_idx), counts


# optimistic-bucket memo: (map shapes, window, global) → last bucket tuple.
# Buckets grow monotonically (bounded by map capacities), so after warmup
# the blocking counts fetch disappears from the keyframe stage — the
# assembly's own counts output verifies the guess while the solve runs.
_bucket_memo: dict = {}


def _buckets_for(counts, K, P, F, O, Q):
    n_kf, n_pt, n_obs, n_obj, n_oobs = (int(c) for c in counts)
    Kl = min(_bucket(max(n_kf, 1)), K)
    Pl = min(_bucket(max(n_pt, 1), minimum=64), P)
    Ol = min(_bucket(max(n_obj, 1), minimum=4), O)
    N = min(_bucket(max(n_obs, 1), minimum=256), K * F)
    M = min(_bucket(max(n_oobs, 1), minimum=16), Q)
    return Kl, Pl, Ol, N, M


def _counts_fit(counts, buckets) -> bool:
    n_kf, n_pt, n_obs, n_obj, n_oobs = (int(c) for c in counts)
    Kl, Pl, Ol, N, M = buckets
    return (n_kf <= Kl and n_pt <= Pl and n_obs <= N and n_obj <= Ol
            and n_oobs <= M)


def build_local_ba_problem(state: ms.MapState, center_kf: int,
                           max_kfs: int, global_window: bool = False):
    """Assemble a COMPACT fixed-capacity BA problem for the covisible window
    (the solve is `ba.local_ba` / `ba.global_ba_pcg`).  With
    `global_window=True` every valid keyframe and point enters (the
    GlobalJointBundleAdjustemnt problem).

    Capacities are bucketed powers of two derived from the ACTUAL window
    contents — nothing is silently truncated: the exact counts are fetched
    up front.  (The keyframe-stage hot path uses `_solve_ba_optimistic`
    instead, which reuses memoized buckets and only re-assembles on a
    verified overflow.)  Returns (prob, idx)."""
    K = state.kf_valid.shape[0]
    P = state.pt_pos.shape[0]
    F = state.kf_feat_pt.shape[1]
    O = state.obj_valid.shape[0]
    Q = state.oobs_valid.shape[0]
    counts = np.asarray(_ba_counts_device(state, center_kf, max_kfs,
                                          global_window))
    buckets = _buckets_for(counts, K, P, F, O, Q)
    _bucket_memo[(K, P, F, O, Q, max_kfs, global_window)] = buckets
    prob, idx, _ = _ba_assemble_device(state, center_kf, max_kfs,
                                       global_window, *buckets)
    return prob, idx


def _solve_ba_optimistic(state: ms.MapState, cam, center_kf: int,
                         max_kfs: int, global_window: bool,
                         solve_fn) -> ms.MapState:
    """Assemble + solve with MEMOIZED capacity buckets: the counts check
    rides the same device program and its fetch overlaps the (already
    dispatched) solve — the per-keyframe blocking counts round trip of the
    previous design disappears.  On a verified overflow (counts exceed the
    guess) the problem re-assembles with grown buckets and re-solves from
    the pre-BA state; buckets grow monotonically so this is rare."""
    K = state.kf_valid.shape[0]
    P = state.pt_pos.shape[0]
    F = state.kf_feat_pt.shape[1]
    O = state.obj_valid.shape[0]
    Q = state.oobs_valid.shape[0]
    key = (K, P, F, O, Q, max_kfs, global_window)
    buckets = _bucket_memo.get(key)
    if buckets is None:
        counts = np.asarray(_ba_counts_device(state, center_kf, max_kfs,
                                              global_window))
        buckets = _buckets_for(counts, K, P, F, O, Q)
        _bucket_memo[key] = buckets

    prob, idx, counts_dev = _ba_assemble_device(
        state, center_kf, max_kfs, global_window, *buckets)
    res = solve_fn(prob)                      # dispatched before the fetch
    new_state = apply_ba_result(state, idx, res)
    counts = np.asarray(counts_dev)           # overlaps the solve compute
    if _counts_fit(counts, buckets):
        return new_state
    # overflow: grow buckets (grow-only keeps the jit cache bounded) and
    # redo from the PRE-BA state — the truncated result is discarded
    grown = tuple(max(a, b) for a, b in
                  zip(buckets, _buckets_for(counts, K, P, F, O, Q)))
    _bucket_memo[key] = grown
    prob, idx, _ = _ba_assemble_device(state, center_kf, max_kfs,
                                       global_window, *grown)
    res = solve_fn(prob)
    return apply_ba_result(state, idx, res)


@jax.jit
def apply_ba_result(state: ms.MapState, idx: LocalIndex,
                    res: ba.BAResult) -> ms.MapState:
    """Scatter compact BA results back into the map (recover step) —
    device-resident, one dispatch."""
    K = state.kf_pose.shape[0]
    P = state.pt_pos.shape[0]
    O = state.obj_pose.shape[0]
    kf_tgt = jnp.where(idx.kf_idx >= 0, idx.kf_idx, K)
    pt_tgt = jnp.where(idx.pt_idx >= 0, idx.pt_idx, P)
    obj_tgt = jnp.where(idx.obj_idx >= 0, idx.obj_idx, O)
    # SO(3) re-projection on the way back into the map: BA's f32 exp
    # compositions seed ~1e-3 orthonormality defects that the tracker's
    # velocity chain amplifies exponentially (lie.orthonormalize_so3)
    return state._replace(
        kf_pose=state.kf_pose.at[kf_tgt].set(
            lie.orthonormalize_se3(res.kf_pose), mode="drop"),
        pt_pos=state.pt_pos.at[pt_tgt].set(res.pts, mode="drop"),
        obj_pose=state.obj_pose.at[obj_tgt].set(
            lie.orthonormalize_se3(res.obj_pose), mode="drop"),
    )


def local_ba_step(state: ms.MapState, cam, center_kf: int,
                  max_kfs: int = 10) -> ms.MapState:
    return _solve_ba_optimistic(state, cam, center_kf, max_kfs, False,
                                lambda prob: ba.local_ba(cam, prob))


@partial(jax.jit, static_argnames=("cam", "max_kfs", "Kl", "Pl", "Ol", "N",
                                   "M", "max_cull"))
def _ba_cull_device(state: ms.MapState, cam, center_kf, max_kfs: int,
                    Kl: int, Pl: int, Ol: int, N: int, M: int,
                    max_cull: int):
    """Local BA (assemble + solve + apply) AND keyframe culling as ONE
    program with ONE combined fetch vector [counts(5) | culled(max_cull)].

    The split version paid ~5 ms of program overhead x3 (assemble/solve/
    apply were one chain but cull was separate) plus TWO result fetches
    (counts, culled) per keyframe over the tunnel."""
    prob, idx, counts = _ba_assemble_device(state, center_kf, max_kfs,
                                            False, Kl, Pl, Ol, N, M)
    res = ba.local_ba(cam, prob)
    state = apply_ba_result(state, idx, res)
    state, culled = _cull_keyframes_device(state, center_kf, 0.9, max_cull)
    return state, jnp.concatenate([counts, culled.astype(jnp.int32)])


def ba_cull_dispatch(state: ms.MapState, cam, center_kf: int,
                     max_kfs: int = 10, max_cull: int = 2):
    """Dispatch the combined BA+cull program with memoized optimistic
    buckets.  Returns a pending handle; the caller may dispatch further
    device work on the optimistic `pending["state"]` before calling
    `ba_cull_read` — the counts/culled fetch then overlaps it."""
    K = state.kf_valid.shape[0]
    P = state.pt_pos.shape[0]
    F = state.kf_feat_pt.shape[1]
    O = state.obj_valid.shape[0]
    Q = state.oobs_valid.shape[0]
    key = (K, P, F, O, Q, max_kfs, False)
    buckets = _bucket_memo.get(key)
    if buckets is None:
        counts = np.asarray(_ba_counts_device(state, center_kf, max_kfs,
                                              False))
        buckets = _buckets_for(counts, K, P, F, O, Q)
        _bucket_memo[key] = buckets
    new_state, vec = _ba_cull_device(state, cam, center_kf, max_kfs,
                                     *buckets, max_cull)
    return {"state": new_state, "vec": vec, "buckets": buckets, "key": key,
            "pre_state": state, "cam": cam, "center": center_kf,
            "max_kfs": max_kfs, "max_cull": max_cull,
            "shapes": (K, P, F, O, Q)}


def ba_cull_read(pending, vec=None):
    """Fetch + verify a `ba_cull_dispatch` result.

    `vec`: optionally the ALREADY-FETCHED result vector (callers that
    bundle several tail fetches into one round trip pass it; see
    `MappingStage.process`).

    Returns (fit, culled_slots, redo_state): fit=True → the optimistic
    state was correct; fit=False → the caller must replace its state with
    `redo_state` (re-solved from the pre-BA state with grown buckets) and
    re-apply anything it stacked on the optimistic state."""
    if vec is None:
        vec = np.asarray(pending["vec"])  # THE keyframe-stage tail fetch
    counts, culled_v = vec[:5], vec[5:]
    buckets = pending["buckets"]
    K, P, F, O, Q = pending["shapes"]
    if _counts_fit(counts, buckets):
        return True, [int(k) for k in culled_v if k >= 0], None
    grown = tuple(max(a, b) for a, b in
                  zip(buckets, _buckets_for(counts, K, P, F, O, Q)))
    _bucket_memo[pending["key"]] = grown
    redo_state, vec = _ba_cull_device(
        pending["pre_state"], pending["cam"], pending["center"],
        pending["max_kfs"], *grown, pending["max_cull"])
    vec = np.asarray(vec)
    return False, [int(k) for k in vec[5:] if k >= 0], redo_state


def local_ba_and_cull_step(state: ms.MapState, cam, center_kf: int,
                           max_kfs: int = 10, max_cull: int = 2):
    """Combined BA+cull (dispatch + immediate read).  Returns
    (state, culled_slots list)."""
    pend = ba_cull_dispatch(state, cam, center_kf, max_kfs, max_cull)
    fit, culled, redo = ba_cull_read(pend)
    return (pend["state"] if fit else redo), culled


def global_ba_step(state: ms.MapState, cam, n_iters: int = 10,
                   dense_limit: int = 96) -> ms.MapState:
    """Global joint BA over the whole map.  Small maps take the dense Schur
    path; past `dense_limit` pose blocks the matrix-free PCG path runs (the
    (B·6)² reduced system is never materialized — KITTI-00 scale)."""
    def solve(prob):
        B = prob.kf_pose.shape[0] + prob.obj_pose.shape[0]
        if B <= dense_limit:
            return ba.global_ba(cam, prob, n_iters=n_iters)
        return ba.global_ba_pcg(cam, prob, n_iters=n_iters)

    return _solve_ba_optimistic(state, cam, 0, 0, True, solve)
