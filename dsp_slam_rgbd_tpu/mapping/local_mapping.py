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


def insert_keyframe(state: ms.MapState, frame, kf_slot: int,
                    frame_id: int) -> ms.MapState:
    """Write a tracked frame into a KF slot (ProcessNewKeyFrame role)."""
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


def spawn_depth_points(state: ms.MapState, cam, kf_slot: int, frame,
                       th_depth: float, max_new: int = 256) -> ms.MapState:
    """Create map points from close stereo/RGB-D depth for features without
    an associated point (reference `CreateNewKeyFrame` close-point spawning,
    `Tracking.cc:1185-1237`)."""
    depth = np.asarray(frame.depth)
    has = (depth > 0) & (depth < th_depth) & np.asarray(frame.feats.valid) \
        & (np.asarray(frame.pt_idx) < 0)
    order = np.argsort(np.where(has, depth, np.inf))
    chosen = order[: min(int(has.sum()), max_new)]
    if len(chosen) == 0:
        return state
    slots = ms.alloc_slots(state.pt_valid, len(chosen))
    ok = slots >= 0
    chosen, slots = chosen[ok], slots[ok]
    if len(chosen) == 0:
        return state

    P = state.pt_pos.shape[0]
    F = state.kf_feat_pt.shape[1]
    ch = _pad_idx(chosen, max_new, 0)        # gather (pad rows dropped below)
    sl = _pad_idx(slots, max_new, P)         # scatter target, P = dropped
    feat_tgt = _pad_idx(chosen, max_new, F)  # feature-column target

    uv = frame.feats.xy[ch]
    z = frame.depth[ch]
    p_cam = cam_ops.backproject(cam, uv, z)
    t_wc = lie.inv_se3(frame.t_cw)
    p_w = lie.transform_points(t_wc, p_cam)

    sl_val = jnp.where(sl < P, sl, -1).astype(jnp.int32)
    state = state._replace(
        pt_pos=state.pt_pos.at[sl].set(p_w, mode="drop"),
        pt_valid=state.pt_valid.at[sl].set(True, mode="drop"),
        pt_desc=state.pt_desc.at[sl].set(frame.feats.desc[ch], mode="drop"),
        pt_ref_kf=state.pt_ref_kf.at[sl].set(kf_slot, mode="drop"),
        pt_first_kf=state.pt_first_kf.at[sl].set(kf_slot, mode="drop"),
        kf_feat_pt=state.kf_feat_pt.at[kf_slot, feat_tgt].set(
            sl_val, mode="drop"
        ),
    )
    return state


def triangulate_new_points(state: ms.MapState, cam, kf_slot: int,
                           max_new: int = 256, n_neighbors: int = 10
                           ) -> ms.MapState:
    """Two-view triangulation against the best covisible neighbors
    (CreateNewMapPoints :259: nn = 10 stereo / 20 mono neighbors, baseline
    gate, epipolar-constrained match).  Features claimed against one
    neighbor leave the free pool before the next, like the reference's
    sequential per-neighbor loop."""
    order, weights = covis.best_covisible(state, kf_slot, n_neighbors)
    order, weights = np.asarray(order), np.asarray(weights)
    t1 = state.kf_pose[kf_slot]
    c1 = lie.inv_se3(t1)[:3, 3]
    is_stereo = cam.bf > 0.0
    free_a = state.kf_feat_valid[kf_slot] & (state.kf_feat_pt[kf_slot] < 0)
    budget = max_new
    for nb, w in zip(order, weights):
        nb = int(nb)
        if nb == kf_slot or int(w) < covis.MIN_WEIGHT or budget <= 0:
            continue
        # baseline gate (reference :289-306): stereo skips neighbors closer
        # than the stereo baseline; mono requires baseline/median-depth>0.01
        c2 = lie.inv_se3(state.kf_pose[nb])[:3, 3]
        baseline = float(jnp.linalg.norm(c2 - c1))
        if is_stereo:
            if baseline < cam.bf / cam.fx:
                continue
        else:
            obs_pt = state.kf_feat_pt[nb]
            seen = (obs_pt >= 0) & state.kf_feat_valid[nb]
            if bool(jnp.any(seen)):
                pc = lie.transform_points(
                    state.kf_pose[nb],
                    state.pt_pos[jnp.maximum(obs_pt, 0)])
                z = np.asarray(jnp.where(seen, pc[:, 2], jnp.nan))
                med = float(np.nanmedian(z))
                if med > 0 and baseline / med < 0.01:
                    continue

        free_b = state.kf_feat_valid[nb] & (state.kf_feat_pt[nb] < 0)
        m = matcher.match(state.kf_desc[kf_slot], free_a, state.kf_desc[nb],
                          free_b, max_dist=matcher.TH_LOW, ratio=0.8,
                          mutual=True)
        uv1 = state.kf_xy[kf_slot]
        uv2 = state.kf_xy[nb][jnp.maximum(m.idx, 0)]
        pts = tri.triangulate_two_views(cam, cam, t1, state.kf_pose[nb],
                                        uv1, uv2)
        masks = tri.acceptance_masks(cam, cam, t1, state.kf_pose[nb],
                                     pts, uv1, uv2)
        good = np.asarray(
            m.valid & masks["parallax"] & masks["depth"] & masks["reproj"]
            & jnp.all(jnp.isfinite(pts), axis=-1)
        )
        chosen = np.nonzero(good)[0][:budget]
        if len(chosen) == 0:
            continue
        slots = ms.alloc_slots(state.pt_valid, len(chosen))
        ok = slots >= 0
        chosen, slots = chosen[ok], slots[ok]
        if len(chosen) == 0:
            return state  # point capacity exhausted
        budget -= len(chosen)
        n_new = len(chosen)
        P = state.pt_pos.shape[0]
        F = state.kf_feat_pt.shape[1]
        # fixed-capacity padded scatters: one compiled kernel per max_new,
        # not one per distinct accepted-point count (see _pad_idx)
        ch = _pad_idx(chosen, max_new, 0)
        sl = _pad_idx(slots, max_new, P)
        feat_tgt = _pad_idx(chosen, max_new, F)
        live = jnp.arange(max_new) < n_new
        nb_tgt = jnp.where(live, jnp.maximum(m.idx[ch], 0), F)
        sl_val = jnp.where(sl < P, sl, -1).astype(jnp.int32)
        state = state._replace(
            pt_pos=state.pt_pos.at[sl].set(pts[ch], mode="drop"),
            pt_valid=state.pt_valid.at[sl].set(True, mode="drop"),
            pt_desc=state.pt_desc.at[sl].set(state.kf_desc[kf_slot][ch],
                                             mode="drop"),
            pt_ref_kf=state.pt_ref_kf.at[sl].set(kf_slot, mode="drop"),
            pt_first_kf=state.pt_first_kf.at[sl].set(kf_slot, mode="drop"),
            kf_feat_pt=state.kf_feat_pt
            .at[kf_slot, feat_tgt].set(sl_val, mode="drop")
            .at[nb, nb_tgt].set(sl_val, mode="drop"),
        )
        free_a = free_a.at[feat_tgt].set(False, mode="drop")
    return state


def fuse_neighbors(state: ms.MapState, cam, kf_slot: int,
                   radius: float = 3.0) -> ms.MapState:
    """SearchInNeighbors role (:506): project neighbor KFs' points into this
    KF; unassociated features matching a projected point adopt it."""
    order, weights = covis.best_covisible(state, kf_slot, 3)
    nb_mask = jnp.zeros(state.kf_valid.shape[0], bool)
    for i in range(3):
        if int(weights[i]) >= covis.MIN_WEIGHT:
            nb_mask = nb_mask.at[int(order[i])].set(True)
    nb_pts = ms.point_mask_of(state, nb_mask)

    from dsp_slam_rgbd_tpu.tracking.tracker import match_local_points

    free = state.kf_feat_valid[kf_slot] & (state.kf_feat_pt[kf_slot] < 0)
    pt_idx, matched = match_local_points(
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


def cull_points(state: ms.MapState, current_kf: int,
                min_found_ratio: float = 0.25,
                min_obs_after: int = 2) -> ms.MapState:
    """MapPointCulling (:222): drop points with poor found/visible ratio or
    too few observations a few KFs after creation."""
    n_obs = ms.point_obs_counts(state)
    ratio = state.pt_found.astype(jnp.float32) / jnp.maximum(
        state.pt_visible.astype(jnp.float32), 1.0
    )
    age = current_kf - state.pt_first_kf
    bad = (ratio < min_found_ratio) | ((age >= 2) & (n_obs < min_obs_after))
    keep = state.pt_valid & ~(bad & (state.pt_first_kf >= 0))
    # detach dead points from KF feature tables
    dead = state.pt_valid & ~keep
    assoc = state.kf_feat_pt
    assoc = jnp.where(dead[jnp.maximum(assoc, 0)] & (assoc >= 0), -1, assoc)
    return state._replace(pt_valid=keep, kf_feat_pt=assoc)


def cull_keyframes(state: ms.MapState, kf_slot: int,
                   redundancy: float = 0.9, max_cull: int = 4):
    """KeyFrameCulling (:684): local KFs whose points are ≥90% seen by ≥3
    other KFs are removed.  Returns (state, [culled_slots]) — the caller
    must purge each slot from the BoW database and re-anchor any frame
    trajectory entries referencing it (the reference re-parents frames to
    the spanning tree on culling).  Culled slots' pose array entries are
    left intact so re-anchoring can read them.

    Like the reference's sequential per-KF loop, removal is iterative — a
    cull changes the observation counts the next candidate is judged by —
    but each round's redundancy fractions come from one vectorized masked
    reduction over the (K, F) observation table (no O(K²) host loop).
    `max_cull` bounds the rounds (the reference visits each local KF once;
    in practice few pass the 90% gate)."""
    culled = []
    for _ in range(max_cull):
        n_obs = ms.point_obs_counts(state)                  # (P,)
        local = (covis.covisibility_row(state, kf_slot) >= covis.MIN_WEIGHT) \
            & state.kf_valid
        local = local.at[kf_slot].set(False)  # never cull the fresh KF
        ok = ms._obs_ok(state)                              # (K, F)
        pt = jnp.maximum(state.kf_feat_pt, 0)
        redundant = ok & (n_obs[pt] >= 4)                   # seen by ≥3 others
        mine = jnp.sum(ok, axis=1).astype(jnp.float32)      # (K,)
        red = jnp.sum(redundant, axis=1).astype(jnp.float32)
        cand = local & (mine > 0) & (red >= redundancy * mine)
        frac = jnp.where(cand, red / jnp.maximum(mine, 1.0), -1.0)
        k = int(jnp.argmax(frac))
        if not bool(cand[k]):
            break
        state = state._replace(
            kf_valid=state.kf_valid.at[k].set(False),
            kf_feat_pt=state.kf_feat_pt.at[k].set(-1),
        )
        culled.append(k)
    return state, culled


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


def build_local_ba_problem(state: ms.MapState, center_kf: int,
                           max_kfs: int, global_window: bool = False
                           ) -> tuple[ba.BAProblem, LocalIndex]:
    """Assemble a COMPACT fixed-capacity BA problem for the covisible window
    (host control plane; the solve is `ba.local_ba` / `ba.global_ba_pcg`).
    With `global_window=True` every valid keyframe and point enters (the
    GlobalJointBundleAdjustemnt problem).

    Capacities are bucketed powers of two derived from the ACTUAL window
    contents — nothing is silently truncated (the r1 MAX_LOCAL_OBS cap and
    its silent observation drops are gone)."""
    if global_window:
        in_w_np = np.asarray(state.kf_valid)
        frontier_np = np.zeros_like(in_w_np)
        wpts_np = np.asarray(state.pt_valid)
    else:
        in_w, frontier, wpts = covis.local_window(state, center_kf, max_kfs)
        in_w_np = np.asarray(in_w)
        frontier_np = np.asarray(frontier)
        wpts_np = np.asarray(wpts)
    involved = in_w_np | frontier_np
    # gauge anchor: if the frontier is empty (early map: the window IS the
    # whole map), fix the oldest keyframe — the reference always fixes KF 0
    # (`Optimizer.cc:492` setFixed for mnId==0)
    if not frontier_np.any():
        first = np.nonzero(in_w_np)[0]
        if len(first):
            oldest = first[np.argmin(np.asarray(state.kf_frame_id)[first])]
            frontier_np = frontier_np.copy()
            frontier_np[oldest] = True

    # --- observations, fully vectorized over the (K, F) table ---
    kf_pt = np.asarray(state.kf_feat_pt)
    sel = (kf_pt >= 0) & np.asarray(state.kf_feat_valid) \
        & involved[:, None] & np.asarray(state.kf_valid)[:, None]
    sel &= wpts_np[np.maximum(kf_pt, 0)] \
        & np.asarray(state.pt_valid)[np.maximum(kf_pt, 0)]
    okf, ofeat = np.nonzero(sel)
    obs_kf_g = okf.astype(np.int32)
    obs_pt_g = kf_pt[okf, ofeat].astype(np.int32)
    obs_uv = np.concatenate(
        [np.asarray(state.kf_xy)[okf, ofeat],
         np.asarray(state.kf_ur)[okf, ofeat][:, None]], axis=-1
    ).astype(np.float32)
    obs_info = (
        1.0 / (1.2 ** (2.0 * np.asarray(state.kf_level)[okf, ofeat]))
    ).astype(np.float32)
    n = len(obs_kf_g)

    # observability guard: a point may only be optimized if its in-problem
    # edges determine it — ≥2 observations, or ≥1 stereo (3-row) observation
    # (single mono edges leave the depth direction free and explode)
    P = state.pt_pos.shape[0]
    n_obs_pt = np.zeros(P, np.int32)
    np.add.at(n_obs_pt, obs_pt_g, 1)
    has_stereo = np.zeros(P, bool)
    has_stereo[obs_pt_g[obs_uv[:, 2] >= 0]] = True
    determined = (n_obs_pt >= 2) | has_stereo

    # --- object edges on involved KFs (static objects only: the reference
    # only adds static objects' relative-pose edges to the joint problem) ---
    oobs_valid = np.asarray(state.oobs_valid) & involved[
        np.maximum(np.asarray(state.oobs_kf), 0)
    ] & ~np.asarray(state.obj_dynamic)[
        np.maximum(np.asarray(state.oobs_obj), 0)
    ] & np.asarray(state.obj_valid)[
        np.maximum(np.asarray(state.oobs_obj), 0)
    ]
    osel = np.nonzero(oobs_valid)[0]
    oobs_kf_g = np.asarray(state.oobs_kf)[osel].astype(np.int32)
    oobs_obj_g = np.asarray(state.oobs_obj)[osel].astype(np.int32)

    # --- compaction: global slots → dense local indices ---
    kf_ids = np.nonzero(involved)[0]
    pt_ids = np.unique(obs_pt_g) if n else np.zeros(0, np.int64)
    obj_ids = np.unique(oobs_obj_g) if len(osel) else np.zeros(0, np.int64)
    Kl = _bucket(max(len(kf_ids), 1))
    Pl = _bucket(max(len(pt_ids), 1), minimum=64)
    Ol = _bucket(max(len(obj_ids), 1), minimum=4)
    N = _bucket(max(n, 1), minimum=256)
    M = _bucket(max(len(osel), 1), minimum=16)

    kf_map = np.full(state.kf_valid.shape[0], 0, np.int32)
    kf_map[kf_ids] = np.arange(len(kf_ids))
    pt_map = np.full(P, 0, np.int32)
    pt_map[pt_ids] = np.arange(len(pt_ids))
    obj_map = np.full(state.obj_valid.shape[0], 0, np.int32)
    obj_map[obj_ids] = np.arange(len(obj_ids))

    def padded(a, cap, fill):
        return np.concatenate(
            [a, np.full((cap - len(a),) + a.shape[1:], fill, a.dtype)]
        )

    idx = LocalIndex(
        kf_idx=padded(kf_ids.astype(np.int32), Kl, -1),
        pt_idx=padded(pt_ids.astype(np.int32), Pl, -1),
        obj_idx=padded(obj_ids.astype(np.int32), Ol, -1),
    )
    kf_sel = np.maximum(idx.kf_idx, 0)
    pt_sel = np.maximum(idx.pt_idx, 0)
    obj_sel = np.maximum(idx.obj_idx, 0)

    prob = ba.BAProblem(
        kf_pose=state.kf_pose[jnp.asarray(kf_sel)],
        kf_fixed=jnp.asarray(
            frontier_np[kf_sel] | ~in_w_np[kf_sel] | (idx.kf_idx < 0)
        ),
        kf_valid=jnp.asarray(
            np.asarray(state.kf_valid)[kf_sel] & (idx.kf_idx >= 0)
        ),
        pts=state.pt_pos[jnp.asarray(pt_sel)],
        pt_valid=jnp.asarray(
            (idx.pt_idx >= 0) & determined[pt_sel]
            & np.asarray(state.pt_valid)[pt_sel]
        ),
        obs_kf=jnp.asarray(padded(kf_map[obs_kf_g], N, 0)),
        obs_pt=jnp.asarray(padded(pt_map[obs_pt_g], N, 0)),
        obs_uv=jnp.asarray(padded(obs_uv, N, 0.0)),
        obs_info=jnp.asarray(padded(obs_info, N, 0.0)),
        obs_mask=jnp.asarray(padded(np.ones(n, bool), N, False)),
        obj_pose=state.obj_pose[jnp.asarray(obj_sel)],
        obj_valid=jnp.asarray(
            np.asarray(state.obj_valid)[obj_sel] & (idx.obj_idx >= 0)
        ),
        oobs_kf=jnp.asarray(padded(kf_map[oobs_kf_g], M, 0)),
        oobs_obj=jnp.asarray(padded(obj_map[oobs_obj_g], M, 0)),
        oobs_t_co=jnp.asarray(padded(
            np.asarray(state.oobs_t_co)[osel],
            M, 0.0,
        )) + jnp.eye(4) * (jnp.arange(M) >= len(osel))[:, None, None],
        oobs_mask=jnp.asarray(padded(np.ones(len(osel), bool), M, False)),
    )
    return prob, idx


def apply_ba_result(state: ms.MapState, idx: LocalIndex,
                    res: ba.BAResult) -> ms.MapState:
    """Scatter compact BA results back into the map (recover step)."""
    kf_ok = idx.kf_idx >= 0
    pt_ok = idx.pt_idx >= 0
    obj_ok = idx.obj_idx >= 0
    K = state.kf_pose.shape[0]
    P = state.pt_pos.shape[0]
    O = state.obj_pose.shape[0]
    kf_tgt = jnp.asarray(np.where(kf_ok, idx.kf_idx, K))
    pt_tgt = jnp.asarray(np.where(pt_ok, idx.pt_idx, P))
    obj_tgt = jnp.asarray(np.where(obj_ok, idx.obj_idx, O))
    return state._replace(
        kf_pose=state.kf_pose.at[kf_tgt].set(res.kf_pose, mode="drop"),
        pt_pos=state.pt_pos.at[pt_tgt].set(res.pts, mode="drop"),
        obj_pose=state.obj_pose.at[obj_tgt].set(res.obj_pose, mode="drop"),
    )


def local_ba_step(state: ms.MapState, cam, center_kf: int,
                  max_kfs: int = 10) -> ms.MapState:
    prob, idx = build_local_ba_problem(state, center_kf, max_kfs)
    res = ba.local_ba(cam, prob)
    return apply_ba_result(state, idx, res)


def global_ba_step(state: ms.MapState, cam, n_iters: int = 10,
                   dense_limit: int = 96) -> ms.MapState:
    """Global joint BA over the whole map.  Small maps take the dense Schur
    path; past `dense_limit` pose blocks the matrix-free PCG path runs (the
    (B·6)² reduced system is never materialized — KITTI-00 scale)."""
    prob, idx = build_local_ba_problem(state, 0, 0, global_window=True)
    B = prob.kf_pose.shape[0] + prob.obj_pose.shape[0]
    if B <= dense_limit:
        res = ba.global_ba(cam, prob, n_iters=n_iters)
    else:
        res = ba.global_ba_pcg(cam, prob, n_iters=n_iters)
    return apply_ba_result(state, idx, res)
