"""Local mapping: keyframe insertion, point management, local (joint) BA.

Covers the `LocalMapping` thread pipeline (`src/LocalMapping.cc:55-164`):
ProcessNewKeyFrame (:180), MapPointCulling (:222), CreateNewMapPoints
(:259 — here stereo-depth spawning + two-view triangulation with the best
covisible neighbor), SearchInNeighbors fusion (:506 — duplicate merge by
projective match), the object stage (association, pose-only/joint GN,
observation insertion — `LocalMapping_util.cc`), and
LocalJointBundleAdjustment (`Optimizer_util.cc:309`).

Host code assembles fixed-capacity problems (control plane, numpy); all
solves are the jitted kernels in ba.py / recon/optimizer.py.
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

MAX_LOCAL_OBS = 16384


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

    uv = frame.feats.xy[jnp.asarray(chosen)]
    z = frame.depth[jnp.asarray(chosen)]
    p_cam = cam_ops.backproject(cam, uv, z)
    t_wc = lie.inv_se3(frame.t_cw)
    p_w = lie.transform_points(t_wc, p_cam)

    sl = jnp.asarray(slots)
    state = state._replace(
        pt_pos=state.pt_pos.at[sl].set(p_w),
        pt_valid=state.pt_valid.at[sl].set(True),
        pt_desc=state.pt_desc.at[sl].set(frame.feats.desc[jnp.asarray(chosen)]),
        pt_ref_kf=state.pt_ref_kf.at[sl].set(kf_slot),
        pt_first_kf=state.pt_first_kf.at[sl].set(kf_slot),
        kf_feat_pt=state.kf_feat_pt.at[kf_slot, jnp.asarray(chosen)].set(
            sl.astype(jnp.int32)
        ),
    )
    return state


def triangulate_new_points(state: ms.MapState, cam, kf_slot: int,
                           max_new: int = 256) -> ms.MapState:
    """Two-view triangulation with the best covisible neighbor
    (CreateNewMapPoints :259, epipolar-constrained match)."""
    order, weights = covis.best_covisible(state, kf_slot, 1)
    nb = int(order[0])
    if nb == kf_slot or int(weights[0]) < covis.MIN_WEIGHT:
        return state

    free_a = state.kf_feat_valid[kf_slot] & (state.kf_feat_pt[kf_slot] < 0)
    free_b = state.kf_feat_valid[nb] & (state.kf_feat_pt[nb] < 0)
    m = matcher.match(state.kf_desc[kf_slot], free_a, state.kf_desc[nb],
                      free_b, max_dist=matcher.TH_LOW, ratio=0.8,
                      mutual=True)
    uv1 = state.kf_xy[kf_slot]
    uv2 = state.kf_xy[nb][jnp.maximum(m.idx, 0)]
    pts = tri.triangulate_two_views(cam, cam, state.kf_pose[kf_slot],
                                    state.kf_pose[nb], uv1, uv2)
    masks = tri.acceptance_masks(cam, cam, state.kf_pose[kf_slot],
                                 state.kf_pose[nb], pts, uv1, uv2)
    good = np.asarray(
        m.valid & masks["parallax"] & masks["depth"] & masks["reproj"]
        & jnp.all(jnp.isfinite(pts), axis=-1)
    )
    chosen = np.nonzero(good)[0][:max_new]
    if len(chosen) == 0:
        return state
    slots = ms.alloc_slots(state.pt_valid, len(chosen))
    ok = slots >= 0
    chosen, slots = chosen[ok], slots[ok]
    if len(chosen) == 0:
        return state
    sl = jnp.asarray(slots)
    ch = jnp.asarray(chosen)
    nb_feat = m.idx[ch]
    state = state._replace(
        pt_pos=state.pt_pos.at[sl].set(pts[ch]),
        pt_valid=state.pt_valid.at[sl].set(True),
        pt_desc=state.pt_desc.at[sl].set(state.kf_desc[kf_slot][ch]),
        pt_ref_kf=state.pt_ref_kf.at[sl].set(kf_slot),
        pt_first_kf=state.pt_first_kf.at[sl].set(kf_slot),
        kf_feat_pt=state.kf_feat_pt.at[kf_slot, ch].set(sl.astype(jnp.int32))
        .at[nb, nb_feat].set(sl.astype(jnp.int32)),
    )
    return state


def fuse_neighbors(state: ms.MapState, cam, kf_slot: int,
                   radius: float = 3.0) -> ms.MapState:
    """SearchInNeighbors role (:506): project neighbor KFs' points into this
    KF; unassociated features matching a projected point adopt it."""
    order, weights = covis.best_covisible(state, kf_slot, 3)
    M = ms.membership_matrix(state)
    nb_pts = jnp.zeros(state.pt_pos.shape[0], bool)
    for i in range(3):
        if int(weights[i]) >= covis.MIN_WEIGHT:
            nb_pts = nb_pts | M[int(order[i])]

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
    octave of its observation."""
    M = ms.membership_matrix(state).astype(jnp.float32)  # (K, P)
    t_wc = jax.vmap(lie.inv_se3)(state.kf_pose)
    centers = t_wc[:, :3, 3]  # (K, 3)
    diff = state.pt_pos[None, :, :] - centers[:, None, :]  # (K, P, 3)
    dirs = diff / jnp.maximum(
        jnp.linalg.norm(diff, axis=-1, keepdims=True), 1e-9
    )
    n_obs = jnp.maximum(jnp.sum(M, axis=0), 1.0)
    normal = jnp.einsum("kp,kpi->pi", M, dirs) / n_obs[:, None]

    ref = jnp.maximum(state.pt_ref_kf, 0)
    dist = jnp.linalg.norm(state.pt_pos - centers[ref], axis=-1)
    # octave of the point's observation in its reference KF: look up the
    # feature slot via the (K, F) association table
    F = state.kf_feat_pt.shape[1]
    slot_match = state.kf_feat_pt[ref] == jnp.arange(
        state.pt_pos.shape[0]
    )[:, None]  # (P, F)
    lvl = jnp.max(
        jnp.where(slot_match, state.kf_level[ref], 0), axis=1
    ).astype(jnp.float32)
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
    M = ms.membership_matrix(state)
    n_obs = jnp.sum(M, axis=0)
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
                   redundancy: float = 0.9):
    """KeyFrameCulling (:684): a local KF whose points are ≥90% seen by ≥3
    other KFs is removed.  Returns (state, culled_slot or −1) — the caller
    must purge the slot from the BoW database and re-anchor any frame
    trajectory entries referencing it (the reference re-parents frames to
    the spanning tree on culling).  The culled slot's pose array entry is
    left intact so re-anchoring can read it."""
    M = ms.membership_matrix(state)
    n_obs = jnp.sum(M, axis=0)  # (P,)
    W = covis.covisibility_matrix(state)
    local = (W[kf_slot] >= covis.MIN_WEIGHT) & state.kf_valid
    for k in np.nonzero(np.asarray(local))[0]:
        k = int(k)
        mine = np.asarray(M[k])
        if mine.sum() == 0:
            continue
        redundant = (np.asarray(n_obs) >= 4) & mine  # seen by ≥3 others
        if redundant.sum() >= redundancy * mine.sum():
            assoc = state.kf_feat_pt.at[k].set(-1)
            state = state._replace(
                kf_valid=state.kf_valid.at[k].set(False),
                kf_feat_pt=assoc,
            )
            return state, k  # at most one per round, like the reference
    return state, -1


def build_local_ba_problem(state: ms.MapState, center_kf: int,
                           max_kfs: int, global_window: bool = False
                           ) -> ba.BAProblem:
    """Assemble the fixed-capacity BA problem for the covisible window
    (host control plane; the solve is `ba.local_ba`).  With
    `global_window=True` every valid keyframe and point enters (the
    GlobalJointBundleAdjustemnt problem)."""
    if global_window:
        in_w_np = np.asarray(state.kf_valid)
        frontier_np = np.zeros_like(in_w_np)
        wpts = state.pt_valid
    else:
        in_w, frontier, wpts = covis.local_window(state, center_kf, max_kfs)
        in_w_np = np.asarray(in_w)
        frontier_np = np.asarray(frontier)
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

    obs_kf, obs_pt, obs_uv = [], [], []
    kf_xy = np.asarray(state.kf_xy)
    kf_ur = np.asarray(state.kf_ur)
    kf_pt = np.asarray(state.kf_feat_pt)
    kf_lvl = np.asarray(state.kf_level)
    obs_info = []
    wpts_np = np.asarray(wpts)
    for k in np.nonzero(involved)[0]:
        sel = (kf_pt[k] >= 0)
        sel &= wpts_np[np.maximum(kf_pt[k], 0)]
        ii = np.nonzero(sel)[0]
        obs_kf.append(np.full(len(ii), k))
        obs_pt.append(kf_pt[k][ii])
        obs_uv.append(
            np.concatenate([kf_xy[k][ii], kf_ur[k][ii][:, None]], -1)
        )
        obs_info.append(1.0 / (1.2 ** (2.0 * kf_lvl[k][ii])))
    if obs_kf:
        obs_kf = np.concatenate(obs_kf)
        obs_pt = np.concatenate(obs_pt)
        obs_uv = np.concatenate(obs_uv)
        obs_info = np.concatenate(obs_info)
    else:
        obs_kf = np.zeros(0, np.int32)
        obs_pt = np.zeros(0, np.int32)
        obs_uv = np.zeros((0, 3), np.float32)
        obs_info = np.zeros(0, np.float32)
    n = min(len(obs_kf), MAX_LOCAL_OBS)
    pad = MAX_LOCAL_OBS - n

    def padded(a, fill):
        a = a[:n]
        return np.concatenate(
            [a, np.full((pad,) + a.shape[1:], fill, a.dtype)]
        )

    # dynamic objects do not enter BA (the reference only adds static
    # objects' relative-pose edges to the joint problem)
    oobs_valid = np.asarray(state.oobs_valid) & involved[
        np.maximum(np.asarray(state.oobs_kf), 0)
    ] & ~np.asarray(state.obj_dynamic)[
        np.maximum(np.asarray(state.oobs_obj), 0)
    ]
    # observability guard: a point may only be optimized if its in-problem
    # edges determine it — ≥2 observations, or ≥1 stereo (3-row) observation
    # (single mono edges leave the depth direction free and explode)
    P = state.pt_pos.shape[0]
    n_obs_pt = np.zeros(P, np.int32)
    np.add.at(n_obs_pt, obs_pt[:n] if isinstance(obs_pt, np.ndarray) else [], 1)
    has_stereo = np.zeros(P, bool)
    if n:
        st_sel = obs_uv[:n, 2] >= 0
        has_stereo[obs_pt[:n][st_sel]] = True
    determined = (n_obs_pt >= 2) | has_stereo
    return ba.BAProblem(
        kf_pose=state.kf_pose,
        kf_fixed=jnp.asarray(frontier_np) | ~jnp.asarray(in_w_np),
        kf_valid=state.kf_valid,
        pts=state.pt_pos,
        pt_valid=state.pt_valid & jnp.asarray(wpts_np)
        & jnp.asarray(determined),
        obs_kf=jnp.asarray(padded(obs_kf.astype(np.int32), 0)),
        obs_pt=jnp.asarray(padded(obs_pt.astype(np.int32), 0)),
        obs_uv=jnp.asarray(padded(obs_uv.astype(np.float32), 0.0)),
        obs_info=jnp.asarray(padded(obs_info.astype(np.float32), 0.0)),
        obs_mask=jnp.asarray(padded(np.ones(n, bool), False)),
        obj_pose=state.obj_pose,
        obj_valid=state.obj_valid,
        oobs_kf=jnp.maximum(state.oobs_kf, 0),
        oobs_obj=jnp.maximum(state.oobs_obj, 0),
        oobs_t_co=state.oobs_t_co,
        oobs_mask=jnp.asarray(oobs_valid),
    )


def apply_ba_result(state: ms.MapState, prob: ba.BAProblem,
                    res: ba.BAResult) -> ms.MapState:
    """Write BA results back into the map (recover step)."""
    return state._replace(kf_pose=res.kf_pose, pt_pos=res.pts,
                          obj_pose=res.obj_pose)


def local_ba_step(state: ms.MapState, cam, center_kf: int,
                  max_kfs: int = 10) -> ms.MapState:
    prob = build_local_ba_problem(state, center_kf, max_kfs)
    res = ba.local_ba(cam, prob)
    return apply_ba_result(state, prob, res)
