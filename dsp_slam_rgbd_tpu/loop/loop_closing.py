"""Loop closing: detection consistency, Sim(3) computation, correction.

Covers `LoopClosing` (`src/LoopClosing.cc` + `_util.cc`):

  * `check_consistency` — the consecutive-detection consistency groups of
    `DetectLoop` (:113): a candidate must be re-detected in ≥3 consecutive
    keyframes (group overlap tracked host-side);
  * `compute_loop_sim3` — `ComputeSim3` (:241): descriptor matches between
    query and candidate KF features, 3D-3D correspondences from their
    associated map points, Sim3Solver RANSAC + refinement;
  * `correct_loop` — `CorrectLoopWithObjects` (`LoopClosing_util.cc:28`):
    propagate the corrective Sim(3) to the query's covisible group, remap
    their map points AND map objects, then essential-graph optimization;
    global joint BA runs after (caller's choice, as the reference spawns it
    in a thread).

Map-state mutations are functional; the host drives the sequencing.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from dsp_slam_rgbd_tpu.frontend import matcher
from dsp_slam_rgbd_tpu.ops import camera as cam_ops
from dsp_slam_rgbd_tpu.mapping import covisibility as covis
from dsp_slam_rgbd_tpu.mapping import map_state as ms
from dsp_slam_rgbd_tpu.mapping import pose_graph
from dsp_slam_rgbd_tpu.ops import lie
from dsp_slam_rgbd_tpu.solvers import sim3 as sim3_mod


class ConsistencyState:
    """Host-side consecutive-detection bookkeeping (reference
    `mvConsistentGroups`)."""

    def __init__(self, min_consistency: int = 3):
        self.groups: list[tuple[set, int]] = []  # (kf set, count)
        self.min_consistency = min_consistency

    def update(self, candidate_groups: list[set],
               candidates: list[int] | None = None) -> list[int]:
        """Feed this keyframe's candidate groups (each a set of KF slots);
        returns candidate KFs that reached the consistency threshold.

        candidates[i] names the retrieval candidate that produced group i —
        ONLY that keyframe is promoted (the reference's
        `mvpEnoughConsistentCandidates.push_back(pCandidateKF)`,
        `LoopClosing.cc:170-220`).  Promoting the whole covisible group let
        a RECENT keyframe riding in a legitimate candidate's group reach
        the Sim3 stage, where it trivially matches the current view and
        fires a spurious self-closure (observed on the long-run fixture:
        a 'closure' against the immediately preceding keyframe whose
        correction cascade then destabilized tracking)."""
        new_groups = []
        consistent = []
        for i, grp in enumerate(candidate_groups):
            count = 0
            for prev, prev_count in self.groups:
                if grp & prev:
                    count = max(count, prev_count + 1)
            new_groups.append((grp, count))
            if count >= self.min_consistency:
                if candidates is not None:
                    consistent.append(int(candidates[i]))
                else:
                    consistent.extend(sorted(grp))
        self.groups = new_groups
        return consistent


def _pairs_from_match(state: ms.MapState, kf_q: int, kf_c: int, idx, valid):
    """Lift a per-query-feature match (idx into kf_c features) to 3D-3D
    pairs in the two camera frames."""
    pt_q = state.kf_feat_pt[kf_q]
    pt_c = state.kf_feat_pt[kf_c][jnp.maximum(idx, 0)]
    ok = valid & (pt_q >= 0) & (pt_c >= 0)
    ok = ok & state.pt_valid[jnp.maximum(pt_q, 0)] \
        & state.pt_valid[jnp.maximum(pt_c, 0)]
    pw_q = state.pt_pos[jnp.maximum(pt_q, 0)]
    pw_c = state.pt_pos[jnp.maximum(pt_c, 0)]
    p_q = lie.transform_points(state.kf_pose[kf_q], pw_q)
    p_c = lie.transform_points(state.kf_pose[kf_c], pw_c)
    uv_q = state.kf_xy[kf_q]
    uv_c = state.kf_xy[kf_c][jnp.maximum(idx, 0)]
    return p_q, p_c, uv_q, uv_c, ok


def guided_rematch(state: ms.MapState, cam, kf_q: int, kf_c: int,
                   t_qc: jnp.ndarray, radius: float = 7.5):
    """Sim3-guided projection re-match (`ORBmatcher::SearchBySim3`,
    `ORBmatcher.cc:1102`): project the candidate KF's map points into the
    query image with t_qc and admit descriptor matches within a
    scale-dependent pixel radius; mutual best-match replaces the
    reference's two-directional agreement check."""
    pt_c = state.kf_feat_pt[kf_c]
    have_c = state.kf_feat_valid[kf_c] & (pt_c >= 0) \
        & state.pt_valid[jnp.maximum(pt_c, 0)]
    pw_c = state.pt_pos[jnp.maximum(pt_c, 0)]
    p_c = lie.transform_points(state.kf_pose[kf_c], pw_c)
    uv_pred = cam_ops.project(cam, lie.transform_points(t_qc, p_c))
    r = radius * 1.2 ** state.kf_level[kf_c].astype(jnp.float32)
    in_front = lie.transform_points(t_qc, p_c)[:, 2] > 0
    # (F_q, F_c) admissible window around each candidate point's projection
    d2 = jnp.sum(
        (state.kf_xy[kf_q][:, None, :] - uv_pred[None, :, :]) ** 2, -1)
    win = d2 <= (r[None, :] ** 2)
    vq = state.kf_feat_valid[kf_q] & (state.kf_feat_pt[kf_q] >= 0)
    return matcher.match(
        state.kf_desc[kf_q], vq, state.kf_desc[kf_c],
        have_c & in_front, mask=win, max_dist=matcher.TH_HIGH, mutual=True)


@partial(jax.jit, static_argnames=("cam",))
def _group_projection_count(state: ms.MapState, cam, kf_q, kf_c,
                            t_21, radius: float = 10.0):
    """The reference's final loop-acceptance gate (`LoopClosing.cc:331-356`):
    project EVERY map point observed by the candidate's covisible group into
    the query keyframe through the refined Sim3 and count descriptor matches
    within a 10 px window (`SearchByProjection(mvpLoopMapPoints)`).  Two
    keyframes related by a wrong-but-self-consistent Sim3 (perceptual
    aliasing on repetitive structure) pass the 20-inlier refinement gate yet
    fail this one: the wider group's points do not re-project coherently."""
    K = state.kf_valid.shape[0]
    group = (covis.covisibility_row(state, kf_c) >= covis.MIN_WEIGHT)
    group = group.at[kf_c].set(True) & state.kf_valid
    pmask = ms.point_mask_of(state, group)
    # candidate-cam → query-cam through the loop Sim3
    p_q = lie.transform_points(t_21 @ state.kf_pose[kf_c], state.pt_pos)
    uv = cam_ops.project(cam, p_q)
    cand = pmask & (p_q[:, 2] > 0.1)
    d2 = jnp.sum((state.kf_xy[kf_q][:, None, :] - uv[None, :, :]) ** 2, -1)
    win = d2 <= radius ** 2
    m = matcher.match(state.kf_desc[kf_q], state.kf_feat_valid[kf_q],
                      state.pt_desc, cand, mask=win,
                      max_dist=matcher.TH_HIGH, mutual=True)
    return jnp.sum(m.valid).astype(jnp.int32)


def compute_loop_sim3(state: ms.MapState, cam, kf_q: int, kf_c: int, key,
                      fix_scale: bool = True, min_accept: int = 20,
                      min_group_matches: int = 40):
    """Full loop Sim(3) pipeline (`LoopClosing::ComputeSim3`,
    `LoopClosing.cc:241-356`): descriptor matches → Sim3Solver RANSAC →
    guided `SearchBySim3` re-match → `OptimizeSim3` GN refinement → the
    loop-group projection gate; the loop is accepted only if the refined
    solution keeps ≥ `min_accept` inliers AND ≥ `min_group_matches` of the
    candidate group's map points re-project onto query descriptors.

    Returns sim3_mod.Sim3Result with t_21 mapping candidate-camera coords
    into query-camera coords (the reference's Scm)."""
    dq = state.kf_desc[kf_q]
    dc = state.kf_desc[kf_c]
    vq = state.kf_feat_valid[kf_q] & (state.kf_feat_pt[kf_q] >= 0)
    vc = state.kf_feat_valid[kf_c] & (state.kf_feat_pt[kf_c] >= 0)
    m = matcher.match(dq, vq, dc, vc, max_dist=matcher.TH_LOW, mutual=True)
    p_q, p_c, uv_q, uv_c, ok = _pairs_from_match(state, kf_q, kf_c,
                                                 m.idx, m.valid)

    res = sim3_mod.solve_sim3_ransac(
        cam, cam, p_c, p_q, uv_c, uv_q, jnp.ones(p_c.shape[0]),
        jnp.ones(p_q.shape[0]), ok, key, fix_scale=fix_scale,
    )
    if not bool(res.ok):
        return res

    # guided re-match with the RANSAC estimate in BOTH directions (the
    # reference's SearchBySim3 projects KF1 points into KF2 AND KF2 points
    # into KF1, ORBmatcher.cc:1102-1256), then union with the descriptor
    # matches (original pairs win, then forward, then reverse)
    m2 = guided_rematch(state, cam, kf_q, kf_c, res.t_21)
    m3 = guided_rematch(state, cam, kf_c, kf_q, lie.inv_sim3(res.t_21))
    # m3 is per-candidate-feature → query idx; invert to per-query → cand
    Fq = state.kf_xy.shape[1]
    tgt = jnp.where(m3.valid, m3.idx, Fq)
    rev_idx = jnp.full(Fq + 1, -1, jnp.int32).at[tgt].set(
        jnp.arange(m3.idx.shape[0], dtype=jnp.int32))[:Fq]
    idx_u = jnp.where(m.valid, m.idx,
                      jnp.where(m2.valid, m2.idx, rev_idx))
    val_u = m.valid | m2.valid | (rev_idx >= 0)
    p_q, p_c, uv_q, uv_c, ok_u = _pairs_from_match(state, kf_q, kf_c,
                                                   idx_u, val_u)

    t_ref, inl, n_in = sim3_mod.refine_sim3_gn(
        cam, cam, res.t_21, p_c, p_q, uv_c, uv_q, ok_u,
        fix_scale=fix_scale,
    )
    ok_fin = (n_in >= min_accept) & jnp.all(jnp.isfinite(t_ref))
    if bool(ok_fin):
        n_group = _group_projection_count(state, cam, kf_q, kf_c, t_ref)
        ok_fin = ok_fin & (n_group >= min_group_matches)
    return sim3_mod.Sim3Result(t_ref, inl, n_in, ok_fin)


def correct_loop(state: ms.MapState, cam, kf_q: int, kf_c: int,
                 t_qc_corrected: jnp.ndarray, fix_scale: bool = True,
                 pg_iters: int = 20) -> ms.MapState:
    """Propagate the loop correction and optimize the essential graph.

    t_qc_corrected: Sim(3) mapping candidate-camera coords to query-camera
    coords (output of compute_loop_sim3).  The corrected query pose is
    S_qw_corr = t_qc_corrected · T_cand_cw; the correction
    ΔS = S_corr · S_old⁻¹ is applied to the query's covisible group and
    their points/objects (reference `LoopClosing_util.cc:92-152`), then the
    pose graph is optimized with the loop edge added.
    """
    K = state.kf_pose.shape[0]
    group = (covis.covisibility_row(state, kf_q) >= covis.MIN_WEIGHT) \
        & state.kf_valid
    group = group.at[kf_q].set(True)
    # the loop candidate anchors the correction and is never part of the
    # warped group (in the reference it cannot be covisibility-connected to
    # the current KF before fusion)
    group = group.at[kf_c].set(False)

    # keep the PRE-correction poses: pose-graph edge measurements must come
    # from the uncorrected relative estimates (the reference's
    # NonCorrectedSim3) or every residual is zero post-warp and the graph
    # optimization becomes a no-op that never distributes drift
    poses_uncorrected = state.kf_pose

    S_old = state.kf_pose[kf_q]
    S_corr = t_qc_corrected @ state.kf_pose[kf_c]
    delta = S_corr @ lie.inv_sim3(S_old)  # world-side correction (Sim3)

    # correct group poses: S_new = S_old_k · Δ⁻¹?  — poses are T_cw; a
    # world-frame warp w ↦ Δ·w means T_cw ↦ T_cw · Δ⁻¹ for non-group KFs to
    # keep projections fixed; the reference instead moves the group INTO the
    # corrected frame: T_k_corr = T_k_old · Δw with Δw = S_old⁻¹·S_corr
    # applied on the world side.
    delta_w = lie.inv_sim3(S_old) @ S_corr  # maps old-world -> new-world? see note
    # Equivalent practical form: T_k_corr = T_k_old @ inv(delta_world) where
    # delta_world warps world points p ↦ delta_world · p.
    delta_world = lie.inv_sim3(delta_w)

    new_kf_pose = jnp.where(
        group[:, None, None],
        jnp.einsum("kij,jl->kil", state.kf_pose, lie.inv_sim3(delta_world)),
        state.kf_pose,
    )

    # warp map points owned by the group (points seen by group KFs)
    owned = ms.point_mask_of(state, group)  # (P,)
    warped = lie.transform_points(delta_world, state.pt_pos)
    new_pts = jnp.where(owned[:, None], warped, state.pt_pos)

    # warp objects observed by the group (reference remaps MapObjects too)
    obj_in = jnp.zeros(state.obj_pose.shape[0] + 1, bool)
    oobs_in_group = state.oobs_valid & group[jnp.maximum(state.oobs_kf, 0)]
    obj_in = obj_in.at[
        jnp.where(oobs_in_group, state.oobs_obj, state.obj_pose.shape[0])
    ].set(True)[: state.obj_pose.shape[0]]
    # Sim(3) ∘ SE(3): full product, then factor the scale out of the
    # rotation block into obj_scale (objects keep SE(3) pose + scalar scale)
    s = lie.sim3_scale(delta_world)
    prod = jnp.einsum("ij,kjl->kil", delta_world, state.obj_pose)
    new_obj_pose = prod.at[:, :3, :3].multiply(1.0 / s)
    new_obj = jnp.where(obj_in[:, None, None], new_obj_pose, state.obj_pose)
    new_obj_scale = jnp.where(obj_in, state.obj_scale * s, state.obj_scale)

    state = state._replace(kf_pose=new_kf_pose, pt_pos=new_pts,
                           obj_pose=new_obj, obj_scale=new_obj_scale)

    # --- essential graph: spanning chain + covisibility + loop edge ---
    # (vectorized: strong-pair extraction from the covisibility matrix and
    # a vmapped relative-measurement build — no O(K²) host loops)
    kf_idx = np.nonzero(np.asarray(state.kf_valid))[0]
    # spanning chain in TEMPORAL order (kf_frame_id) — slot indices are
    # recycled after culling, so consecutive slots can hold temporally
    # distant keyframes and a slot-ordered chain would link them with
    # drift-contaminated relative measurements, warping the whole graph
    order = np.argsort(np.asarray(state.kf_frame_id)[kf_idx])
    kf_idx = kf_idx[order]
    chain = np.stack([kf_idx[:-1], kf_idx[1:]], 1) if len(kf_idx) > 1 \
        else np.zeros((0, 2), np.int64)
    # strong covisibility edges (weight ≥ 100, reference OptimizeEssential
    # Graph's covisibility edges).  One full-matrix build per loop CLOSURE
    # — the chunked covisibility_matrix keeps it memory-bounded at
    # kitti_large capacities (per-keyframe retrieval never builds it)
    Wn = np.asarray(covis.covisibility_matrix(state))
    sa, sb = np.nonzero(np.triu(Wn >= 100, 1))  # strong covisibility edges
    ei = np.concatenate([chain[:, 0], sa, [int(kf_c)]]).astype(np.int32)
    ej = np.concatenate([chain[:, 1], sb, [int(kf_q)]]).astype(np.int32)

    poses = state.kf_pose  # post-warp initialization for the optimizer
    # measurements from the UNcorrected relative estimates; the loop edge
    # (last) carries the Sim3-solve measurement instead
    meas = jax.vmap(pose_graph.relative_sim3)(
        poses_uncorrected[jnp.asarray(ej)], poses_uncorrected[jnp.asarray(ei)]
    )
    meas = meas.at[-1].set(t_qc_corrected)

    fixed = jnp.zeros(K, bool).at[kf_c].set(True)
    res = pose_graph.optimize_pose_graph(
        poses, state.kf_valid, fixed, jnp.asarray(ei, jnp.int32),
        jnp.asarray(ej, jnp.int32), meas, jnp.ones(len(ei), bool),
        fix_scale=fix_scale, n_iters=pg_iters,
    )

    # re-anchor points to their reference KF motion (spanning-tree
    # propagation role, `Optimizer.cc:780` recover step): p ↦ T_new⁻¹·T_old·p
    ref = jnp.maximum(state.pt_ref_kf, 0)
    T_old = state.kf_pose[ref]
    T_new = res.poses[ref]
    moved = jnp.einsum(
        "pij,pj->pi",
        jax.vmap(lie.inv_sim3)(T_new)[:, :3, :3],
        jnp.einsum("pij,pj->pi", T_old[:, :3, :3], state.pt_pos)
        + T_old[:, :3, 3],
    ) + jax.vmap(lie.inv_sim3)(T_new)[:, :3, 3]
    new_pts2 = jnp.where(state.pt_valid[:, None] & (state.pt_ref_kf >= 0)[:, None],
                         moved, state.pt_pos)

    # recover SE(3) keyframe poses from the Sim(3) result: [sR, t] ->
    # [R, t/s] (the reference's essential-graph recover step) — downstream
    # code (trajectory writers, inv_se3) assumes orthonormal rotations
    s_out = jax.vmap(lie.sim3_scale)(res.poses)
    poses_se3 = res.poses.at[:, :3, :3].multiply(
        (1.0 / s_out)[:, None, None]
    ).at[:, :3, 3].multiply((1.0 / s_out)[:, None])
    return state._replace(kf_pose=poses_se3, pt_pos=new_pts2)


def fuse_duplicate_points(state: ms.MapState, group_q: jnp.ndarray,
                          group_c: jnp.ndarray, radius: float = 0.15,
                          max_hamming: int = 50):
    """Merge duplicate map points after a loop correction
    (`SearchAndFuse` role, `LoopClosing_util.cc:175`): points created on the
    revisit (seen by the query group) that coincide with older points from
    the loop side (within `radius`, descriptors within `max_hamming`) are
    replaced — observations repoint to the older landmark.

    group_q / group_c: (K,) bool masks of the two keyframe groups.

    Returns (state, remap) with remap (P,) mapping every old slot to its
    surviving slot (identity where nothing fused).  The caller MUST push
    this through any frame-level point references it holds (the tracker's
    last-frame associations) — the reference gets this for free from
    `MapPoint::Replace` pointer redirection; here a stale slot reference
    silently votes/matches a dead landmark, and the first post-closure
    frame loses tracking exactly when the map just improved.
    """
    pts_q = ms.point_mask_of(state, group_q) & state.pt_valid
    pts_c = ms.point_mask_of(state, group_c) & state.pt_valid
    pts_q = pts_q & ~pts_c  # only revisit-side duplicates die

    # TILED matching: both sides compact to (n_tiles, TILE) index grids and
    # every q-tile scans every c-tile (a dense P x P matrix would be O(GB)
    # at capacity; a single fixed 2048 cap — the pre-r5 behavior — silently
    # dropped everything past it, so duplicates survived big KITTI-scale
    # closures).  The two side counts are fetched on the host (one small
    # sync at loop-closure rate) to size the tile grid; tile counts are
    # power-of-two bucketed so only a few programs ever compile.
    P = state.pt_pos.shape[0]
    TILE = 2048
    n_q = int(jnp.sum(pts_q))
    n_c = int(jnp.sum(pts_c))
    identity = jnp.arange(P)
    if n_q == 0 or n_c == 0:
        return state, identity

    def tiles(n):
        t = 1
        while t * TILE < n:
            t *= 2
        return t

    tq, tc = tiles(n_q), tiles(n_c)
    (iq,) = jnp.nonzero(pts_q, size=tq * TILE, fill_value=P)
    (ic,) = jnp.nonzero(pts_c, size=tc * TILE, fill_value=P)
    best_d2, best_tg = _fuse_match_tiles(
        state.pt_pos, state.pt_desc, iq.reshape(tq, TILE),
        ic.reshape(tc, TILE), radius=radius, max_hamming=max_hamming)

    dies_flat = (best_d2 < jnp.inf) & (iq < P)
    dies = jnp.zeros(P + 1, bool).at[iq].set(dies_flat)[:P]
    remap = jnp.arange(P + 1).at[iq].set(
        jnp.where(dies_flat, best_tg, jnp.minimum(iq, P - 1))
    )[:P]
    assoc = state.kf_feat_pt
    new_assoc = jnp.where(
        assoc >= 0, remap[jnp.maximum(assoc, 0)].astype(jnp.int32), assoc
    )
    return state._replace(
        pt_valid=state.pt_valid & ~dies,
        kf_feat_pt=new_assoc,
    ), remap


@partial(jax.jit, static_argnames=("radius", "max_hamming"))
def _fuse_match_tiles(pt_pos, pt_desc, iq, ic, radius: float,
                      max_hamming: int):
    """Best loop-side fusion target for every revisit-side point.

    iq (TQ, TILE) / ic (TC, TILE): global point indices (P = dead pad).
    Scans all TQ·TC tile pairs with an (TILE, TILE) working set; returns
    (best_d2 (TQ·TILE,), best_target (TQ·TILE,)) with inf/undefined where
    no candidate matched."""
    P = pt_pos.shape[0]
    TILE = iq.shape[1]
    iq_s = jnp.minimum(iq, P - 1)
    ic_s = jnp.minimum(ic, P - 1)

    def per_qtile(args):
        qi, qi_s = args
        pq = pt_pos[qi_s]
        dq = pt_desc[qi_s]
        lq = qi < P

        def per_ctile(carry, cargs):
            best_d2, best_tg = carry
            ci, ci_s = cargs
            pc = pt_pos[ci_s]
            dc = pt_desc[ci_s]
            lc = ci < P
            d2 = jnp.sum((pq[:, None, :] - pc[None, :, :]) ** 2, axis=-1)
            ham = matcher.hamming_matrix(dq, dc)
            pair = (lq[:, None] & lc[None, :] & (d2 <= radius * radius)
                    & (ham <= max_hamming))
            d2m = jnp.where(pair, d2, jnp.inf)
            j = jnp.argmin(d2m, axis=1)
            v = d2m[jnp.arange(TILE), j]
            upd = v < best_d2
            return (jnp.where(upd, v, best_d2),
                    jnp.where(upd, ci_s[j], best_tg)), None

        init = (jnp.full(TILE, jnp.inf), jnp.full(TILE, P - 1))
        (bd, bt), _ = jax.lax.scan(per_ctile, init, (ic, ic_s))
        return bd, bt

    bd, bt = jax.lax.map(per_qtile, (iq, iq_s))
    return bd.reshape(-1), bt.reshape(-1)


def fuse_duplicate_objects(state: ms.MapState, dist_th: float = 1.5
                           ) -> ms.MapState:
    """Merge objects whose centers coincide after correction
    (`SearchAndFuseObjects` `LoopClosing_util.cc:221-293`, 2D-distance
    matching): the younger object is invalidated, its observations repoint
    to the older slot."""
    c = state.obj_pose[:, :3, 3]
    O = c.shape[0]
    d = jnp.linalg.norm(c[:, None, :] - c[None, :, :], axis=-1)
    both = state.obj_valid[:, None] & state.obj_valid[None, :]
    ii = jnp.arange(O)
    dup = both & (d < dist_th) & (ii[None, :] < ii[:, None])  # j < i: i dies
    target = jnp.argmax(dup, axis=1)  # first older duplicate
    dies = jnp.any(dup, axis=1)
    remap = jnp.where(dies, target, ii)
    new_valid = state.obj_valid & ~dies
    new_oobs_obj = remap[jnp.maximum(state.oobs_obj, 0)].astype(jnp.int32)
    new_oobs_obj = jnp.where(state.oobs_obj >= 0, new_oobs_obj,
                             state.oobs_obj)
    pt_obj = state.pt_object
    new_pt_obj = jnp.where(pt_obj >= 0,
                           remap[jnp.maximum(pt_obj, 0)].astype(jnp.int32),
                           pt_obj)
    return state._replace(obj_valid=new_valid, oobs_obj=new_oobs_obj,
                          pt_object=new_pt_obj)
