"""Per-frame tracking front end: the reference `Tracking` state machine.

Covers `src/Tracking.cc`: the NO_IMAGES → NOT_INITIALIZED → OK/LOST machine
(`Track()` :306-549), stereo/RGB-D initialization (:551-605), monocular
initialization via the H/F initializer + median-depth scaling (:607-819),
`TrackWithMotionModel` (:949), `TrackReferenceKeyFrame` (:839),
`TrackLocalMap` (:1012), `NeedNewKeyFrame` (:1059) and `Relocalization`
(:1445).

TPU design: the host drives the (data-dependent) state machine; every
compute step — feature extraction, projection matching, robust pose GN,
PnP — is a fixed-shape jitted kernel.  Map points are matched against a
fixed-capacity local-point gather, so nothing recompiles as the map grows
(SURVEY.md §7 hard part 3).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dsp_slam_rgbd_tpu.config import SystemConfig
from dsp_slam_rgbd_tpu.frontend import matcher, orb, stereo as stereo_mod
from dsp_slam_rgbd_tpu.mapping import covisibility as covis
from dsp_slam_rgbd_tpu.mapping import map_state as ms
from dsp_slam_rgbd_tpu.ops import camera as cam_ops
from dsp_slam_rgbd_tpu.ops import lie
from dsp_slam_rgbd_tpu.solvers import initializer as init_mod
from dsp_slam_rgbd_tpu.solvers import pnp, pose_gn

LOCAL_PTS = 4096  # fixed capacity of the tracked local-point set


class Frame(NamedTuple):
    feats: orb.Features
    ur: jnp.ndarray       # (F,) stereo right-x, −1 if none
    depth: jnp.ndarray    # (F,) metric depth, −1 if none
    t_cw: jnp.ndarray     # (4, 4)
    pt_idx: jnp.ndarray   # (F,) matched map-point slot or −1
    timestamp: float


def _match_body(cam, t_cw, pt_pos, pt_valid, pt_desc, feat_xy,
                feat_desc, feat_level, feat_valid, radius,
                pt_normal=None, pt_min_d=None, pt_max_d=None,
                feat_angle=None, pt_angle=None,
                check_rotation: bool = False):
    """Project candidate points into the frame and match by descriptor.

    The TPU equivalent of `SearchByProjection(F, vpMapPoints)`
    (`ORBmatcher.cc:45`): dense radius mask + Hamming argmin instead of the
    per-cell grid walk.  Optional pt_normal/min_d/max_d enable the
    reference's `isInFrustum` gates (`Frame.cc`): distance inside the
    scale-invariance band, viewing angle within 60° of the mean normal.
    Returns (per-feature point idx or −1, valid)."""
    pc = lie.transform_points(t_cw, pt_pos)
    uv = cam_ops.project(cam, pc)
    in_front = pc[:, 2] > 0.1
    h_margin = 50.0
    in_img = (
        (uv[:, 0] > -h_margin) & (uv[:, 0] < cam.cx * 2 + h_margin)
        & (uv[:, 1] > -h_margin) & (uv[:, 1] < cam.cy * 2 + h_margin)
    )
    cand = pt_valid & in_front & in_img
    if pt_min_d is not None:
        cam_center = lie.inv_se3(t_cw)[:3, 3]
        po = pt_pos - cam_center
        dist = jnp.linalg.norm(po, axis=-1)
        cand = cand & (dist >= 0.8 * pt_min_d) & (dist <= 1.2 * pt_max_d)
        if pt_normal is not None:
            cosv = jnp.sum(po * pt_normal, axis=-1) / jnp.maximum(dist, 1e-9)
            has_n = jnp.linalg.norm(pt_normal, axis=-1) > 1e-6
            cand = cand & (~has_n | (cosv > 0.5))

    # per-feature scale-dependent radius (reference: th·scaleFactor^octave)
    r = radius * (1.2 ** feat_level.astype(jnp.float32))
    d2 = jnp.sum((feat_xy[:, None, :] - uv[None, :, :]) ** 2, axis=-1)
    mask = (d2 <= (r[:, None] ** 2)) & cand[None, :]

    # ratio + mutual gates: a lax best-distance-only test admits wrong
    # zero-flow matches on weakly textured scenes (the reference gets the
    # same protection from its best<0.9·second check in SearchByProjection).
    # check_rotation: the rotation-consistency histogram of the reference's
    # SearchByProjection(F, LastFrame) (`ORBmatcher.cc:1328` + rotHist) —
    # pt_angle carries each point's keypoint angle observed in the last
    # frame (NaN for points the last frame did not see → exempt).
    m = matcher.match(feat_desc, feat_valid, pt_desc, cand, mask=mask,
                      max_dist=matcher.TH_HIGH, ratio=0.85, mutual=True,
                      angles_a=feat_angle, angles_b=pt_angle,
                      check_rotation=check_rotation)
    # cand = the reference's isInFrustum verdict per point — callers use it
    # to bump the `visible` counter for exactly the points that had a
    # chance to be found (MapPoint::IncreaseVisible, Tracking.cc:1579-1600)
    return jnp.where(m.valid, m.idx, -1), m.valid, cand


match_local_points = partial(jax.jit, static_argnames=("cam",
                                                       "check_rotation"))(
    _match_body)


@jax.jit
def _frame_epilogue(t_cw, last_t_cw, ref_pose):
    """Per-frame pose epilogue as ONE device program: the motion-model
    velocity (orthonormalized — it re-enters pose predictions via
    transpose-inverses, which amplify any SO(3) defect 2x/frame) and the
    relative-trajectory transform T_rel = T_cw · T_ref⁻¹.  Composing these
    eagerly cost ~15 tiny per-op dispatches per frame; on the remote-TPU
    tunnel that client overhead was ~half the non-fetch host time
    (measured ~92 ms/frame of host work at 5.3 FPS)."""
    velocity = lie.orthonormalize_se3(t_cw @ lie.inv_se3(last_t_cw))
    t_rel = t_cw @ lie.inv_se3(ref_pose)
    return velocity, t_rel


@partial(jax.jit, static_argnames=("n_keep",))
def _local_window_device(state: ms.MapState, pt_idx: jnp.ndarray,
                         n_keep: int) -> jnp.ndarray:
    """One fused device program for the `UpdateLocalKeyFrames` role
    (`src/Tracking.cc:1309-1398`): vote KFs by shared observations with the
    frame's tracked points (pt_idx: the frame's (F,) feature→point slots),
    take the top-`n_keep` voters, the best covisible neighbor of the 3
    strongest, and the newest KF.  Returns ONE small int32 vector
    `[top_0..top_{n_keep-1}, nb_0..nb_2, newest]` (−1 = empty) so the
    host pays a single fetch — the previous eager per-query version cost ~6
    dispatch+fetch roundtrips per call, which dominated frame time.
    """
    P = state.pt_pos.shape[0]
    tgt = jnp.where(pt_idx >= 0, pt_idx, P)
    pt_in_set = jnp.zeros(P + 1, bool).at[tgt].set(True)[:P]
    ok = ms._obs_ok(state)
    hit = ok & pt_in_set[jnp.maximum(state.kf_feat_pt, 0)]
    votes = jnp.sum(hit, axis=1).astype(jnp.int32) \
        * state.kf_valid.astype(jnp.int32)
    order = jnp.argsort(-votes)
    top = order[:n_keep]
    top = jnp.where(votes[top] > 0, top, -1).astype(jnp.int32)
    nbs = []
    for i in range(min(3, n_keep)):
        row = covis.covisibility_row(state, jnp.maximum(top[i], 0))
        b = jnp.argmax(row)
        good = (row[b] >= covis.MIN_WEIGHT) & (top[i] >= 0)
        nbs.append(jnp.where(good, b, -1).astype(jnp.int32))
    newest = jnp.argmax(jnp.where(state.kf_valid, state.kf_frame_id, -1))
    newest = jnp.where(jnp.any(state.kf_valid), newest, -1).astype(jnp.int32)
    return jnp.concatenate([top, jnp.stack(nbs), newest[None]])


@jax.jit
def _gather_local_points_device(state: ms.MapState,
                                kf_window_mask: jnp.ndarray):
    """(LOCAL_PTS,) indices + mask of points observed by the KF window.

    Device-resident: `top_k` over the point membership mask yields the
    first LOCAL_PTS member indices without fetching a (P,)-bool to the
    host (a per-frame roundtrip over the TPU tunnel)."""
    pmask = ms.point_mask_of(state, kf_window_mask)
    k = min(LOCAL_PTS, pmask.shape[0])  # tiny test maps hold < LOCAL_PTS
    vals, idx = jax.lax.top_k(pmask.astype(jnp.int32), k)
    pad = LOCAL_PTS - k
    return (jnp.pad(idx.astype(jnp.int32), (0, pad)),
            jnp.pad(vals > 0, (0, pad)))


def _gather_local_points(state: ms.MapState, kf_window: np.ndarray):
    """Host wrapper: window membership mask is built in numpy (a jnp
    scatter would recompile per distinct window length — XLA specializes
    on the index-array shape, profiled as per-frame compiles)."""
    kf_mask_np = np.zeros(state.kf_valid.shape[0], bool)
    kf_mask_np[np.asarray(kf_window)] = True
    return _gather_local_points_device(state, jnp.asarray(kf_mask_np))


def _track_stage_core(cam, state: ms.MapState, vote_pt_idx, base_pt_idx,
                      t_init, feat_xy, feat_desc, feat_level, feat_valid,
                      feat_angle, ur, depth, last_pt_idx, last_angles,
                      radius, th_depth_m, n_keep: int, check_rotation: bool,
                      stereo: bool, update_stats: bool):
    """ONE fused device program for a whole tracking stage: local-KF window
    retrieval (`UpdateLocalKeyFrames`), local-point gather, projective
    matching (`SearchByProjection`) and robust pose GN run as a single
    dispatch; the host fetches one small stats vector to drive its (rare)
    fallback branches.  Composing these steps eagerly costs tens of
    dispatch+fetch roundtrips per frame — over the remote-TPU tunnel that
    latency dominated end-to-end FPS (profiled via tools/bench_pipeline.py).

    vote_pt_idx: (F,) feature→point slots used to VOTE the window (last
    frame's for motion-model, the current frame's for track-local-map).
    base_pt_idx: (F,) associations kept where this stage finds no match.
    last_pt_idx/last_angles feed the rotation-consistency gate.

    Returns (t_cw, pt_final, stats, pt_visible', pt_found') with
    stats = [n_matched, n_inliers, ref_kf, n_close_tracked, n_close_free,
    ref_n] (int32) and the found/visible arrays None unless update_stats.
    """
    K = state.kf_valid.shape[0]
    P = state.pt_pos.shape[0]

    # ---- local-KF window by shared observations (Tracking.cc:1309-1398) --
    tgt = jnp.where(vote_pt_idx >= 0, vote_pt_idx, P)
    in_set = jnp.zeros(P + 1, bool).at[tgt].set(True)[:P]
    ok_tab = ms._obs_ok(state)
    hit = ok_tab & in_set[jnp.maximum(state.kf_feat_pt, 0)]
    votes = jnp.sum(hit, axis=1).astype(jnp.int32) \
        * state.kf_valid.astype(jnp.int32)
    order = jnp.argsort(-votes)
    nk = min(n_keep, K)
    top = order[:nk]
    top_ok = votes[top] > 0
    wmask = jnp.zeros(K + 1, bool).at[jnp.where(top_ok, top, K)].set(True)
    # best covisible neighbor of the 3 strongest voters (:1368-1392)
    for i in range(min(3, nk)):
        row = covis.covisibility_row(state, jnp.maximum(top[i], 0))
        b = jnp.argmax(row)
        good = (row[b] >= covis.MIN_WEIGHT) & top_ok[i]
        wmask = wmask.at[jnp.where(good, b, K)].set(True)
    newest = jnp.argmax(jnp.where(state.kf_valid, state.kf_frame_id, -1))
    has_kf = jnp.any(state.kf_valid)
    wmask = wmask.at[jnp.where(has_kf, newest, K)].set(True)
    # fallback window: the nk newest valid KFs (bootstrap, post-reloc)
    _, recent = jax.lax.top_k(
        jnp.where(state.kf_valid, state.kf_frame_id, -1), nk)
    rmask = jnp.zeros(K + 1, bool).at[
        jnp.where(state.kf_valid[recent], recent, K)].set(True)
    any_votes = votes[order[0]] > 0
    wmask = jnp.where(any_votes, wmask, rmask)[:K]
    ref_kf = jnp.where(any_votes, order[0],
                       jnp.where(has_kf, newest, -1)).astype(jnp.int32)

    # ---- local points + projective match ----
    idx, mask = _gather_local_points_device(state, wmask)
    pt_angle = jnp.full(P + 1, jnp.nan, jnp.float32).at[
        jnp.where(last_pt_idx >= 0, last_pt_idx, P)].set(last_angles)[:P]
    pt_li, matched, in_frustum = _match_body(
        cam, t_init, state.pt_pos[idx], state.pt_valid[idx] & mask,
        state.pt_desc[idx], feat_xy, feat_desc, feat_level, feat_valid,
        radius, state.pt_normal[idx], state.pt_min_d[idx],
        state.pt_max_d[idx], feat_angle=feat_angle, pt_angle=pt_angle[idx],
        check_rotation=check_rotation)
    pt_global = jnp.where(pt_li >= 0, idx[jnp.maximum(pt_li, 0)], -1)
    pt_merged = jnp.where(pt_global >= 0, pt_global, base_pt_idx)

    # ---- robust pose GN ----
    pts_w = state.pt_pos[jnp.maximum(pt_merged, 0)]
    obs = jnp.concatenate([feat_xy, ur[:, None]], -1) if stereo else feat_xy
    inv_s2 = 1.0 / (1.2 ** (2.0 * feat_level.astype(jnp.float32)))
    res = pose_gn.optimize_pose(cam, t_init, pts_w, obs, inv_s2,
                                (pt_merged >= 0) & feat_valid, stereo=stereo)
    pt_final = jnp.where(res.inliers, pt_merged, -1)

    # ---- stats for the host's decisions (incl. NeedNewKeyFrame census) --
    n_matched = jnp.sum(pt_merged >= 0).astype(jnp.int32)
    close = (depth > 0) & (depth < th_depth_m) & feat_valid
    n_cl_tracked = jnp.sum(close & (pt_final >= 0)).astype(jnp.int32)
    n_cl_free = jnp.sum(close & (pt_final < 0)).astype(jnp.int32)
    rk = jnp.maximum(ref_kf, 0)
    ref_n = jnp.sum((state.kf_feat_pt[rk] >= 0)
                    & state.kf_feat_valid[rk]).astype(jnp.int32)
    # window point count BEFORE the LOCAL_PTS compaction: when it exceeds
    # the capacity, points were silently dropped from the tracked set —
    # the host warns (no-silent-caps rule)
    n_window_pts = jnp.sum(ms.point_mask_of(state, wmask)).astype(jnp.int32)
    stats = jnp.stack([n_matched, res.n_inliers.astype(jnp.int32), ref_kf,
                       n_cl_tracked, n_cl_free, ref_n, n_window_pts])

    vis = fnd = None
    if update_stats:
        # found/visible counters (MapPoint::IncreaseVisible/Found) —
        # visible ONLY for points passing the frustum test: counting the
        # whole local gather inflates `visible` for points that had no
        # chance to be found, and the found/visible cull then eats fresh
        # points (reference increments via isInFrustum, Tracking.cc:1592)
        vis_idx = jnp.where(mask & in_frustum, idx, P)
        visible = jnp.zeros(P + 1, jnp.int32).at[vis_idx].add(1)[:P]
        found_idx = jnp.where(pt_final >= 0, pt_final, P)
        found = jnp.zeros(P + 1, jnp.int32).at[found_idx].add(1)[:P]
        vis = state.pt_visible + visible
        fnd = state.pt_found + found
    return res.t_cw, pt_final, stats, vis, fnd


_track_stage = partial(jax.jit, static_argnames=(
    "cam", "n_keep", "check_rotation", "stereo", "update_stats"))(
    _track_stage_core)


@partial(jax.jit, static_argnames=("cam", "n_keep", "stereo"))
def _track_frame_fused(cam, state: ms.MapState, t_last, velocity,
                       feat_xy, feat_desc, feat_level, feat_valid,
                       feat_angle, ur, depth, last_pt_idx, last_angles,
                       radius, th_depth_m, n_keep: int, stereo: bool):
    """The WHOLE per-frame tracking pipeline as ONE device program:
    motion-model stage (`TrackWithMotionModel`, incl. the doubled-window
    retry of `Tracking.cc:966-976` as a `lax.cond`) chained into the
    local-map stage (`TrackLocalMap`) when it succeeds.  The host pays a
    single dispatch + a single 15-int stats fetch per frame — the previous
    two-stage split cost two round trips over the remote-TPU tunnel
    (~30-50 ms each), which capped end-to-end FPS regardless of kernel
    speed (tools/bench_pipeline.py).

    Returns (t_cw, pt_idx, stats, pt_visible', pt_found') with
    stats = [s1(7) | s2(7) | mm_ok]; s2 = −1s when the motion-model stage
    failed (host falls back to reference-KF tracking / relocalization)."""
    F = feat_xy.shape[0]
    base = jnp.full(F, -1, jnp.int32)
    t_pred = velocity @ t_last

    def run(r, vote, base_idx, t0, rot: bool, upd: bool):
        return _track_stage_core(
            cam, state, vote, base_idx, t0, feat_xy, feat_desc, feat_level,
            feat_valid, feat_angle, ur, depth, last_pt_idx, last_angles,
            r, th_depth_m, n_keep, rot, stereo, upd)

    t1, pt1, s1, _, _ = run(radius, last_pt_idx, base, t_pred, True, False)
    t1, pt1, s1 = jax.lax.cond(
        s1[0] < 20,
        lambda _: run(2.0 * radius, last_pt_idx, base, t_pred, True,
                      False)[:3],
        lambda _: (t1, pt1, s1), None)
    mm_ok = (s1[0] >= 20) & (s1[1] >= 10)

    def do_local_map(_):
        t2, pt2, s2, vis, fnd = run(4.0, pt1, pt1, t1, False, True)
        return t2, pt2, s2, vis, fnd

    def skip(_):
        return (t1, pt1, jnp.full(7, -1, jnp.int32), state.pt_visible,
                state.pt_found)

    t2, pt2, s2, vis, fnd = jax.lax.cond(mm_ok, do_local_map, skip, None)
    stats = jnp.concatenate([s1, s2, mm_ok.astype(jnp.int32)[None]])
    return t2, pt2, stats, vis, fnd


class Tracker:
    """Host-driven tracking state machine."""

    def __init__(self, cfg: SystemConfig, state: ms.MapState):
        self.cfg = cfg
        self.state = state
        self.status = "NOT_INITIALIZED"
        self.velocity = jnp.eye(4)       # T_curr_prev motion model
        self.last_frame: Optional[Frame] = None
        self.ref_kf = -1
        self.last_kf_frame_id = -1
        self.frame_id = -1
        self.init_ref: Optional[Frame] = None  # mono initialization anchor
        # (timestamp, T_cw, ok) per frame — absolute at track time
        self.trajectory = []
        # (timestamp, ref_kf_slot, T_rel = T_cw·T_ref⁻¹, ok): the reference
        # stores frame poses relative to their reference keyframe so BA and
        # loop corrections retroactively improve saved trajectories
        # (`System::SaveTrajectoryTUM`, System.cc:380-420)
        self.relative_trajectory = []
        self.n_inliers_last = 0
        self.map_changed = False  # set by the System on loop closure / GBA
        self._key = jax.random.PRNGKey(0)
        self._kv_memo = None  # (kf_valid device array, host copy)
        self._stage_stats = None  # last fused tracking-stage stats (np)
        self._inflight = None     # one-frame-deep pipelined dispatch
        # frames whose covisible window held more points than the LOCAL_PTS
        # gather capacity (the excess is untracked that frame) — observable,
        # never silent
        self.local_pts_overflows = 0
        # optional place-recognition hook: frame -> candidate KF slots
        # (installed by the System when a BoW database exists — the
        # `DetectRelocalizationCandidates` path, KeyFrameDatabase.cc:199)
        self.reloc_candidates_fn = None
        # mapping-idleness probe (installed by the System): the reference
        # gates keyframe condition c1b on LocalMapping being idle
        # (`Tracking.cc:1103-1110` bLocalMappingIdle) — without it, dense
        # insertion outruns the mapping stage and every frame becomes a
        # keyframe while jobs queue
        self.mapping_idle_fn = None
        # optional latency-overlap hook (installed by the System): called
        # between the per-frame program DISPATCH and its stats FETCH, so
        # host-side waits that must happen this frame anyway (the mapping
        # worker's tail latency before a due adoption) ride under the
        # stats round trip instead of serializing after it
        self.pre_fetch_hook = None

    # ------------------------------------------------------------------
    @staticmethod
    def _upload_image(img) -> jnp.ndarray:
        """Host→device image transfer.  uint8 inputs ship as 1 byte/px and
        cast to f32 ON DEVICE: the remote-TPU tunnel moves ~37 MB/s, so a
        KITTI-size f32 pair costs ~125 ms/frame against ~50 ms as uint8
        (camera images are natively uint8 — keep them that way in flight).
        Device-resident inputs (e.g. from an async prefetcher) pass
        through untouched."""
        a = jnp.asarray(img)
        return a if a.dtype == jnp.float32 else a.astype(jnp.float32)

    def make_frame(self, img, img_right=None, depth_map=None,
                   timestamp: float = 0.0) -> Frame:
        if img_right is not None:
            # one batched dispatch for the stereo pair (vmapped extractor)
            il = self._upload_image(img)
            ir = self._upload_image(img_right)
            feats, fr = orb.extract_pair(il, ir, self.cfg.orb)
            F = feats.xy.shape[0]
            sm = stereo_mod.match_stereo(
                feats, fr, il, ir, self.cfg.cam.bf,
                min_z=self.cfg.cam.bf / self.cfg.cam.fx,
            )
            ur = sm.u_right
            dep = sm.depth
        else:
            feats = orb.extract(self._upload_image(img), self.cfg.orb)
            F = feats.xy.shape[0]
            ur = jnp.full(F, -1.0)
            dep = jnp.full(F, -1.0)
            if depth_map is not None:
                sm = stereo_mod.depth_to_stereo(
                    feats, jnp.asarray(depth_map, jnp.float32),
                    self.cfg.cam.bf, self.cfg.depth_scale,
                )
                ur = sm.u_right
                dep = sm.depth
        if any(abs(d) > 0.0 for d in self.cfg.cam.dist):
            # keypoint undistortion (reference `Frame::UndistortKeyPoints`,
            # Frame.cc:421-435): all downstream geometry — matching windows,
            # pose GN, triangulation — uses undistorted coordinates.  It
            # runs AFTER stereo matching, which needs raw pixel alignment
            # with the images (stereo/KITTI inputs are rectified anyway;
            # distortion is the mono/Freiburg path).
            from dsp_slam_rgbd_tpu.ops import camera as cam_ops

            feats = feats._replace(
                xy=cam_ops.undistort_pixels(self.cfg.cam, feats.xy))
        return Frame(feats, ur, dep, jnp.eye(4),
                     jnp.full(F, -1, jnp.int32), timestamp)

    # ------------------------------------------------------------------
    def track(self, img=None, img_right=None, depth_map=None,
              timestamp: float = 0.0, frame: Optional[Frame] = None) -> list:
        """Process one frame.  Returns a LIST of status dicts (in frame
        order); the caller (System) handles keyframe insertion per dict.

        In the steady OK state with `TrackingConfig.pipelined`, tracking
        is PIPELINED one frame deep: this call dispatches the current
        frame's fused program and finalizes (fetches + decides) the
        PREVIOUS frame — the per-frame stats round trip rides under the
        next frame's device compute instead of serializing the loop.  The
        returned dicts then describe the previous frame; a provisional
        dict (``provisional=True``) is returned while the pipeline primes.
        State-machine transitions (init, loss, relocalization, post-loop
        re-anchoring) drain the pipeline and run synchronously.

        `frame`: a pre-built Frame (see `system/prefetch.FramePrefetcher`:
        upload + ORB extraction dispatched one frame AHEAD on a worker
        thread)."""
        self.frame_id += 1
        if frame is None:
            frame = self.make_frame(img, img_right, depth_map, timestamp)
        else:
            timestamp = frame.timestamp

        if self.status == "NOT_INITIALIZED":
            out = {"new_kf": False, "frame": frame, "ok": False,
                   "fid": self.frame_id, "timestamp": timestamp}
            if self.cfg.sensor in ("stereo", "rgbd"):
                ok = self._stereo_init(frame)
            else:
                ok = self._mono_init(frame)
            if ok:
                self.status = "OK"
                out["new_kf"] = True  # map init created KF(s)
                out["ok"] = True
                self.trajectory.append(
                    (timestamp, np.asarray(self.last_frame.t_cw), True)
                )
            out["frame"] = self.last_frame or frame
            return [out]

        if self.cfg.tracking.pipelined and self.status == "OK" \
                and self.last_frame is not None and not self.map_changed:
            return self._track_pipelined(frame, timestamp)
        outs = self.finalize_pending()  # drain the pipeline before sync
        outs += self._track_sync(frame, timestamp, self.frame_id)
        return outs

    def _track_sync(self, frame: Frame, timestamp: float,
                    fid: int) -> list:
        """The synchronous per-frame path (dispatch + immediate fetch +
        fallback chain) — used outside the steady pipelined state."""
        # fast path: motion-model + local-map as ONE fused dispatch with a
        # single stats fetch; the (rare) failure branches fall back to the
        # eager reference-KF / relocalization stages below
        ok = False
        fused_done = False
        if self.status == "OK" and self.last_frame is not None:
            frame, ok, fused_done = self._track_frame_fast(frame)
        if not fused_done:
            if self.status == "OK" and not ok:
                frame, ok = self._track_reference_kf(frame)
            if self.status == "LOST" or not ok:
                frame, ok = self._relocalize(frame)
            if ok:
                frame, n_tracked = self._track_local_map(frame)
                ok = n_tracked >= self.cfg.tracking.min_tracked_for_ok
                self.n_inliers_last = n_tracked
        return [self._commit_frame(frame, timestamp, fid, ok)]

    def _commit_frame(self, frame: Frame, timestamp: float, fid: int,
                      ok: bool, velocity=None, t_rel=None,
                      rel_ref=None) -> dict:
        """Shared per-frame epilogue: status transition, motion-model
        velocity, trajectory entries, keyframe census.  `velocity`/`t_rel`
        may be precomputed (the pipelined path computes them at dispatch
        time); otherwise one fused epilogue dispatch derives them."""
        was_lost = self.status == "LOST"
        self.status = "OK" if ok else "LOST"
        if velocity is None:
            # one fused dispatch (outputs stay DEVICE arrays — a per-frame
            # np.asarray here is a blocking tunnel roundtrip; savers
            # convert in bulk at exit)
            last_t = self.last_frame.t_cw if self.last_frame is not None \
                else jnp.eye(4)
            ref_pose = self.state.kf_pose[self.ref_kf] if self.ref_kf >= 0 \
                else jnp.eye(4)
            velocity, t_rel = _frame_epilogue(frame.t_cw, last_t, ref_pose)
        if ok and self.last_frame is not None and not was_lost:
            self.velocity = velocity
        elif was_lost:
            # the previous frame's pose is meaningless after a loss: a
            # velocity computed against it poisons the motion model for
            # every frame following a relocalization
            self.velocity = jnp.eye(4)
        self.trajectory.append((timestamp, frame.t_cw, ok))
        ref = rel_ref if rel_ref is not None else self.ref_kf
        if ref >= 0:
            self.relative_trajectory.append((timestamp, ref, t_rel, ok))
        self.last_frame = frame
        return {"frame": frame, "ok": ok, "fid": fid,
                "timestamp": timestamp,
                "new_kf": ok and self._need_new_keyframe(fid)}

    # ---- one-frame-deep pipelined tracking ---------------------------
    def _dispatch_pipelined(self, frame: Frame, timestamp: float) -> dict:
        """Dispatch the fused tracking program for `frame` against the
        current optimistic last outputs (the in-flight frame's, if any) —
        NO fetch.  Also dispatches the frame's pose epilogue (its inputs
        are available as futures)."""
        infl = self._inflight
        if infl is not None:
            lf_pt = infl["pt_idx"]
            lf_ang = infl["frame"].feats.angle
            base_t = infl["t_cw"]
        else:
            lf = self.last_frame
            lf_pt, lf_ang = lf.pt_idx, lf.feats.angle
            base_t = lf.t_cw
        prev_t = base_t
        radius = 7.0 if self.cfg.sensor in ("stereo", "rgbd") else 15.0
        th_depth_m = self.cfg.cam.bf / max(self.cfg.cam.fx, 1e-9) \
            * self.cfg.tracking.th_depth
        pre_state = self.state
        t_cw, pt_idx, stats, vis, fnd = _track_frame_fused(
            self.cfg.cam, self.state, base_t, self.velocity,
            frame.feats.xy, frame.feats.desc, frame.feats.level,
            frame.feats.valid, frame.feats.angle, frame.ur, frame.depth,
            lf_pt, lf_ang, radius, th_depth_m,
            n_keep=self.cfg.map.local_window,
            stereo=self.cfg.sensor in ("stereo", "rgbd"))
        try:
            stats.copy_to_host_async()
        except Exception:
            pass
        self.state = self.state._replace(pt_visible=vis, pt_found=fnd)
        # this frame's epilogue, relative to the optimistic previous pose;
        # ref_kf is one frame stale here — T_rel entries are exact for
        # WHICHEVER valid reference they record, so staleness is benign
        ref_pose = self.state.kf_pose[self.ref_kf] if self.ref_kf >= 0 \
            else jnp.eye(4)
        vel, t_rel = _frame_epilogue(t_cw, prev_t, ref_pose)
        return {"fid": self.frame_id, "frame": frame, "t_cw": t_cw,
                "pt_idx": pt_idx, "stats": stats, "ts": timestamp,
                "pre_state": pre_state, "vel": vel, "t_rel": t_rel,
                "ref": self.ref_kf}

    def _track_pipelined(self, frame: Frame, timestamp: float) -> list:
        infl = self._inflight
        disp = self._dispatch_pipelined(frame, timestamp)
        self._inflight = disp
        if infl is None:
            # priming: the real decisions for this frame arrive at the
            # next call's finalize
            prov = frame._replace(t_cw=disp["t_cw"], pt_idx=disp["pt_idx"])
            return [{"frame": prov, "ok": True, "new_kf": False,
                     "fid": disp["fid"], "timestamp": timestamp,
                     "provisional": True}]
        return self._finalize_one(infl, speculative=disp)

    def finalize_pending(self) -> list:
        """Finalize the in-flight pipelined frame, if any (state
        transitions, flush, shutdown)."""
        infl = self._inflight
        if infl is None:
            return []
        self._inflight = None
        return self._finalize_one(infl, speculative=None)

    def _finalize_one(self, infl: dict, speculative) -> list:
        """Fetch + decide the in-flight frame.  On success, commit its
        optimistic outputs (the speculative next dispatch stays valid).
        On failure, REWIND the speculative dispatch, run the fallback
        chain for the failed frame, and re-process the speculative frame
        synchronously — tracking failures cost one wasted dispatch, the
        steady state costs no fetch wait."""
        stats_dev = infl["stats"]
        if self.pre_fetch_hook is not None:
            self.pre_fetch_hook()
        stats = np.asarray(stats_dev)
        self._warn_local_overflow(stats)
        if stats[9] >= 0:
            self.ref_kf = int(stats[9])
        elif stats[2] >= 0:
            self.ref_kf = int(stats[2])
        mm_ok = stats[14] != 0
        ok = False
        if mm_ok:
            self._stage_stats = stats[7:14]
            n_tracked = int(stats[8])
            ok = n_tracked >= self.cfg.tracking.min_tracked_for_ok
        else:
            self._stage_stats = stats[0:7]
        if ok:
            self.n_inliers_last = n_tracked
            frame1 = infl["frame"]._replace(t_cw=infl["t_cw"],
                                            pt_idx=infl["pt_idx"])
            # commit with the epilogue computed at dispatch; the t_rel
            # entry references the ref recorded then
            out = self._commit_frame(frame1, infl["ts"], infl["fid"], True,
                                     velocity=infl["vel"],
                                     t_rel=infl["t_rel"],
                                     rel_ref=infl["ref"])
            return [out]
        # ---- failure: rewind the speculative dispatch and fall back ----
        if speculative is not None:
            self.state = speculative["pre_state"]
            self._inflight = None
        frame1 = infl["frame"]
        ok2 = False
        frame1, ok2 = self._track_reference_kf(frame1)
        if not ok2:
            frame1, ok2 = self._relocalize(frame1)
        if ok2:
            frame1, n = self._track_local_map(frame1)
            ok2 = n >= self.cfg.tracking.min_tracked_for_ok
            self.n_inliers_last = n
        outs = [self._commit_frame(frame1, infl["ts"], infl["fid"], ok2)]
        if speculative is not None:
            # the speculative frame's dispatch consumed pre-failure state:
            # re-process it synchronously against the corrected frame
            outs += self._track_sync(speculative["frame"],
                                     speculative["ts"], speculative["fid"])
        return outs

    # ------------------------------------------------------------------
    def _stereo_init(self, frame: Frame) -> bool:
        """Reference stereo init (`Tracking.cc:551-605`): need ≥500 features
        with depth; spawn points directly (System handles map insertion).
        If a ground-truth first pose is configured (fork's ground-frame
        init, `Tracking.cc:759-794`), the map starts in that frame."""
        n_depth = int(jnp.sum((frame.depth > 0) & frame.feats.valid))
        if n_depth < 100:
            return False
        t0 = jnp.eye(4)
        if self.cfg.t_world_camera0 is not None:
            t_wc = jnp.asarray(self.cfg.t_world_camera0, jnp.float32)
            t0 = lie.inv_se3(t_wc)
        self.last_frame = frame._replace(t_cw=t0)
        return True

    def _mono_init(self, frame: Frame) -> bool:
        """Two-frame H/F initialization (`Tracking.cc:607-819`)."""
        if self.init_ref is None:
            if int(jnp.sum(frame.feats.valid)) > 100:
                self.init_ref = frame
            return False
        ref = self.init_ref
        m = matcher.match(
            ref.feats.desc, ref.feats.valid, frame.feats.desc,
            frame.feats.valid,
            mask=matcher.radius_mask(ref.feats.xy, frame.feats.xy, 100.0),
            max_dist=matcher.TH_LOW, ratio=0.9, mutual=True,
            # rotation-consistency histogram gate (reference
            # `SearchForInitialization`, ORBmatcher.cc:405 + rotHist): keep
            # only matches in the 3 dominant angle-difference bins
            angles_a=ref.feats.angle, angles_b=frame.feats.angle,
            check_rotation=True,
        )
        n_m = int(jnp.sum(m.valid))
        if n_m < 100:
            self.init_ref = frame  # reference refresh, as the reference does
            return False
        uv1 = ref.feats.xy
        uv2 = frame.feats.xy[jnp.maximum(m.idx, 0)]
        self._key, sub = jax.random.split(self._key)
        res = init_mod.initialize(self.cfg.cam, uv1, uv2, m.valid, sub)
        if not bool(res.ok):
            return False
        # median-depth normalization (reference :770-800)
        good = np.asarray(res.good)
        z = np.asarray(res.pts_w)[:, 2]
        med = np.median(z[good]) if good.any() else 1.0
        t21 = np.asarray(res.t_21).copy()
        t21[:3, 3] /= max(med, 1e-6)
        pts = np.asarray(res.pts_w) / max(med, 1e-6)
        self.init_result = {
            "ref_frame": ref, "cur_frame": frame, "matches": m,
            "t21": jnp.asarray(t21), "pts": jnp.asarray(pts),
            "good": res.good,
        }
        self.last_frame = frame._replace(t_cw=jnp.asarray(t21))
        return True

    # ------------------------------------------------------------------
    def _pose_from_matches(self, frame: Frame, pt_idx, matched, t_init):
        pts_w = self.state.pt_pos[jnp.maximum(pt_idx, 0)]
        use_stereo = bool(jnp.any(frame.ur >= 0))
        if use_stereo:
            obs = jnp.concatenate([frame.feats.xy, frame.ur[:, None]], -1)
        else:
            obs = frame.feats.xy
        inv_s2 = 1.0 / (1.2 ** (2.0 * frame.feats.level.astype(jnp.float32)))
        res = pose_gn.optimize_pose(
            self.cfg.cam, t_init, pts_w, obs, inv_s2,
            matched & frame.feats.valid, stereo=use_stereo,
        )
        pt_final = jnp.where(res.inliers, pt_idx, -1)
        return frame._replace(t_cw=res.t_cw, pt_idx=pt_final), \
            int(res.n_inliers)

    def _run_stage(self, frame: Frame, vote_pt_idx, base_pt_idx, t_init,
                   radius: float, check_rotation: bool, update_stats: bool):
        """Dispatch one fused tracking stage and fetch its stats vector."""
        lf = self.last_frame if self.last_frame is not None else frame
        th_depth_m = self.cfg.cam.bf / max(self.cfg.cam.fx, 1e-9) \
            * self.cfg.tracking.th_depth
        t_cw, pt_final, stats, vis, fnd = _track_stage(
            self.cfg.cam, self.state, vote_pt_idx, base_pt_idx, t_init,
            frame.feats.xy, frame.feats.desc, frame.feats.level,
            frame.feats.valid, frame.feats.angle, frame.ur, frame.depth,
            lf.pt_idx, lf.feats.angle, radius, th_depth_m,
            n_keep=self.cfg.map.local_window, check_rotation=check_rotation,
            stereo=self.cfg.sensor in ("stereo", "rgbd"),
            update_stats=update_stats)
        stats = np.asarray(stats)  # the single per-stage host sync
        self._warn_local_overflow(stats)
        if update_stats:
            self.state = self.state._replace(pt_visible=vis, pt_found=fnd)
        if stats[2] >= 0:
            self.ref_kf = int(stats[2])
        self._stage_stats = stats
        return frame._replace(t_cw=t_cw, pt_idx=pt_final), stats

    def _warn_local_overflow(self, stats):
        """Count + warn (once) when the frame's covisible window exceeded
        the LOCAL_PTS gather capacity: the overflow points were silently
        invisible to tracking this frame (no-silent-caps rule)."""
        n_window = max(int(stats[6]),
                       int(stats[13]) if len(stats) > 13 else -1)
        if n_window > LOCAL_PTS:
            self.local_pts_overflows += 1
            if self.local_pts_overflows == 1:
                import warnings

                warnings.warn(
                    f"local point window ({n_window}) exceeds LOCAL_PTS="
                    f"{LOCAL_PTS}; overflow points are not tracked this "
                    "frame", RuntimeWarning)

    def _update_last_frame(self):
        """`Tracking::UpdateLastFrame` (Tracking.cc:921-947): recompute the
        last frame's pose from its reference keyframe's CURRENT pose and the
        stored relative transform.  After a loop correction or global BA
        moves the keyframes, the stale absolute pose would put the motion
        model an entire drift-correction away from the map — tracking died
        permanently on the first post-loop frame without this.

        Runs only when the System flags a big map change (`map_changed`,
        set on loop closure / global-BA slices): re-deriving the pose every
        frame through routine local-BA nudges mixes a raw-pose velocity
        with a BA-shifted base and biases the prediction (measured as 3×
        worse drift on the long-run fixture when applied per-frame)."""
        if not self.map_changed or self.last_frame is None:
            return
        rel = self.relative_trajectory
        if not rel:
            return
        ts, ref, t_rel, ok = rel[-1]
        if not ok or ts != self.last_frame.timestamp:
            return
        t_cw = lie.orthonormalize_se3(
            jnp.asarray(t_rel) @ self.state.kf_pose[ref])
        self.last_frame = self.last_frame._replace(t_cw=t_cw)
        self.map_changed = False
        # KEEP the velocity: T_curr←prev = T_cw(t)·T_cw(t−1)⁻¹ is a
        # camera-relative transform — re-expressing the last pose in the
        # corrected world does not invalidate it.  Resetting it to identity
        # (the round-3 behavior) zeroes the motion-model prediction on the
        # first post-closure frame; at ≳20 px/frame flow the doubled search
        # window cannot cover the miss and tracking is lost exactly when
        # the map just improved (measured on the extended long-run fixture:
        # frames 48-49 lost after every closure, with an aliased-texture
        # relocalization then poisoning the rest of the run).

    def _track_frame_fast(self, frame: Frame):
        """Fused motion-model + local-map tracking: one dispatch, one
        13-int stats fetch (see `_track_frame_fused`).  Returns
        (frame, ok, fused_done); fused_done=False means the motion-model
        stage failed and the host must run the fallback chain."""
        self._update_last_frame()
        lf = self.last_frame
        radius = 7.0 if self.cfg.sensor in ("stereo", "rgbd") else 15.0
        th_depth_m = self.cfg.cam.bf / max(self.cfg.cam.fx, 1e-9) \
            * self.cfg.tracking.th_depth
        t_cw, pt_idx, stats, vis, fnd = _track_frame_fused(
            self.cfg.cam, self.state, lf.t_cw, self.velocity,
            frame.feats.xy, frame.feats.desc, frame.feats.level,
            frame.feats.valid, frame.feats.angle, frame.ur, frame.depth,
            lf.pt_idx, lf.feats.angle, radius, th_depth_m,
            n_keep=self.cfg.map.local_window,
            stereo=self.cfg.sensor in ("stereo", "rgbd"))
        try:  # start the device→host copy before any host-side waiting
            stats.copy_to_host_async()
        except Exception:
            pass
        if self.pre_fetch_hook is not None:
            self.pre_fetch_hook()
        stats = np.asarray(stats)  # the single per-frame host sync
        # ref KF = top covisibility voter, stage-2's when it ran, else
        # stage-1's — the split-stage path updated it after EVERY stage,
        # and the reference-KF fallback depends on it pointing at the
        # voted (possibly loop-side) keyframe
        if stats[9] >= 0:
            self.ref_kf = int(stats[9])
        elif stats[2] >= 0:
            self.ref_kf = int(stats[2])
        self._warn_local_overflow(stats)
        if stats[14] == 0:  # motion-model stage failed → fallback chain
            self._stage_stats = stats[0:7]
            return frame, False, False
        self.state = self.state._replace(pt_visible=vis, pt_found=fnd)
        self._stage_stats = stats[7:14]
        n_tracked = int(stats[8])
        self.n_inliers_last = n_tracked
        ok = n_tracked >= self.cfg.tracking.min_tracked_for_ok
        return frame._replace(t_cw=t_cw, pt_idx=pt_idx), ok, True

    def _track_motion_model(self, frame: Frame):
        """Constant-velocity prediction + projective match against the
        covisible window of the LAST frame's tracked points (:949,
        `ORBmatcher::SearchByProjection(F, LastFrame)` :1328 — including
        its rotation-consistency histogram)."""
        if self.last_frame is None:
            return frame, False
        self._update_last_frame()
        t_pred = self.velocity @ self.last_frame.t_cw
        # search radius th=7 stereo / 15 mono (`Tracking.cc:957-963`) — a
        # wide window around an imperfect prediction admits consistent-WRONG
        # matches on repetitive texture, and the robust pose GN then owns a
        # local minimum away from the true pose (measured on the long-run
        # fixture: 15 px admitted a 50-match wrong-pose basin)
        radius = 7.0 if self.cfg.sensor in ("stereo", "rgbd") else 15.0
        new_frame, stats = self._run_stage(
            frame, self.last_frame.pt_idx, frame.pt_idx, t_pred,
            radius=radius, check_rotation=True, update_stats=False)
        if stats[0] < 20:   # n_matched — retry with a doubled window
            # (reference `Tracking.cc:966-976`: "If few matches, uses a
            # wider window search"); rescues fast motion / prediction error
            new_frame, stats = self._run_stage(
                frame, self.last_frame.pt_idx, frame.pt_idx, t_pred,
                radius=2.0 * radius, check_rotation=True, update_stats=False)
            if stats[0] < 20:
                return frame, False
        return new_frame, int(stats[1]) >= 10

    def _track_reference_kf(self, frame: Frame):
        """Descriptor match against the reference KF (:839)."""
        if self.ref_kf < 0:
            return frame, False
        k = self.ref_kf
        m = matcher.match(
            frame.feats.desc, frame.feats.valid, self.state.kf_desc[k],
            self.state.kf_feat_valid[k] & (self.state.kf_feat_pt[k] >= 0),
            max_dist=matcher.TH_LOW, ratio=0.7, mutual=True,
        )
        pt_idx = jnp.where(
            m.valid, self.state.kf_feat_pt[k][jnp.maximum(m.idx, 0)], -1
        )
        if int(jnp.sum(pt_idx >= 0)) < 15:
            return frame, False
        t_init = self.last_frame.t_cw if self.last_frame is not None \
            else self.state.kf_pose[k]
        frame, n = self._pose_from_matches(frame, pt_idx, pt_idx >= 0, t_init)
        return frame, n >= 10

    def _track_local_map(self, frame: Frame):
        """Re-match against the full local point set at the refined pose and
        optimize once more (:1012).  The local set is covisibility-retrieved
        from the frame's own matches (UpdateLocalKeyFrames role); motion-
        model matches are kept where the local-map match is empty; found/
        visible statistics update inside the same fused dispatch."""
        new_frame, stats = self._run_stage(
            frame, frame.pt_idx, frame.pt_idx, frame.t_cw,
            radius=4.0, check_rotation=False, update_stats=True)
        return new_frame, int(stats[1])

    def _relocalize(self, frame: Frame):
        """Relocalization: BoW candidates (when the System installed a
        database hook) or recent KFs, then per-candidate descriptor match +
        PnP RANSAC (reference `Tracking::Relocalization`, Tracking.cc:1445)."""
        if self.reloc_candidates_fn is not None:
            cands = list(self.reloc_candidates_fn(frame)) \
                or self._recent_kfs(5)
        else:
            cands = [k for k in self._recent_kfs(5)]
        for k in cands:
            m = matcher.match(
                frame.feats.desc, frame.feats.valid, self.state.kf_desc[k],
                self.state.kf_feat_valid[k] & (self.state.kf_feat_pt[k] >= 0),
                max_dist=matcher.TH_LOW, ratio=0.75, mutual=True,
            )
            pt_idx = jnp.where(
                m.valid, self.state.kf_feat_pt[k][jnp.maximum(m.idx, 0)], -1
            )
            if int(jnp.sum(pt_idx >= 0)) < 15:
                continue
            self._key, sub = jax.random.split(self._key)
            res = pnp.solve_pnp_ransac(
                self.cfg.cam, self.state.pt_pos[jnp.maximum(pt_idx, 0)],
                frame.feats.xy,
                1.0 / (1.2 ** (2.0 * frame.feats.level.astype(jnp.float32))),
                (pt_idx >= 0) & frame.feats.valid, sub,
            )
            if bool(res.ok):
                pt_final = jnp.where(res.inliers, pt_idx, -1)
                return frame._replace(t_cw=res.t_cw, pt_idx=pt_final), True
        return frame, False

    # ------------------------------------------------------------------
    def _need_new_keyframe(self, fid: int = None) -> bool:
        """`Tracking::NeedNewKeyFrame` parity (`src/Tracking.cc:1059-1142`):

        - close-point census (stereo/RGB-D): many near points with depth
          that are NOT yet tracked map points, while few tracked close
          points remain, forces a keyframe (`bNeedToInsertClose`,
          :1085-1100) — this is what keeps map density up when driving
          into unmapped space;
        - c1a: ≥ MaxFrames since the last KF;
        - c1b: ≥ MinFrames since the last KF and the mapping stage idle
          (no keyframe job in flight — the reference's bLocalMappingIdle);
        - c1c: non-mono and (weak tracking vs the reference KF, < 25 %, or
          close-point pressure);
        - c2: tracked inliers below thRefRatio of the reference KF's
          tracked count, or close-point pressure — and > 15 inliers.
        Insert iff (c1a | c1b | c1c) & c2.  `fid`: the frame the decision
        is for (the pipelined path finalizes one frame behind
        self.frame_id)."""
        since = (fid if fid is not None else self.frame_id) \
            - self.last_kf_frame_id
        n_kf = int(self._kf_valid_np().sum())

        # counts come from the last fused stage's stats vector — no extra
        # device fetches (mThDepth = bf/fx · ThDepth, `Tracking.cc:128-134`)
        stats = self._stage_stats
        ref_n = int(stats[5]) if stats is not None else 0

        need_close = False
        if self.cfg.sensor != "mono" and stats is not None:
            need_close = int(stats[4]) > self.cfg.tracking.close_free_th \
                and int(stats[3]) < self.cfg.tracking.close_tracked_th
            # async mapping: the previous keyframe's spawned close points
            # only become visible at adoption (async_kf_frames later), so
            # the census would re-fire on the SAME unclaimed points every
            # frame until then, inserting back-to-back duplicate keyframes
            # (measured: 20 vs 14 KFs on the bench sequence).  The
            # reference's Tracking gates this on LocalMapping idleness
            # (`NeedNewKeyFrame`'s bLocalMappingIdle, Tracking.cc:1077);
            # bounded staleness makes the gate a simple frame-count check.
            need_close = need_close and \
                since > max(self.cfg.async_kf_frames, 0)

        # thRefRatio: 0.75 stereo/RGB-D, 0.9 mono, 0.4 when the map is tiny
        # (`Tracking.cc:1103-1110`)
        th_ref = 0.9 if self.cfg.sensor == "mono" else 0.75
        if n_kf < 2:
            th_ref = 0.4

        c1a = since >= self.cfg.tracking.max_frames_between_kf
        idle = self.mapping_idle_fn() if self.mapping_idle_fn is not None \
            else True
        c1b = since >= self.cfg.tracking.min_frames_between_kf and idle
        c1c = self.cfg.sensor != "mono" and (
            self.n_inliers_last < ref_n * 0.25 or need_close
        )
        c2 = (self.n_inliers_last < ref_n * th_ref or need_close) \
            and self.n_inliers_last > 15
        # divergence from the reference: c1a (max interval) forces insertion
        # even under strong tracking.  The reference can defer KFs for long
        # stretches because its mapping thread may be busy and InterruptBA
        # covers the backlog; with synchronous mapping a bounded KF interval
        # bounds drift between BA windows at negligible cost.
        return ((c1a or c1b or c1c) and c2) \
            or (c1a and self.n_inliers_last > 15)

    def _local_kf_window(self, pt_idx=None) -> np.ndarray:
        """Local keyframes by shared observations (reference
        `Tracking::UpdateLocalKeyFrames`, `src/Tracking.cc:1309-1365`):
        every KF observing one of the frame's tracked map points votes;
        the top `local_window` voted KFs are kept, extended by the best
        covisible neighbors of the strongest voters, and the top voter
        becomes the reference KF.  After a loop closure this re-acquires
        loop-side keyframes that a recency window can never reach.

        Falls back to the most recent KFs when there are no matched
        points yet (bootstrap, post-reloc first frame)."""
        if pt_idx is not None:
            pt = np.asarray(pt_idx)
            pts = np.unique(pt[pt >= 0])
        else:
            pts = np.zeros(0, np.int64)
        if len(pts) == 0:
            return self._recent_window()
        P = self.state.pt_pos.shape[0]
        # numpy scatter: a jnp .at[].set here recompiles per distinct
        # tracked-point count (index-shape specialization)
        in_set_np = np.zeros(P, bool)
        in_set_np[pts] = True
        n_keep = self.cfg.map.local_window
        out = np.asarray(_local_window_device(
            self.state, jnp.asarray(in_set_np), n_keep))
        top, nbs, newest = out[:n_keep], out[n_keep:-1], int(out[-1])
        voters = top[top >= 0]
        if len(voters) == 0:
            return self._recent_window()
        # reference KF = the KF sharing the most observations (:1395-1398)
        self.ref_kf = int(voters[0])
        window = [int(k) for k in voters]
        # best covisible neighbor of the strongest voters (the neighbor
        # expansion of :1368-1392, capped at 3)
        for b in nbs:
            if b >= 0 and int(b) not in window:
                window.append(int(b))
        # always include the newest KF: brand-new points live there first
        if newest >= 0 and newest not in window:
            window.append(newest)
        return np.asarray(window, np.int64)

    def _kf_valid_np(self) -> np.ndarray:
        """Host copy of kf_valid, memoized by device-array identity (it only
        changes at keyframe-rate; re-fetching per frame is a roundtrip)."""
        kv = self.state.kf_valid
        if self._kv_memo is None or self._kv_memo[0] is not kv:
            self._kv_memo = (kv, np.asarray(kv))
        return self._kv_memo[1]

    def _recent_window(self) -> np.ndarray:
        valid = np.nonzero(self._kf_valid_np())[0]
        return valid[-self.cfg.map.local_window:] if len(valid) else \
            np.zeros(0, np.int64)

    def _recent_kfs(self, n: int):
        valid = np.nonzero(self._kf_valid_np())[0]
        return valid[-n:][::-1].tolist()
