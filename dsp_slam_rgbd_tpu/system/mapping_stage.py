"""Keyframe mapping stage: the reference's LocalMapping + LoopClosing
threads as a serially-processed job pipeline.

The reference runs mapping/objects/BA in the `LocalMapping` thread while
`Tracking` processes the next frames (`src/System.cc:120-143`,
`src/LocalMapping.cc:55-164`); the loop thread consumes its queue after
that (`src/LoopClosing.cc:60`).  Here the whole keyframe stage — fused
point stage, batched object stage, local BA + keyframe culling, BoW
update, global-BA drain, loop detection/correction — is one `process()`
call on a `MappingStage` that owns the *mapping lineage* of the map state.

Concurrency model (replaces the reference's mutex-guarded shared map):

- Jobs are STRICTLY SERIAL: each `process()` starts from the previous
  job's output state, so the state lineage is linear and lock-free.
- In async mode (`SLAMSystem`, `system/slam.py`), `process()` runs on a
  single worker thread while the tracker keeps tracking against a
  bounded-stale snapshot — exactly the Tracking-vs-LocalMapping race of
  the reference, made explicit and deterministic (adoption happens a fixed
  number of frames after enqueue, not "whenever the thread finishes").
- Everything the main thread must apply to ITS structures (trajectory
  re-anchoring for culled keyframes, live-frame association remaps after
  loop fusion, found/visible counter merges) is returned in `KFResult`
  and applied at adoption time by the SLAMSystem — the worker never
  touches tracker-owned structures.

Shared mutable host state and its disciplines:
- `kf_valid_host` (the keyframe slot allocator mirror): the main thread
  sets slots True at enqueue (it owns allocation); this stage sets slots
  False on cull.  Both under the GIL; races are conservative only (an
  allocator that misses a just-freed slot allocates elsewhere).
- `db` (BoW database): replaced functionally by this stage; the main
  thread's relocalization hook reads the reference atomically.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from dsp_slam_rgbd_tpu.config import SystemConfig
from dsp_slam_rgbd_tpu.loop import keyframe_db, loop_closing, vocabulary
from dsp_slam_rgbd_tpu.mapping import covisibility as covis
from dsp_slam_rgbd_tpu.mapping import local_mapping as lm
from dsp_slam_rgbd_tpu.mapping import objects as obj_mod
from dsp_slam_rgbd_tpu.ops import lie


@partial(jax.jit, static_argnames=("max_cands",))
def _loop_candidates_device(state, db, kf_slot, recent_after_fid,
                            max_cands: int):
    """Loop-candidate retrieval + the candidates' covisible rows as ONE
    program (one fetch): returns a (2 + max_cands, max_cands + K) f32
    matrix packing [cand_idx pad | -], [- | scores], [- | rows...].

    Scale-safe: the query's connected set is ONE covisibility row and
    group scoring expands only the top-`max_cands` candidates' rows
    (`detect_loop_candidates_grouped`) — no (K, K) matrix, no (K, P)
    membership build, so the program stays feasible at
    `MapConfig.kitti_large` capacities (2048 KF × 300k pts)."""
    K = state.kf_valid.shape[0]
    row_q = covis.covisibility_row(state, kf_slot)
    connected = (row_q >= covis.MIN_WEIGHT).at[kf_slot].set(True)
    recent = state.kf_frame_id >= recent_after_fid
    cand_idx, scores, rows_w = keyframe_db.detect_loop_candidates_grouped(
        db, db.bow[kf_slot], connected | recent, state,
        top_l=min(max_cands, K))
    rows = (rows_w >= covis.MIN_WEIGHT) & (cand_idx >= 0)[:, None]
    out = jnp.zeros((2 + max_cands, max_cands + K))
    out = out.at[0, :max_cands].set(cand_idx.astype(jnp.float32))
    out = out.at[1, max_cands:].set(scores)
    out = out.at[2:, max_cands:].set(rows.astype(jnp.float32))
    return out


@jax.jit
def _sanitize_assoc(pt_idx, base_valid, base_first, view_first):
    """Drop frame→point associations whose point slot was culled or
    recycled by mapping jobs the tracker has not adopted yet: the frame was
    tracked against an older snapshot, so a slot index may now name a
    DIFFERENT landmark in the mapping lineage (the reference avoids this
    via MapPoint pointer identity + isBad; static-shape slots need the
    explicit tenant check)."""
    pi = jnp.maximum(pt_idx, 0)
    same_tenant = base_valid[pi] & (base_first[pi] == view_first[pi])
    return jnp.where((pt_idx >= 0) & same_tenant, pt_idx, -1)


@dataclass
class KFJob:
    """One keyframe's mapping work, captured at enqueue time."""
    frame: object                 # tracking.tracker.Frame (device arrays)
    detections: Optional[list]
    kf_slot: int                  # pre-allocated by the main thread
    kid: int                      # monotonic keyframe id (n_kf at enqueue)
    frame_id: int
    timestamp: float
    # the tracker's view at enqueue (for association sanitization)
    view_pt_first: object = None


@dataclass
class KFResult:
    """Everything the SLAMSystem applies at adoption time."""
    state: object                 # post-job mapping lineage head
    kf_slot: int
    kid: int
    timestamp: float
    # state the job STARTED from — the delta base for merging the
    # tracker's found/visible counters accrued while the job ran
    base_pt_visible: object = None
    base_pt_found: object = None
    base_pt_first: object = None
    # (culled_slot, fallback_slot, T_culled @ inv(T_fallback) (4,4) jnp)
    culled: list = field(default_factory=list)
    pt_remap: object = None       # loop-fusion remap (P,) or None
    kf_valid_host: object = None  # mirror copy at job end
    map_changed: bool = False
    loop_closed: bool = False


class MappingStage:
    """Owns the mapping lineage + all keyframe-rate pipeline state."""

    def __init__(self, cfg: SystemConfig, state, kf_valid_host,
                 decoder_params=None, decoder_spec=None,
                 vocab: vocabulary.Vocabulary = None, recon_mesh=None):
        self.cfg = cfg
        self.state = state
        self.kf_valid_host = kf_valid_host  # shared with SLAMSystem
        self.decoder_params = decoder_params
        self.decoder_spec = decoder_spec
        self.vocab = vocab
        self.db = keyframe_db.empty(cfg.map.max_kf, vocab.n_words) \
            if vocab is not None else None
        self.consistency = loop_closing.ConsistencyState()
        # loop-closure cooldown (reference `mLastLoopKFid + 10` gate,
        # LoopClosing.cc:DetectLoop): no new loop until 10 keyframes after
        # the last — a second closure on a half-corrected map (the staged
        # GBA budget still draining) compounds a bad Sim3 and breaks the map
        self._last_loop_kid = -100
        # staged global-BA budget: iterations still owed after a loop
        # closure, drained a slice at a time on subsequent keyframes
        self._gba_iters_left = 0
        self.gba_slice_iters = 2
        self.loop_closures = 0
        self._oobs_cursor = {}  # per-object ring cursors
        self._recon_mesh = recon_mesh
        self._key = jax.random.PRNGKey(43)

    # ------------------------------------------------------------------
    def process(self, job: KFJob) -> KFResult:
        """Run the whole keyframe stage for one job (strictly serial)."""
        res = KFResult(
            state=self.state, kf_slot=job.kf_slot, kid=job.kid,
            timestamp=job.timestamp,
            base_pt_visible=self.state.pt_visible,
            base_pt_found=self.state.pt_found,
            base_pt_first=self.state.pt_first_kf,
        )
        frame = job.frame
        if job.view_pt_first is not None \
                and job.view_pt_first is not self.state.pt_first_kf:
            frame = frame._replace(pt_idx=_sanitize_assoc(
                frame.pt_idx, self.state.pt_valid, self.state.pt_first_kf,
                job.view_pt_first))
        detections = job.detections

        slot, kid = job.kf_slot, job.kid
        # EARLY dispatch of object association (it reads only object fields
        # + the frame pose, passed directly): its result fetch inside
        # _object_stage then overlaps the fused point stage below instead
        # of paying its own tunnel round trip
        assoc_pending = None
        if detections and self.decoder_params is not None:
            from dsp_slam_rgbd_tpu.system import object_stage as ostage
            from dsp_slam_rgbd_tpu.system.detections import (MaskLabel,
                                                             MonoDetection)

            if not isinstance(detections[0], (MaskLabel, MonoDetection)):
                assoc_pending = ostage.associate_dispatch(
                    self.state, detections, frame.t_cw)
        # insert + spawn + triangulate + fuse + cull + geometry as ONE
        # device program (six separate dispatches paid ~5 ms of program
        # overhead each on a v5e — profiled)
        stereo = self.cfg.sensor in ("stereo", "rgbd")
        self.state = lm.kf_point_stage(
            self.state, self.cfg.cam, slot, frame, job.frame_id,
            self.cfg.tracking.th_depth * self.cfg.cam.bf / self.cfg.cam.fx,
            kid, stereo,
            n_neighbors=10 if stereo else 20,
            min_obs_after=4 if stereo else 3)

        recon_pending = None
        if detections:
            recon_pending = self._object_stage(slot, frame, detections,
                                               assoc_pending, kid)

        # combined BA + keyframe-cull: ONE program, ONE tail fetch.  The
        # reconstruction-flags fetch happens after the dispatch, so its
        # round trip overlaps the solve; new objects insert on the
        # optimistic post-BA state (their first pose edge joins the next
        # keyframe's BA window, like the reference's asynchronous
        # LocalMapping object stage).
        pend_ba = lm.ba_cull_dispatch(self.state, self.cfg.cam, slot,
                                      self.cfg.map.local_window)
        self.state = pend_ba["state"]
        ins_args = None
        if recon_pending is not None:
            # BUNDLED tail fetch: [recon flags | BA tail vec] in ONE round
            # trip — two sequential fetches each waited the device FIFO +
            # tunnel RTT, and at dense keyframe cadence the worker's wall
            # time exceeded the job arrival rate (adoption then blocked
            # the frame loop ~58 ms/frame, profiled)
            flags_dev = recon_pending[3]
            Ucap = recon_pending[4]
            O = self.state.obj_valid.shape[0]
            both = np.asarray(jnp.concatenate([
                flags_dev.astype(jnp.float32),
                pend_ba["vec"].astype(jnp.float32)]))
            flags = both[:Ucap + O].astype(np.int64)
            vec = both[Ucap + O:]
            ins_args = self._finish_new_objects(slot, recon_pending, kid,
                                                flags=flags)
            fit, culled, redo = lm.ba_cull_read(pend_ba, vec=vec)
        else:
            fit, culled, redo = lm.ba_cull_read(pend_ba)
        if not fit:
            # rare bucket overflow: adopt the re-solved state and re-apply
            # the object insert on top of it
            self.state = redo
            if ins_args is not None:
                from dsp_slam_rgbd_tpu.system import object_stage as ostage

                self.state = ostage.insert_new_objects(self.state, *ins_args)
        res.map_changed = True  # local BA moved poses under the tracker
        for c in culled:
            self.kf_valid_host[c] = False
            res.culled.append(self._on_keyframe_culled(c))
        self._update_bow(slot)
        self._drain_gba_budget()  # owed post-loop global-BA slice, if any
        remap = self._loop_stage(slot, kid, job.frame_id)
        if remap is not None:
            res.pt_remap = remap
            res.loop_closed = True
        res.state = self.state
        res.kf_valid_host = self.kf_valid_host.copy()
        return res

    # ------------------------------------------------------------------
    def _on_keyframe_culled(self, culled: int):
        """Purge a culled KF from the BoW database and compute the
        trajectory re-anchor transform (applied by the SLAMSystem at
        adoption: trajectory lists are tracker-owned).

        The new anchor is the TEMPORALLY NEAREST surviving keyframe — the
        trigger KF is the newest, and anchoring an old frame to it means a
        later loop correction (which moves new and old keyframes
        differentially) drags the frame across the whole loop boundary."""
        if self.db is not None:
            self.db = self.db.remove(culled)
        kv = self.kf_valid_host
        fids = np.asarray(self.state.kf_frame_id)
        culled_fid = int(fids[culled])
        alive = np.nonzero(kv)[0]
        fallback = culled
        if len(alive):
            fallback = int(alive[np.argmin(np.abs(fids[alive] - culled_fid))])
        T_culled = self.state.kf_pose[culled]
        T_new_inv = lie.inv_se3(self.state.kf_pose[fallback])
        return (culled, fallback, T_culled @ T_new_inv)

    # ------------------------------------------------------------------
    def _object_stage(self, kf_slot: int, frame, detections,
                      assoc_pending, kid: int):
        """Associate detections, fit/update objects, record observations
        (`LocalMapping_util.cc` object stage).  Returns a pending
        unmatched-reconstruction handle for `_finish_new_objects` (stereo
        path), or None."""
        if self.decoder_params is None:
            return None
        from dsp_slam_rgbd_tpu.system import mono_objects
        from dsp_slam_rgbd_tpu.system.detections import (
            MaskLabel, MonoDetection, mono_detection_from_mask)

        if isinstance(detections[0], MaskLabel):
            # raw disk masks → MonoDetections with the CURRENT frame's
            # keypoints (the reference assembles these in the tracker,
            # `Tracking_util.cc:163-208`; masks come from the mono
            # sequence's label files, `mono_sequence.py:95-107`)
            cam = self.cfg.cam
            invK = np.linalg.inv(np.asarray(
                [[cam.fx, 0.0, cam.cx], [0.0, cam.fy, cam.cy],
                 [0.0, 0.0, 1.0]], np.float32))
            xy = np.asarray(frame.feats.xy).copy()
            xy[~np.asarray(frame.feats.valid)] = -1e6  # never inside a mask
            detections = [
                mono_detection_from_mask(d.mask, invK, feats_xy=xy)
                for d in detections
            ]

        if isinstance(detections[0], MonoDetection):
            # mono path: mask-only detections, pose recovered from owned
            # map points (Tracking_util.cc:210-288 + LocalMapping_util.cc
            # :213-445)
            self.state, assoc = mono_objects.associate_by_projection(
                self.state, kf_slot, detections)
            self.state, assoc = mono_objects.create_new_objects(
                self.state, kf_slot, detections, assoc, kfseq=kid)
            self.state, obs = mono_objects.process_detected_objects(
                self.state, self.cfg.cam, self.cfg.recon,
                self.decoder_params, self.decoder_spec, kf_slot,
                kid, detections, assoc)
            for o, t_co in obs:
                self._add_object_obs(o, kf_slot, t_co)
            return
        # ---- batched stereo object stage (system/object_stage.py): three
        # device programs for the WHOLE keyframe regardless of detection
        # count, replacing the reference's per-detection serialized calls
        # (`LocalMapping_util.cc:86,158`) ----
        from dsp_slam_rgbd_tpu.system import object_stage as ostage

        if assoc_pending is not None:
            assoc, unmatched_idx = ostage.associate_read(
                assoc_pending, self.state.obj_valid.shape[0])
        else:
            assoc, unmatched_idx = ostage.associate_batch(
                self.state, detections, kf_slot)
        a_rows = np.nonzero(assoc >= 0)[0]
        if len(a_rows):
            Acap = ostage.bucket(len(a_rows))
            obj_idx = np.full(Acap, -1, np.int64)
            obj_idx[: len(a_rows)] = a_rows
            a_valid = np.zeros(Acap, bool)
            a_valid[: len(a_rows)] = True
            S = detections[0].pts.shape[0]
            det_t = np.tile(np.eye(4, dtype=np.float32), (Acap, 1, 1))
            det_pts = np.zeros((Acap, S, 3), np.float32)
            det_mask = np.zeros((Acap, S), bool)
            for j, o in enumerate(a_rows):
                d = detections[int(assoc[o])]
                det_t[j], det_pts[j], det_mask[j] = d.t_co, d.pts, d.pts_mask
            qs = self._oobs_slots(obj_idx, a_valid)
            self.state = ostage.refine_associated(
                self.decoder_params, self.decoder_spec, self.cfg.recon,
                self.state, jnp.asarray(obj_idx), jnp.asarray(a_valid),
                jnp.asarray(det_t), jnp.asarray(det_pts),
                jnp.asarray(det_mask), kf_slot, jnp.asarray(qs))

        pending = None
        if unmatched_idx:
            min_cap = self._recon_mesh.devices.shape[0] \
                if self._recon_mesh is not None else 1
            pending = ostage.recon_unmatched(
                self.decoder_params, self.decoder_spec, self.cfg.recon,
                self.state, detections, unmatched_idx,
                mesh=self._recon_mesh, min_cap=min_cap)

        keep = obj_mod.cull_objects(
            self.state.obj_valid, self.state.obj_n_obs,
            self.state.obj_last_kf, kf_slot,
        )
        # drop the pose edges of culled objects so their ring-buffer region
        # is clean for the next tenant and BA never sees stale constraints
        oobs_live = self.state.oobs_valid & keep[
            jnp.maximum(self.state.oobs_obj, 0)
        ] & (self.state.oobs_obj >= 0)
        self.state = self.state._replace(obj_valid=keep,
                                         oobs_valid=oobs_live)
        return pending

    def _finish_new_objects(self, kf_slot: int, pending, kid: int,
                            flags=None):
        """Read the unmatched-reconstruction flags and scatter every
        accepted object into the map (one dispatch).  `flags`: optional
        pre-fetched flags vector (bundled tail fetch)."""
        from dsp_slam_rgbd_tpu.system import object_stage as ostage

        res, bb_min, bb_max, good, obj_valid_np, _U = \
            ostage.recon_unmatched_read(pending, flags=flags)
        Ucap = len(good)
        slots = np.full(Ucap, -1, np.int64)
        free = np.nonzero(~obj_valid_np)[0]
        gi = np.nonzero(good)[0]
        take = min(len(gi), len(free))
        slots[gi[:take]] = free[:take]
        ok = good & (slots >= 0)
        if not ok.any():
            return None
        qs = self._oobs_slots(slots, ok)
        ins_args = (jnp.asarray(slots), jnp.asarray(ok), res.t_cam_obj,
                    res.code, bb_min, bb_max, kf_slot, kid,
                    jnp.asarray(qs))
        self.state = ostage.insert_new_objects(self.state, *ins_args)
        return ins_args

    # ------------------------------------------------------------------
    def _oobs_slots(self, obj_slots, valid) -> np.ndarray:
        """Pre-allocate observation-ring slots for a batch of objects (same
        per-object partitioned ring as `_add_object_obs`; cursors advance
        only for valid rows).  Returns (len(obj_slots),) int64, −1 pad."""
        Q = self.state.oobs_kf.shape[0]
        O = self.state.obj_pose.shape[0]
        S = max(Q // O, 1)
        qs = np.full(len(obj_slots), -1, np.int64)
        for i, o in enumerate(np.asarray(obj_slots)):
            o = int(o)
            if o < 0 or not valid[i]:
                continue
            c = self._oobs_cursor.get(o, 0)
            qs[i] = (o * S + c % S) % Q
            self._oobs_cursor[o] = c + 1
        return qs

    @property
    def oobs_overwrites(self) -> int:
        """Pose edges overwritten by their object's ring wrapping (each one
        is a camera-object constraint the global joint BA no longer sees —
        observable, by the no-silent-caps rule; size max_oobs up if this
        grows on a run)."""
        Q = self.state.oobs_kf.shape[0]
        S = max(Q // self.state.obj_pose.shape[0], 1)
        return sum(max(0, c - S) for c in self._oobs_cursor.values())

    def _add_object_obs(self, obj_slot: int, kf_slot: int, t_co):
        """Record a camera-object pose edge.  The buffer is partitioned into
        per-object rings (Q // O slots each) so one busy object can never
        evict another object's edges — a global ring silently forgets the
        oldest constraints of every object during a long run and the
        post-loop global joint BA loses them."""
        Q = self.state.oobs_kf.shape[0]
        O = self.state.obj_pose.shape[0]
        S = max(Q // O, 1)
        c = self._oobs_cursor.get(obj_slot, 0)
        q = (obj_slot * S + c % S) % Q
        self._oobs_cursor[obj_slot] = c + 1
        self.state = self.state._replace(
            oobs_kf=self.state.oobs_kf.at[q].set(kf_slot),
            oobs_obj=self.state.oobs_obj.at[q].set(obj_slot),
            oobs_t_co=self.state.oobs_t_co.at[q].set(jnp.asarray(t_co)),
            oobs_valid=self.state.oobs_valid.at[q].set(True),
        )

    # ------------------------------------------------------------------
    def _update_bow(self, kf_slot: int):
        if self.vocab is None:
            return
        w = vocabulary.quantize(
            self.vocab, self.state.kf_desc[kf_slot],
            self.state.kf_feat_valid[kf_slot],
        )
        v = vocabulary.bow_vector(w, self.vocab.n_words)
        self.db = self.db.add(kf_slot, v)

    def _loop_stage(self, kf_slot: int, kid: int, frame_id: int):
        """Loop detection + correction per keyframe (LoopClosing::Run).
        Returns the point-fusion remap (P,) when a loop closed, else None.
        `kid` is this keyframe's monotonic id; `kid + 1` keyframes exist
        after it."""
        if self.db is None or kid + 1 < 6:
            return None
        # cooldown after a closure (LoopClosing.cc mLastLoopKFid + 10): no
        # CORRECTION until 10 keyframes pass — but detection + consistency
        # accounting keep running, so the 3-consecutive-KF consistency
        # chain is already built the moment the cooldown expires (with the
        # reference's full early-return, a revisit that straddles the
        # cooldown boundary needs 3 more keyframes before it can close —
        # on short revisits the run ends first)
        in_cooldown = kid < self._last_loop_kid + 10
        # candidate retrieval + top-candidate covisible rows + scores in
        # ONE device program / ONE fetch (was: candidate fetch, then a
        # second fetch of the selected rows — two tunnel round trips per
        # keyframe in vocabulary runs)
        MAX_CANDS = 8
        out = np.asarray(_loop_candidates_device(
            self.state, self.db, kf_slot,
            jnp.int32(frame_id
                      - 2 * self.cfg.tracking.max_frames_between_kf),
            MAX_CANDS))
        K = self.state.kf_valid.shape[0]
        cand_idx = out[0, :MAX_CANDS].astype(np.int64)
        scores = out[1, MAX_CANDS:MAX_CANDS + K]
        rows = out[2:2 + MAX_CANDS, MAX_CANDS:MAX_CANDS + K] > 0.5
        # −1 holes can sit mid-array (the 0.75·best-acc gate rejects by
        # position): keep candidate↔row alignment by position, not by
        # compacted order
        pos = np.nonzero(cand_idx >= 0)[0]
        cidx = cand_idx[pos]
        if len(cidx) == 0:
            self.consistency.update([])
            return None
        groups = [
            set(np.nonzero(rows[p])[0].tolist()) | {int(cand_idx[p])}
            for p in pos
        ]
        consistent = self.consistency.update(
            groups, candidates=[int(c) for c in cidx])
        if not consistent or in_cooldown:
            return None
        # try EVERY enough-consistent candidate in descending BoW score
        # (the reference iterates all of mvpEnoughConsistentCandidates,
        # `LoopClosing::ComputeSim3`, LoopClosing.cc:241-270 — stopping at
        # the single best-scored one misses loops whose best-scored
        # candidate is a marginal view)
        cands_sorted = sorted(set(consistent),
                              key=lambda k: -float(scores[k]))
        fix_scale = self.cfg.sensor != "mono"
        res, best = None, -1
        for c in cands_sorted[:5]:
            self._key, sub = jax.random.split(self._key)
            r = loop_closing.compute_loop_sim3(
                self.state, self.cfg.cam, kf_slot, c, sub,
                fix_scale=fix_scale,
            )
            if bool(r.ok):
                res, best = r, c
                break
        if res is None:
            return None
        self.state = loop_closing.correct_loop(
            self.state, self.cfg.cam, kf_slot, best, res.t_21,
            fix_scale=fix_scale,
        )
        # fuse duplicated landmarks between the two sides of the loop
        # (two covisibility rows — never the (K, K) matrix)
        rows_qc = covis.covisibility_rows(
            self.state, jnp.asarray([kf_slot, best]))
        group_q = (rows_qc[0] >= covis.MIN_WEIGHT).at[kf_slot].set(True)
        group_c = (rows_qc[1] >= covis.MIN_WEIGHT).at[best].set(True)
        self.state, pt_remap = loop_closing.fuse_duplicate_points(
            self.state, group_q & self.state.kf_valid,
            group_c & self.state.kf_valid,
        )
        self.state = loop_closing.fuse_duplicate_objects(self.state)
        # global joint BA after the essential graph — STAGED: the reference
        # runs GlobalJointBundleAdjustment in an abortable thread
        # (`LoopClosing_util.cc:213,307-308`) so the frame loop never stalls;
        # here the 10-iteration budget is drained `gba_slice_iters` at a
        # time — one slice now, the rest on subsequent keyframes
        # (`_drain_gba_budget`).  Each slice re-linearizes from the current
        # state, so interleaved mapping work folds in (and a slice is the
        # natural abort granularity).  Dense Schur for small maps,
        # matrix-free PCG past ~100 pose blocks.
        self._gba_iters_left = 10
        self._drain_gba_budget()
        self.loop_closures += 1
        self._last_loop_kid = kid
        return pt_remap

    def _drain_gba_budget(self):
        """Run one bounded slice of the owed post-loop global BA."""
        if self._gba_iters_left <= 0:
            return
        it = min(self.gba_slice_iters, self._gba_iters_left)
        self.state = lm.global_ba_step(self.state, self.cfg.cam, n_iters=it)
        self._gba_iters_left -= it
