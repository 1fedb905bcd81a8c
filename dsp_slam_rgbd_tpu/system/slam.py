"""System orchestrator: the single host loop that replaces the reference's
thread pipeline.

Covers `System` (`src/System.cc`): construction wires tracker + map +
local-mapping + loop-closing (+ object reconstruction via the DeepSDF
decoder), `TrackStereo`/`TrackRGBD`/`TrackMonocular` entry points, and the
Save* exporters.  The reference's 4-5 pthreads with queues and mutexes
(SURVEY.md §2.4) become explicit stages in one loop: tracking every frame;
mapping/BA/reconstruction on keyframes; loop detection per keyframe.  XLA
async dispatch overlaps device work where the threads used to.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from dsp_slam_rgbd_tpu.config import SystemConfig
from dsp_slam_rgbd_tpu.loop import keyframe_db, loop_closing, vocabulary
from dsp_slam_rgbd_tpu.mapping import covisibility as covis
from dsp_slam_rgbd_tpu.mapping import local_mapping as lm
from dsp_slam_rgbd_tpu.mapping import map_state as ms
from dsp_slam_rgbd_tpu.mapping import objects as obj_mod
from dsp_slam_rgbd_tpu.ops import lie
from dsp_slam_rgbd_tpu.system import io as io_mod
from dsp_slam_rgbd_tpu.tracking.tracker import Tracker


@partial(jax.jit, static_argnames=("max_cands",))
def _loop_candidates_device(state, db, kf_slot, recent_after_fid,
                            max_cands: int):
    """Loop-candidate retrieval + the candidates' covisible rows as ONE
    program (one fetch): returns a (2 + max_cands, max_cands + K) f32
    matrix packing [cand_idx pad | -], [- | scores], [- | rows...]."""
    K = state.kf_valid.shape[0]
    W = covis.covisibility_matrix(state)
    connected = (W[kf_slot] >= covis.MIN_WEIGHT).at[kf_slot].set(True)
    recent = state.kf_frame_id >= recent_after_fid
    cand, scores = keyframe_db.detect_loop_candidates(
        db, db.bow[kf_slot], connected | recent, W)
    # first max_cands candidate indices (-1 pad)
    vals, idx = jax.lax.top_k(cand.astype(jnp.int32), min(max_cands, K))
    cand_idx = jnp.where(vals > 0, idx, -1).astype(jnp.int32)
    rows = (W[jnp.maximum(cand_idx, 0)] >= covis.MIN_WEIGHT) \
        & (cand_idx >= 0)[:, None]
    out = jnp.zeros((2 + max_cands, max_cands + K))
    out = out.at[0, :max_cands].set(cand_idx.astype(jnp.float32))
    out = out.at[1, max_cands:].set(scores)
    out = out.at[2:, max_cands:].set(rows.astype(jnp.float32))
    return out


class SLAMSystem:
    def __init__(self, cfg: SystemConfig, decoder_params=None,
                 decoder_spec=None, vocab: vocabulary.Vocabulary = None):
        self.cfg = cfg
        self.state = ms.empty(
            max_kf=cfg.map.max_kf, max_feat=cfg.map.max_feat,
            max_pts=cfg.map.max_pts, max_obj=cfg.map.max_obj,
            code_len=cfg.recon.code_len, max_oobs=cfg.map.max_oobs,
        )
        self.tracker = Tracker(cfg, self.state)
        self.decoder_params = decoder_params
        self.decoder_spec = decoder_spec
        self.vocab = vocab
        self.db = keyframe_db.empty(cfg.map.max_kf, vocab.n_words) \
            if vocab is not None else None
        self.consistency = loop_closing.ConsistencyState()
        self.n_kf = 0
        self.loop_closures = 0
        # host mirror of kf_valid: keyframe slots are allocated and culled
        # under host control, so the mirror never goes stale — it saves one
        # blocking device fetch per keyframe (alloc) and per tracked frame
        # (the tracker's window fallback), each a full tunnel RTT
        self._kf_valid_host = np.zeros(cfg.map.max_kf, bool)
        # loop-closure cooldown (reference `mLastLoopKFid + 10` gate,
        # LoopClosing.cc:DetectLoop): no new loop until 10 keyframes after
        # the last — a second closure on a half-corrected map (the staged
        # GBA budget still draining) compounds a bad Sim3 and breaks the map
        self._last_loop_nkf = -100
        # staged global-BA budget: iterations still owed after a loop
        # closure, drained a slice at a time on subsequent keyframes
        self._gba_iters_left = 0
        self.gba_slice_iters = 2
        self.kf_slots_exhausted = 0  # dropped keyframes (capacity full)
        self._oobs_cursor = {}  # per-object ring cursors
        # multi-device: the unmatched-detection reconstruction batch shards
        # over an (obj,) mesh so the PRODUCT uses every chip (SURVEY §2.4)
        self._recon_mesh = None
        try:
            if len(jax.devices()) > 1:
                from dsp_slam_rgbd_tpu.parallel import mesh as pmesh

                self._recon_mesh = pmesh.make_mesh(
                    n_obj=len(jax.devices()), n_ray=1)
        except Exception:
            self._recon_mesh = None
        self._key = jax.random.PRNGKey(42)
        self.localization_only = False
        if self.db is not None:
            self.tracker.reloc_candidates_fn = self._reloc_candidates

    def _reloc_candidates(self, frame, top_k: int = 5):
        """BoW retrieval for relocalization (DetectRelocalizationCandidates
        role)."""
        import numpy as _np

        from dsp_slam_rgbd_tpu.mapping import covisibility as _covis

        w = vocabulary.quantize(self.vocab, frame.feats.desc,
                                frame.feats.valid)
        q = vocabulary.bow_vector(w, self.vocab.n_words)
        W = _covis.covisibility_matrix(self.state)
        keep, scores = keyframe_db.detect_reloc_candidates(self.db, q, W)
        s = _np.where(_np.asarray(keep), _np.asarray(scores), -1.0)
        order = _np.argsort(-s)[:top_k]
        return [int(k) for k in order if s[k] > 0]

    # ------------------------------------------------------------------
    def activate_localization_mode(self):
        """Track against the frozen map, insert no keyframes (reference
        `System::ActivateLocalizationMode`, `System.h:106`)."""
        self.localization_only = True

    def deactivate_localization_mode(self):
        self.localization_only = False

    def reset(self):
        """Full system reset (reference `System::Reset` / `Tracking::Reset`
        `Tracking.cc:1608`): clears map, database and tracker state."""
        cfg = self.cfg
        self.state = ms.empty(
            max_kf=cfg.map.max_kf, max_feat=cfg.map.max_feat,
            max_pts=cfg.map.max_pts, max_obj=cfg.map.max_obj,
            code_len=cfg.recon.code_len, max_oobs=cfg.map.max_oobs,
        )
        self.tracker = Tracker(cfg, self.state)
        if self.vocab is not None:
            self.db = keyframe_db.empty(cfg.map.max_kf, self.vocab.n_words)
        self.consistency = loop_closing.ConsistencyState()
        self.n_kf = 0
        self._gba_iters_left = 0
        self._oobs_cursor = {}  # per-object ring cursors
        self._kf_valid_host = np.zeros(cfg.map.max_kf, bool)

    def load_state(self, path: str):
        """Restore a MapState checkpoint (`utils/checkpoint.py`) INTO the
        running system: every external state assignment must rebuild the
        kf_valid host mirror, or the next keyframe insert allocates over a
        live slot (the mirror is the allocator's source of truth)."""
        from dsp_slam_rgbd_tpu.utils import checkpoint as ckpt

        state, extra = ckpt.load_state(path)
        self.state = state
        self.tracker.state = state
        self._kf_valid_host = np.asarray(state.kf_valid).copy()
        self.tracker._kv_memo = (state.kf_valid, self._kf_valid_host)
        self.n_kf = int(extra.get("n_kf", self._kf_valid_host.sum()))
        return extra

    # ------------------------------------------------------------------
    def track_stereo(self, img_left, img_right, timestamp=0.0,
                     detections=None):
        return self._track(img_left, img_right=img_right,
                           timestamp=timestamp, detections=detections)

    def track_rgbd(self, img, depth, timestamp=0.0, detections=None):
        return self._track(img, depth_map=depth, timestamp=timestamp,
                           detections=detections)

    def track_mono(self, img, timestamp=0.0, detections=None):
        return self._track(img, timestamp=timestamp, detections=detections)

    def track_frame(self, frame, detections=None):
        """Track a pre-built Frame (from `prefetch.FramePrefetcher`: upload
        + extraction dispatched one frame ahead on a worker thread)."""
        return self._track(None, timestamp=frame.timestamp,
                           detections=detections, frame=frame)

    # ------------------------------------------------------------------
    def _track(self, img, img_right=None, depth_map=None, timestamp=0.0,
               detections=None, frame=None):
        self.tracker.state = self.state
        out = self.tracker.track(img, img_right=img_right,
                                 depth_map=depth_map, timestamp=timestamp,
                                 frame=frame)
        # the tracker updates per-point found/visible statistics
        self.state = self.tracker.state
        if self.localization_only:
            return out
        if out["new_kf"]:
            first_kf = self.n_kf == 0
            if self.tracker.status == "OK" and first_kf \
                    and self.cfg.sensor == "mono" \
                    and hasattr(self.tracker, "init_result"):
                self._insert_mono_init()
            else:
                self._insert_keyframe(out["frame"], detections)
            self.tracker.state = self.state
            # the frame just became keyframe `ref_kf`: re-anchor its
            # relative-trajectory entry to ITSELF (T_rel = I), as the
            # reference does (CreateNewKeyFrame sets mpReferenceKF = pKF so
            # Tlr is identity).  Leaving the stale previous reference makes
            # Tracking::UpdateLastFrame re-derive the last pose through a
            # DIFFERENT keyframe than the map's canonical post-BA pose, and
            # the motion-model prediction inherits the mismatch every frame
            # (measured: ok 0.45 → 0.99 on the long-run fixture).
            rel = self.tracker.relative_trajectory
            if rel and rel[-1][0] == timestamp and self.tracker.ref_kf >= 0:
                rel[-1] = (timestamp, self.tracker.ref_kf,
                           jnp.eye(4), rel[-1][3])
            if first_kf and self.tracker.ref_kf >= 0 \
                    and not self.tracker.relative_trajectory:
                # backfill the init frame into the relative trajectory (its
                # reference KF did not exist yet at track time)
                frame = out["frame"]
                t_rel = np.asarray(
                    frame.t_cw
                    @ lie.inv_se3(self.state.kf_pose[self.tracker.ref_kf])
                )
                self.tracker.relative_trajectory.append(
                    (timestamp, self.tracker.ref_kf, t_rel, True)
                )
        return out

    # ------------------------------------------------------------------
    def _mark_kf(self, slot: int, valid: bool):
        """Keep the kf_valid host mirror + the tracker's memo in sync (all
        kf_valid mutations are host-driven: insert + cull)."""
        self._kf_valid_host[slot] = valid
        self.tracker._kv_memo = (self.state.kf_valid, self._kf_valid_host)

    def _insert_mono_init(self):
        """Create the two initial KFs + triangulated points (reference
        `CreateInitialMapMonocular`)."""
        r = self.tracker.init_result
        ref, cur, m = r["ref_frame"], r["cur_frame"], r["matches"]
        good = np.asarray(r["good"] & m.valid)
        k0 = int(ms.alloc_slots(self._kf_valid_host, 1)[0])
        self.state = lm.insert_keyframe(
            self.state, ref._replace(t_cw=jnp.eye(4)), k0, 0
        )
        self._mark_kf(k0, True)
        k1 = int(ms.alloc_slots(self._kf_valid_host, 1)[0])
        self.state = lm.insert_keyframe(
            self.state, cur._replace(t_cw=r["t21"]), k1, 1
        )
        self._mark_kf(k1, True)
        pts = np.asarray(r["pts"])
        chosen = np.nonzero(good)[0]
        slots = ms.alloc_slots(self.state.pt_valid, len(chosen))
        ok = slots >= 0
        chosen, slots = chosen[ok], slots[ok]
        sl = jnp.asarray(slots)
        ch = jnp.asarray(chosen)
        midx = np.asarray(m.idx)
        self.state = self.state._replace(
            pt_pos=self.state.pt_pos.at[sl].set(jnp.asarray(pts[chosen])),
            pt_valid=self.state.pt_valid.at[sl].set(True),
            pt_desc=self.state.pt_desc.at[sl].set(ref.feats.desc[ch]),
            pt_ref_kf=self.state.pt_ref_kf.at[sl].set(k0),
            pt_first_kf=self.state.pt_first_kf.at[sl].set(0),  # monotonic id
            kf_feat_pt=self.state.kf_feat_pt
            .at[k0, ch].set(sl.astype(jnp.int32))
            .at[k1, jnp.asarray(midx[chosen])].set(sl.astype(jnp.int32)),
        )
        self.tracker.ref_kf = k1
        self.tracker.last_kf_frame_id = self.tracker.frame_id
        self.n_kf = 2
        self._update_bow(k0)
        self._update_bow(k1)

    def _insert_keyframe(self, frame, detections):
        slot = ms.alloc_slots(self._kf_valid_host, 1)[0]
        if slot < 0:
            # keyframe capacity exhausted: observable, never silent — the
            # run continues in a degraded tracking-only mode for this frame
            # (size the map with MapConfig.kitti_large() for real sequences)
            self.kf_slots_exhausted += 1
            if self.kf_slots_exhausted == 1:
                import warnings

                warnings.warn(
                    "keyframe capacity exhausted "
                    f"(max_kf={self.cfg.map.max_kf}); dropping keyframes — "
                    "increase MapConfig.max_kf", RuntimeWarning)
            return
        slot = int(slot)
        # monotonic keyframe id (reference KeyFrame::mnId): slots are
        # recycled after culling, so point-culling age must come from an
        # ever-increasing counter, not the slot index
        kid = self.n_kf
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
            self.state, self.cfg.cam, slot, frame, self.tracker.frame_id,
            self.cfg.tracking.th_depth * self.cfg.cam.bf / self.cfg.cam.fx,
            kid, stereo,
            n_neighbors=10 if stereo else 20,
            min_obs_after=4 if stereo else 3)
        self._mark_kf(slot, True)

        recon_pending = None
        if detections:
            recon_pending = self._object_stage(slot, frame, detections,
                                               assoc_pending)

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
            ins_args = self._finish_new_objects(slot, recon_pending)
        fit, culled, redo = lm.ba_cull_read(pend_ba)
        if not fit:
            # rare bucket overflow: adopt the re-solved state and re-apply
            # the object insert on top of it
            self.state = redo
            if ins_args is not None:
                from dsp_slam_rgbd_tpu.system import object_stage as ostage

                self.state = ostage.insert_new_objects(self.state, *ins_args)
        for c in culled:
            self._mark_kf(c, False)
            self._on_keyframe_culled(c, fallback=slot)
        self.tracker.ref_kf = slot
        self.tracker.last_kf_frame_id = self.tracker.frame_id
        self.n_kf += 1
        self._update_bow(slot)
        self._drain_gba_budget()  # owed post-loop global-BA slice, if any
        self._loop_stage(slot)

    # ------------------------------------------------------------------
    def _object_stage(self, kf_slot: int, frame, detections,
                      assoc_pending=None):
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
                self.state, kf_slot, detections, assoc, kfseq=self.n_kf)
            self.state, obs = mono_objects.process_detected_objects(
                self.state, self.cfg.cam, self.cfg.recon,
                self.decoder_params, self.decoder_spec, kf_slot,
                self.n_kf, detections, assoc)
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

    def _finish_new_objects(self, kf_slot: int, pending):
        """Read the unmatched-reconstruction flags and scatter every
        accepted object into the map (one dispatch)."""
        from dsp_slam_rgbd_tpu.system import object_stage as ostage

        res, bb_min, bb_max, good, obj_valid_np, _U = \
            ostage.recon_unmatched_read(pending)
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
                    res.code, bb_min, bb_max, kf_slot, self.n_kf,
                    jnp.asarray(qs))
        self.state = ostage.insert_new_objects(self.state, *ins_args)
        return ins_args

    def _on_keyframe_culled(self, culled: int, fallback: int):
        """Purge a culled KF from the BoW database and re-anchor trajectory
        entries that referenced it (its slot may be reused later; the
        reference re-parents frames to the spanning tree on culling).

        The new anchor is the TEMPORALLY NEAREST surviving keyframe, not
        the keyframe that triggered the cull: the trigger is the newest KF,
        and anchoring an old frame to it means a later loop correction
        (which moves new and old keyframes differentially) drags the frame
        across the whole loop boundary."""
        if self.db is not None:
            self.db = self.db.remove(culled)
        kv = self._kf_valid_host
        fids = np.asarray(self.state.kf_frame_id)
        culled_fid = int(fids[culled])
        alive = np.nonzero(kv)[0]
        if len(alive):
            fallback = int(alive[np.argmin(np.abs(fids[alive] - culled_fid))])
        T_culled = np.asarray(self.state.kf_pose[culled])
        T_new = np.asarray(self.state.kf_pose[fallback])
        T_new_inv = np.asarray(lie.inv_se3(jnp.asarray(T_new)))
        rel = self.tracker.relative_trajectory
        for i, (ts, ref, t_rel, ok) in enumerate(rel):
            if ref == culled:
                rel[i] = (ts, fallback, t_rel @ T_culled @ T_new_inv, ok)
        if self.tracker.ref_kf == culled:
            self.tracker.ref_kf = fallback

    def _assign_point_membership(self, obj_slot: int):
        """Tag map points inside the object's decoded-shape bbox as members
        (the fork's `object_id`/`in_any_object`, MapPoint_util.cc:23-31 —
        feeds NBV uncertainty scoring and outlier handling).  Membership
        volume is the reconstructed shape's bbox with the reference's
        (1.2, 1.5, 1.2) per-axis margins (`MapObject.cc:301-303`), not a
        fixed cube."""
        st = self.state
        T_ow = lie.inv_se3(st.obj_pose[obj_slot])
        local = lie.transform_points(T_ow, st.pt_pos) / jnp.maximum(
            st.obj_scale[obj_slot], 1e-6
        )
        s = jnp.array([1.2, 1.5, 1.2])
        inside = jnp.all(
            (local >= s * st.obj_bbox_min[obj_slot])
            & (local <= s * st.obj_bbox_max[obj_slot]), axis=-1
        ) & st.pt_valid
        claim = inside & ((st.pt_object < 0) | (st.pt_object == obj_slot))
        release = (st.pt_object == obj_slot) & ~inside
        new_owner = jnp.where(claim, obj_slot, st.pt_object)
        new_owner = jnp.where(release, -1, new_owner)
        self.state = st._replace(pt_object=new_owner.astype(jnp.int32))

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

    def _loop_stage(self, kf_slot: int):
        """Loop detection + correction per keyframe (LoopClosing::Run)."""
        if self.db is None or self.n_kf < 6:
            return
        # cooldown after a closure (LoopClosing.cc mLastLoopKFid + 10): no
        # CORRECTION until 10 keyframes pass — but detection + consistency
        # accounting keep running, so the 3-consecutive-KF consistency
        # chain is already built the moment the cooldown expires (with the
        # reference's full early-return, a revisit that straddles the
        # cooldown boundary needs 3 more keyframes before it can close —
        # on short revisits the run ends first)
        in_cooldown = self.n_kf < self._last_loop_nkf + 10
        # candidate retrieval + top-candidate covisible rows + scores in
        # ONE device program / ONE fetch (was: candidate fetch, then a
        # second fetch of the selected rows — two tunnel round trips per
        # keyframe in vocabulary runs)
        MAX_CANDS = 8
        out = np.asarray(_loop_candidates_device(
            self.state, self.db, kf_slot,
            jnp.int32(self.tracker.frame_id
                      - 2 * self.cfg.tracking.max_frames_between_kf),
            MAX_CANDS))
        K = self.state.kf_valid.shape[0]
        cand_idx = out[0, :MAX_CANDS].astype(np.int64)
        scores = out[1, MAX_CANDS:MAX_CANDS + K]
        rows = out[2:2 + MAX_CANDS, MAX_CANDS:MAX_CANDS + K] > 0.5
        cidx = cand_idx[cand_idx >= 0]
        if len(cidx) == 0:
            self.consistency.update([])
            return
        groups = [
            set(np.nonzero(rows[i])[0].tolist()) | {int(cidx[i])}
            for i in range(len(cidx))
        ]
        consistent = self.consistency.update(
            groups, candidates=[int(c) for c in cidx])
        if not consistent or in_cooldown:
            return
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
            return
        self.state = loop_closing.correct_loop(
            self.state, self.cfg.cam, kf_slot, best, res.t_21,
            fix_scale=fix_scale,
        )
        # fuse duplicated landmarks between the two sides of the loop
        W = covis.covisibility_matrix(self.state)
        group_q = (W[kf_slot] >= covis.MIN_WEIGHT).at[kf_slot].set(True)
        group_c = (W[best] >= covis.MIN_WEIGHT).at[best].set(True)
        self.state, pt_remap = loop_closing.fuse_duplicate_points(
            self.state, group_q & self.state.kf_valid,
            group_c & self.state.kf_valid,
        )
        # redirect the tracker's live frame associations through the fusion
        # remap (the reference's MapPoint::Replace pointer redirection):
        # stale slots otherwise vote/match dead landmarks on the very next
        # frame and tracking collapses right after the closure
        lf = self.tracker.last_frame
        if lf is not None:
            pi = lf.pt_idx
            self.tracker.last_frame = lf._replace(pt_idx=jnp.where(
                pi >= 0, pt_remap[jnp.maximum(pi, 0)].astype(pi.dtype), pi))
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
        self._last_loop_nkf = self.n_kf
        self.tracker.map_changed = True  # motion model must re-anchor

    def _drain_gba_budget(self):
        """Run one bounded slice of the owed post-loop global BA."""
        if self._gba_iters_left <= 0:
            return
        it = min(self.gba_slice_iters, self._gba_iters_left)
        self.state = lm.global_ba_step(self.state, self.cfg.cam, n_iters=it)
        self._gba_iters_left -= it
        self.tracker.map_changed = True  # poses moved under the tracker

    # ------------------------------------------------------------------
    def _frame_poses(self):
        """Per-frame poses composed from CURRENT keyframe poses via the
        stored relative transforms — BA and loop-closure corrections
        propagate into saved trajectories (reference
        `System::SaveTrajectoryTUM/KITTI`, System.cc:380-525)."""
        rel = self.tracker.relative_trajectory
        if rel:
            kf_poses = np.asarray(self.state.kf_pose)
            ts = np.asarray([t for t, _, _, _ in rel])
            # one bulk fetch: entries are device arrays (the tracker defers
            # per-frame host syncs)
            rels = np.asarray(jnp.stack(
                [jnp.asarray(t_rel) for _, _, t_rel, _ in rel]))
            refs = np.asarray([ref for _, ref, _, _ in rel])
            poses = np.einsum("nij,njk->nik", rels, kf_poses[refs])
            ok = np.asarray([o for _, _, _, o in rel], bool)
            return ts, poses, ok
        traj = self.tracker.trajectory
        if not traj:
            return np.zeros(0), np.zeros((0, 4, 4)), np.zeros(0, bool)
        ts = np.asarray([t for t, _, _ in traj])
        poses = np.asarray(jnp.stack([jnp.asarray(p) for _, p, _ in traj]))
        ok = np.asarray([o for _, _, o in traj], bool)
        return ts, poses, ok

    def save_trajectory_kitti(self, path: str):
        _, poses, ok = self._frame_poses()
        io_mod.save_trajectory_kitti(path, poses, ok)

    def save_trajectory_tum(self, path: str):
        ts, poses, ok = self._frame_poses()
        io_mod.save_trajectory_tum(path, poses, ts, ok)

    def save_entire_map(self, dirname: str):
        io_mod.save_entire_map(dirname, self.state)

    def shutdown(self):
        pass  # no threads to join — single host loop
