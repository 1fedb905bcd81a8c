"""System orchestrator: the host loop that replaces the reference's
thread pipeline.

Covers `System` (`src/System.cc`): construction wires tracker + map +
local-mapping + loop-closing (+ object reconstruction via the DeepSDF
decoder), `TrackStereo`/`TrackRGBD`/`TrackMonocular` entry points, and the
Save* exporters.

The reference's 4-5 pthreads with queues and mutexes (SURVEY.md §2.4)
become TWO host threads with a functional state handoff:

- the MAIN thread tracks every frame and, when a frame becomes a
  keyframe, allocates its slot and enqueues a `KFJob`;
- a single MAPPING worker thread (the reference's LocalMapping +
  LoopClosing threads, `src/System.cc:120-143`) drains the job queue
  serially through `MappingStage.process` — fused point stage, object
  stage, local BA + culling, BoW, loop closing — while the tracker keeps
  tracking against a bounded-stale snapshot of the map.

Adoption is DETERMINISTIC: job results are applied to the tracker's view
exactly `async_kf_frames` frames after enqueue (blocking if the worker has
not finished), so runs are reproducible regardless of machine speed —
unlike the reference, whose Tracking-vs-LocalMapping interleaving varies
run to run.  `async_kf_frames=0` degenerates to the fully synchronous
pipeline (same code path: enqueue → run inline → adopt).
"""
from __future__ import annotations

import queue
import threading
from collections import deque

import numpy as np
import jax
import jax.numpy as jnp

from dsp_slam_rgbd_tpu.config import SystemConfig
from dsp_slam_rgbd_tpu.loop import vocabulary
from dsp_slam_rgbd_tpu.mapping import covisibility as covis
from dsp_slam_rgbd_tpu.mapping import local_mapping as lm
from dsp_slam_rgbd_tpu.mapping import map_state as ms
from dsp_slam_rgbd_tpu.loop import keyframe_db
from dsp_slam_rgbd_tpu.ops import lie
from dsp_slam_rgbd_tpu.system import io as io_mod
from dsp_slam_rgbd_tpu.system.mapping_stage import KFJob, MappingStage
from dsp_slam_rgbd_tpu.tracking.tracker import Tracker


@jax.jit
def _adopt_merge(state, base_vis, base_fnd, base_first, view_vis, view_fnd,
                 view_first, lf_pt_idx, pt_remap):
    """Merge the tracker's contributions into an adopted mapping state in
    ONE device program:

    - found/visible counter deltas the tracker accrued while the job ran,
      guarded against slots the job culled+recycled (a delta for the old
      tenant must not pollute the new landmark's statistics);
    - the live frame's associations pushed through the loop-fusion remap
      (the reference's `MapPoint::Replace` pointer redirection) and
      invalidated where the slot's tenant changed or died.
    """
    same = (state.pt_first_kf == base_first)
    dv = jnp.where(same, view_vis - base_vis, 0)
    df = jnp.where(same, view_fnd - base_fnd, 0)
    new_state = state._replace(pt_visible=state.pt_visible + dv,
                               pt_found=state.pt_found + df)
    pi = jnp.where(lf_pt_idx >= 0,
                   pt_remap[jnp.maximum(lf_pt_idx, 0)].astype(
                       lf_pt_idx.dtype), lf_pt_idx)
    p = jnp.maximum(pi, 0)
    live = state.pt_valid[p] & (state.pt_first_kf[p] == view_first[p])
    pi = jnp.where((pi >= 0) & live, pi, -1)
    return new_state, pi


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
        self.n_kf = 0
        # host mirror of kf_valid: keyframe slots are ALLOCATED here (main
        # thread, at enqueue) and CULLED by the mapping stage (worker) —
        # both under the GIL; races are conservative only (the allocator
        # can miss a just-freed slot, never double-allocate)
        self._kf_valid_host = np.zeros(cfg.map.max_kf, bool)
        self.kf_slots_exhausted = 0  # dropped keyframes (capacity full)
        # multi-device: the unmatched-detection reconstruction batch shards
        # over an (obj,) mesh so the PRODUCT uses every chip (SURVEY §2.4)
        recon_mesh = None
        try:
            if len(jax.devices()) > 1:
                from dsp_slam_rgbd_tpu.parallel import mesh as pmesh

                recon_mesh = pmesh.make_mesh(
                    n_obj=len(jax.devices()), n_ray=1)
        except Exception:
            recon_mesh = None
        self.mapping = MappingStage(
            cfg, self.state, self._kf_valid_host,
            decoder_params=decoder_params, decoder_spec=decoder_spec,
            vocab=vocab, recon_mesh=recon_mesh)
        self.localization_only = False
        if self.mapping.db is not None:
            self.tracker.reloc_candidates_fn = self._reloc_candidates
        self.tracker.pre_fetch_hook = self._prewait_mapping
        self.tracker.mapping_idle_fn = lambda: not self._pending
        # ---- async mapping worker (the LocalMapping/LoopClosing threads) --
        self._pending = deque()   # in-flight jobs, enqueue order
        self._job_q = queue.Queue()
        self._worker = None       # started lazily on the first async job

    # -- mapping-stage views -------------------------------------------
    @property
    def db(self) -> keyframe_db.BowDatabase:
        """Live BoW database (worker-owned; atomic reference read)."""
        return self.mapping.db

    @property
    def consistency(self):
        return self.mapping.consistency

    @property
    def loop_closures(self) -> int:
        return self.mapping.loop_closures

    @property
    def gba_slice_iters(self) -> int:
        return self.mapping.gba_slice_iters

    @gba_slice_iters.setter
    def gba_slice_iters(self, v: int):
        self.mapping.gba_slice_iters = v

    # ------------------------------------------------------------------
    def _worker_loop(self):
        while True:
            item = self._job_q.get()
            if item is None:
                return
            job, holder, event = item
            try:
                holder["result"] = self.mapping.process(job)
            except BaseException as e:  # re-raised at adoption
                holder["exc"] = e
            finally:
                event.set()

    def _enqueue_kf(self, frame, detections, timestamp: float, fid=None):
        """Allocate the keyframe slot and hand the whole keyframe stage to
        the mapping worker (or run it inline in sync mode).  Returns False
        when keyframe capacity is exhausted.  `fid`: the keyframe frame's
        id (the pipelined tracker finalizes one frame behind)."""
        if fid is None:
            fid = self.tracker.frame_id
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
            return False
        slot = int(slot)
        self._kf_valid_host[slot] = True
        job = KFJob(frame=frame, detections=detections, kf_slot=slot,
                    kid=self.n_kf, frame_id=fid,
                    timestamp=timestamp,
                    view_pt_first=self.state.pt_first_kf)
        self.n_kf += 1
        self.tracker.last_kf_frame_id = fid
        # bootstrap keyframes run inline: the next frame cannot track
        # against a map that does not exist yet
        sync = self.cfg.async_kf_frames <= 0 or self.n_kf <= 2
        holder, event = {}, threading.Event()
        if sync:
            try:
                holder["result"] = self.mapping.process(job)
            except BaseException as e:
                holder["exc"] = e
            event.set()
            self._pending.append((job, holder, event, self.tracker.frame_id))
            self._adopt(self._pending.popleft())
        else:
            if self._worker is None:
                self._worker = threading.Thread(
                    target=self._worker_loop, daemon=True,
                    name="mapping-stage")
                self._worker.start()
            due = self.tracker.frame_id + self.cfg.async_kf_frames
            self._pending.append((job, holder, event, due))
            self._job_q.put((job, holder, event))
        return True

    def _adopt_due(self):
        """Apply every mapping-job result whose due frame has arrived
        (deterministic adoption point; blocks on an unfinished worker).
        Runs at the START of a frame, before `tracker.frame_id` is
        incremented — hence the +1."""
        while self._pending \
                and self._pending[0][3] <= self.tracker.frame_id + 1:
            self._adopt(self._pending.popleft())

    def _adopt(self, entry):
        job, holder, event, _due = entry
        event.wait()
        if "exc" in holder:
            raise holder["exc"]
        res = holder["result"]
        # merge the tracker's found/visible deltas + remap the live frame's
        # associations, one device program
        lf = self.tracker.last_frame
        view = self.tracker.state
        P = res.state.pt_pos.shape[0]
        lf_pt = lf.pt_idx if lf is not None \
            else jnp.zeros(0, jnp.int32)
        remap = res.pt_remap if res.pt_remap is not None \
            else jnp.arange(P, dtype=jnp.int32)
        new_state, new_pt = _adopt_merge(
            res.state, res.base_pt_visible, res.base_pt_found,
            res.base_pt_first, view.pt_visible, view.pt_found,
            view.pt_first_kf, lf_pt, remap)
        if lf is not None:
            self.tracker.last_frame = lf._replace(pt_idx=new_pt)
        self.state = new_state
        self.tracker.state = new_state
        if res.kf_valid_host is not None:
            self.tracker._kv_memo = (new_state.kf_valid, res.kf_valid_host)
        # the job's frame became keyframe `kf_slot`: re-anchor its
        # relative-trajectory entry to ITSELF (T_rel = I), as the
        # reference does (CreateNewKeyFrame sets mpReferenceKF = pKF so
        # Tlr is identity).  Leaving the stale previous reference makes
        # Tracking::UpdateLastFrame re-derive the last pose through a
        # DIFFERENT keyframe than the map's canonical post-BA pose, and
        # the motion-model prediction inherits the mismatch every frame
        # (measured: ok 0.45 → 0.99 on the long-run fixture).
        rel = self.tracker.relative_trajectory
        for i in range(len(rel) - 1, -1, -1):
            ts, ref, t_rel, ok = rel[i]
            if ts == res.timestamp:
                rel[i] = (ts, res.kf_slot, jnp.eye(4), ok)
                break
        # re-anchor trajectory entries referencing culled keyframes (their
        # slots may be recycled; the reference re-parents frames to the
        # spanning tree on culling).  Entries appended between the job's
        # run and this adoption are covered too — the scan is here, on the
        # main thread, over the full list.
        if res.culled:
            fix = {c: (fb, t) for c, fb, t in res.culled}
            for i, (ts, ref, t_rel, ok) in enumerate(rel):
                if ref in fix:
                    fb, t = fix[ref]
                    rel[i] = (ts, fb, t_rel @ t, ok)
            if self.tracker.ref_kf in fix:
                self.tracker.ref_kf = fix[self.tracker.ref_kf][0]
        if self.tracker.ref_kf < 0:
            self.tracker.ref_kf = res.kf_slot
        if res.map_changed:
            self.tracker.map_changed = True

    def _prewait_mapping(self):
        """Overlap the mapping worker's tail latency with the tracker's
        in-flight stats round trip: WAIT (without adopting) on the job
        that will be due at the next frame.  Adoption content and timing
        stay deterministic — only the blocking moves under the fetch
        (profiled: adoption blocked the frame loop ~58 ms/frame at dense
        keyframe cadence when it waited at frame start instead)."""
        if self._pending \
                and self._pending[0][3] <= self.tracker.frame_id + 2:
            self._pending[0][2].wait()

    def flush(self):
        """Finalize the tracking pipeline and adopt every in-flight
        mapping job (joins the worker pipeline).  Call before reading
        final map state / saving / resetting."""
        for out in self.tracker.finalize_pending():
            self.state = self.tracker.state
            if not self.localization_only:
                self._handle_track_out(out, None)
        self.state = self.tracker.state
        while self._pending:
            self._adopt(self._pending.popleft())

    # ------------------------------------------------------------------
    def _reloc_candidates(self, frame, top_k: int = 5):
        """BoW retrieval for relocalization (DetectRelocalizationCandidates
        role).  Reads the tracker's view of the map + the worker-published
        database reference.  Scale-safe: group scores expand only the
        top-k candidates' covisibility rows (no (K, K) matrix)."""
        import numpy as _np

        db = self.mapping.db
        w = vocabulary.quantize(self.vocab, frame.feats.desc,
                                frame.feats.valid)
        q = vocabulary.bow_vector(w, self.vocab.n_words)
        cand_idx, _scores = keyframe_db.detect_reloc_candidates_grouped(
            db, q, self.tracker.state, top_l=top_k)
        return [int(k) for k in _np.asarray(cand_idx) if k >= 0]

    # ------------------------------------------------------------------
    def activate_localization_mode(self):
        """Track against the frozen map, insert no keyframes (reference
        `System::ActivateLocalizationMode`, `System.h:106`)."""
        self.flush()
        self.localization_only = True

    def deactivate_localization_mode(self):
        self.localization_only = False

    def reset(self):
        """Full system reset (reference `System::Reset` / `Tracking::Reset`
        `Tracking.cc:1608`): clears map, database and tracker state."""
        self.flush()
        cfg = self.cfg
        self.state = ms.empty(
            max_kf=cfg.map.max_kf, max_feat=cfg.map.max_feat,
            max_pts=cfg.map.max_pts, max_obj=cfg.map.max_obj,
            code_len=cfg.recon.code_len, max_oobs=cfg.map.max_oobs,
        )
        self.tracker = Tracker(cfg, self.state)
        if self.mapping.db is not None:
            self.tracker.reloc_candidates_fn = self._reloc_candidates
        self.tracker.pre_fetch_hook = self._prewait_mapping
        self.tracker.mapping_idle_fn = lambda: not self._pending
        self.n_kf = 0
        self._kf_valid_host[:] = False
        m = self.mapping
        m.state = self.state
        if m.vocab is not None:
            m.db = keyframe_db.empty(cfg.map.max_kf, m.vocab.n_words)
        from dsp_slam_rgbd_tpu.loop import loop_closing as _lc

        m.consistency = _lc.ConsistencyState()
        m._gba_iters_left = 0
        m._last_loop_kid = -100
        m._oobs_cursor = {}

    def load_state(self, path: str):
        """Restore a MapState checkpoint (`utils/checkpoint.py`) INTO the
        running system: every external state assignment must rebuild the
        kf_valid host mirror, or the next keyframe insert allocates over a
        live slot (the mirror is the allocator's source of truth)."""
        from dsp_slam_rgbd_tpu.utils import checkpoint as ckpt

        self.flush()
        state, extra = ckpt.load_state(path)
        self.state = state
        self.tracker.state = state
        self.mapping.state = state
        self._kf_valid_host[:] = np.asarray(state.kf_valid)
        self.tracker._kv_memo = (state.kf_valid,
                                 self._kf_valid_host.copy())
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
        # deterministic adoption of due mapping-job results BEFORE
        # tracking: this frame then tracks against the freshest adopted
        # map (bounded staleness = async_kf_frames, independent of how
        # fast the worker happens to run)
        self._adopt_due()
        self.tracker.state = self.state
        outs = self.tracker.track(img, img_right=img_right,
                                  depth_map=depth_map, timestamp=timestamp,
                                  frame=frame)
        # the tracker updates per-point found/visible statistics
        self.state = self.tracker.state
        if self.localization_only:
            return outs[-1]
        for out in outs:
            self._handle_track_out(out, detections)
        return outs[-1]

    def _handle_track_out(self, out, detections):
        """Keyframe handling for one finalized tracking result (the
        pipelined tracker can finalize 0-2 frames per call)."""
        if not out.get("new_kf"):
            return
        first_kf = self.n_kf == 0
        timestamp = out.get("timestamp", 0.0)
        if self.tracker.status == "OK" and first_kf \
                and self.cfg.sensor == "mono" \
                and hasattr(self.tracker, "init_result"):
            self._insert_mono_init()
            self.tracker.state = self.state
        else:
            self._enqueue_kf(out["frame"], detections, timestamp,
                             fid=out.get("fid"))
        if first_kf and self.tracker.ref_kf >= 0 \
                and not self.tracker.relative_trajectory:
            # backfill the init frame into the relative trajectory (its
            # reference KF did not exist yet at track time)
            fr = out["frame"]
            t_rel = np.asarray(
                fr.t_cw
                @ lie.inv_se3(self.state.kf_pose[self.tracker.ref_kf])
            )
            self.tracker.relative_trajectory.append(
                (timestamp, self.tracker.ref_kf, t_rel, True)
            )

    # ------------------------------------------------------------------
    def _insert_mono_init(self):
        """Create the two initial KFs + triangulated points (reference
        `CreateInitialMapMonocular`).  Synchronous: the next frame tracks
        against this map immediately."""
        self.flush()
        r = self.tracker.init_result
        ref, cur, m = r["ref_frame"], r["cur_frame"], r["matches"]
        good = np.asarray(r["good"] & m.valid)
        k0 = int(ms.alloc_slots(self._kf_valid_host, 1)[0])
        state = lm.insert_keyframe(
            self.mapping.state, ref._replace(t_cw=jnp.eye(4)), k0, 0
        )
        self._kf_valid_host[k0] = True
        k1 = int(ms.alloc_slots(self._kf_valid_host, 1)[0])
        state = lm.insert_keyframe(
            state, cur._replace(t_cw=r["t21"]), k1, 1
        )
        self._kf_valid_host[k1] = True
        pts = np.asarray(r["pts"])
        chosen = np.nonzero(good)[0]
        slots = ms.alloc_slots(state.pt_valid, len(chosen))
        ok = slots >= 0
        chosen, slots = chosen[ok], slots[ok]
        sl = jnp.asarray(slots)
        ch = jnp.asarray(chosen)
        midx = np.asarray(m.idx)
        state = state._replace(
            pt_pos=state.pt_pos.at[sl].set(jnp.asarray(pts[chosen])),
            pt_valid=state.pt_valid.at[sl].set(True),
            pt_desc=state.pt_desc.at[sl].set(ref.feats.desc[ch]),
            pt_ref_kf=state.pt_ref_kf.at[sl].set(k0),
            pt_first_kf=state.pt_first_kf.at[sl].set(0),  # monotonic id
            kf_feat_pt=state.kf_feat_pt
            .at[k0, ch].set(sl.astype(jnp.int32))
            .at[k1, jnp.asarray(midx[chosen])].set(sl.astype(jnp.int32)),
        )
        self.state = state
        self.mapping.state = state
        self.tracker.state = state
        self.tracker._kv_memo = (state.kf_valid, self._kf_valid_host.copy())
        self.tracker.ref_kf = k1
        self.tracker.last_kf_frame_id = self.tracker.frame_id
        self.n_kf = 2
        self.mapping._update_bow(k0)
        self.mapping._update_bow(k1)

    # ------------------------------------------------------------------
    def _frame_poses(self):
        """Per-frame poses composed from CURRENT keyframe poses via the
        stored relative transforms — BA and loop-closure corrections
        propagate into saved trajectories (reference
        `System::SaveTrajectoryTUM/KITTI`, System.cc:380-525)."""
        self.flush()
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
        self.flush()
        io_mod.save_entire_map(dirname, self.state)

    def shutdown(self):
        """Join the mapping worker (reference `System::Shutdown`)."""
        self.flush()
        if self._worker is not None:
            self._job_q.put(None)
            self._worker.join(timeout=30.0)
            self._worker = None
