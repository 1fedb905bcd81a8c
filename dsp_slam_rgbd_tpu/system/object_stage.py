"""Batched stereo object stage: association, pose refinement, reconstruction.

The reference reconstructs detections one Python call at a time under the
GIL (`src/LocalMapping_util.cc:86,158` — `pyOptimizer.attr(...)` per
detection).  Here the whole keyframe's object work runs as THREE device
programs regardless of detection count:

  1. `associate_batch`     — data association (+ one small combined fetch);
  2. `refine_associated`   — vmapped pose-only GN over every associated
     object, plus all bookkeeping scatters (obs counters, dynamics,
     observation edges, point membership) in the same dispatch;
  3. `recon_unmatched`     — vmapped joint Sim3+code GN over every
     unmatched detection, with the decoded-shape bbox; one fetch of the
     is_good/obj_valid flags, then `insert_new_objects` scatters every
     accepted object at once.

Detection counts vary frame to frame, so inputs are padded to power-of-two
capacity buckets — one compiled program per bucket serves all frames (a
shape-specialized program per distinct count would recompile at keyframe
time, seconds over the remote-TPU tunnel).

On a multi-device host the unmatched-reconstruction batch shards over the
(obj, ray) mesh (`parallel/sharded_recon.py`) so the PRODUCT — not just the
dryrun — uses every chip.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from dsp_slam_rgbd_tpu.mapping import objects as obj_mod
from dsp_slam_rgbd_tpu.models import mesh as mesh_mod
from dsp_slam_rgbd_tpu.ops import lie
from dsp_slam_rgbd_tpu.recon import optimizer as recon_opt


def bucket(n: int, minimum: int = 1, cap: int = 64) -> int:
    b = max(minimum, 1)
    while b < n:
        b *= 2
    return min(b, cap)


# ---------------------------------------------------------------------------
# 1. association
# ---------------------------------------------------------------------------
@jax.jit
def _associate_device(state, det_t_co, det_valid, t_cw):
    assoc, unmatched = obj_mod.associate_detections(
        state.obj_pose[:, :3, 3], state.obj_valid, state.obj_dynamic,
        state.obj_velocity, det_t_co, det_valid, t_cw,
    )
    # one combined fetch vector: [assoc (O,) | unmatched (D,)]
    return jnp.concatenate([assoc.astype(jnp.int32),
                            unmatched.astype(jnp.int32)])


def associate_dispatch(state, detections, t_cw):
    """Dispatch the association program; returns the device result vector.

    Pads to a fixed capacity bucket (one compiled program per bucket — a
    raw per-count program recompiles for every distinct detection count).
    `t_cw` is the keyframe pose passed DIRECTLY (not read back from the
    map), so this can dispatch before the keyframe insert and its fetch
    (`associate_read`) overlaps the whole fused point stage."""
    D = len(detections)
    Dcap = bucket(D, minimum=1, cap=max(D, 1))
    det_t = np.zeros((Dcap, 4, 4), np.float32)
    det_t[:, 3, 3] = 1.0
    for i, d in enumerate(detections):
        det_t[i] = d.t_co
    det_valid = np.zeros(Dcap, bool)
    det_valid[:D] = True
    return _associate_device(state, jnp.asarray(det_t),
                             jnp.asarray(det_valid), t_cw), D


def associate_read(pending, n_obj: int):
    """Fetch + unpack an `associate_dispatch` result."""
    vec, D = pending
    out = np.asarray(vec)
    assoc = out[:n_obj]
    unmatched = out[n_obj:].astype(bool)
    return assoc, [int(i) for i in np.nonzero(unmatched)[0] if i < D]


def associate_batch(state, detections, kf_slot):
    """Associate a keyframe's detections with existing objects (dispatch +
    immediate read).  Returns (assoc (O,) np, unmatched_det_indices)."""
    return associate_read(
        associate_dispatch(state, detections, state.kf_pose[kf_slot]),
        state.obj_valid.shape[0])


# ---------------------------------------------------------------------------
# shared: batched point-membership update
# ---------------------------------------------------------------------------
def _membership_update(state, obj_idx, valid):
    """Batched `_assign_point_membership`: tag map points inside each
    object's decoded-shape bbox (reference `object_id`/`in_any_object`,
    `MapPoint_util.cc:23-31`; inflation margins `MapObject.cc:301-303`).

    Sequential-claim semantics preserved: an owner that still sees its
    point keeps it; released or unowned points go to the lowest-index
    claiming object."""
    st = state
    oi = jnp.maximum(obj_idx, 0)
    T_ow = jax.vmap(lie.inv_se3)(st.obj_pose[oi])          # (A, 4, 4)
    local = jnp.einsum("aij,pj->api", T_ow[:, :3, :3], st.pt_pos) \
        + T_ow[:, None, :3, 3]                              # (A, P, 3)
    local = local / jnp.maximum(st.obj_scale[oi][:, None, None], 1e-6)
    s = jnp.array([1.2, 1.5, 1.2])
    inside = jnp.all(
        (local >= (s * st.obj_bbox_min[oi])[:, None, :])
        & (local <= (s * st.obj_bbox_max[oi])[:, None, :]), axis=-1
    ) & st.pt_valid[None, :] & valid[:, None]               # (A, P)

    owner = st.pt_object
    owned_by = (owner[None, :] == oi[:, None]) & valid[:, None]
    release = jnp.any(owned_by & ~inside, axis=0)
    owner = jnp.where(release, -1, owner)
    any_claim = jnp.any(inside, axis=0)
    winner = oi[jnp.argmax(inside, axis=0)]
    owner = jnp.where((owner < 0) & any_claim, winner.astype(owner.dtype),
                      owner)
    return st._replace(pt_object=owner.astype(jnp.int32))


# ---------------------------------------------------------------------------
# 2. associated objects: vmapped pose-only GN + bookkeeping, one dispatch
# ---------------------------------------------------------------------------
@partial(jax.jit, static_argnames=("spec", "cfg"))
def refine_associated(params, spec, cfg, state, obj_idx, valid, det_t_co,
                      det_pts, det_pts_mask, kf_slot, oobs_q):
    """Pose-only refinement of every associated object in ONE program
    (replaces a per-object `estimate_pose_cam_obj` dispatch chain).

    obj_idx (A,) object slots, valid (A,) live rows, det_* the matched
    detections' measurements, oobs_q (A,) pre-allocated observation-ring
    slots (host-owned cursors).  Updates obs counters, dynamics, the
    camera-object edge ring and point membership, all device-side."""
    O = state.obj_pose.shape[0]
    Q = state.oobs_kf.shape[0]
    oi = jnp.maximum(obj_idx, 0)
    t_cw = state.kf_pose[kf_slot]

    fit = jax.vmap(
        lambda t, s, p, m, c: recon_opt.estimate_pose_cam_obj(
            params, spec, cfg, t, s, p, m, c)
    )
    t_co_ref, _loss = fit(det_t_co, state.obj_scale[oi], det_pts,
                          det_pts_mask, state.obj_code[oi])

    t_wc = lie.inv_se3(t_cw)
    t_wo_new = jnp.einsum("ij,ajk->aik", t_wc, t_co_ref)
    prev_c = state.obj_pose[oi, :3, 3]
    v, dyn, _ = jax.vmap(
        lambda p, n, vel: obj_mod.update_dynamics(p, n, 1.0, vel)
    )(prev_c, t_wo_new[:, :3, 3], state.obj_velocity[oi])

    tgt = jnp.where(valid, oi, O)
    qt = jnp.where(valid, jnp.maximum(oobs_q, 0), Q)
    state = state._replace(
        obj_n_obs=state.obj_n_obs.at[tgt].add(1, mode="drop"),
        obj_last_kf=state.obj_last_kf.at[tgt].set(kf_slot, mode="drop"),
        obj_velocity=state.obj_velocity.at[tgt].set(v, mode="drop"),
        obj_dynamic=state.obj_dynamic.at[tgt].set(dyn, mode="drop"),
        oobs_kf=state.oobs_kf.at[qt].set(kf_slot, mode="drop"),
        oobs_obj=state.oobs_obj.at[qt].set(oi.astype(jnp.int32),
                                           mode="drop"),
        oobs_t_co=state.oobs_t_co.at[qt].set(t_co_ref, mode="drop"),
        oobs_valid=state.oobs_valid.at[qt].set(True, mode="drop"),
    )
    return _membership_update(state, obj_idx, valid)


# ---------------------------------------------------------------------------
# 3. unmatched detections: vmapped joint GN + bbox; scatter accepted objects
# ---------------------------------------------------------------------------
@partial(jax.jit, static_argnames=("spec", "cfg"))
def _recon_unmatched_device(params, spec, cfg, state, t_co, pts, pts_mask,
                            rays, ray_mask, depth, fg_mask, code0, valid):
    res = recon_opt.reconstruct_objects_batched(
        params, spec, cfg, t_co, pts, pts_mask, rays, ray_mask, depth,
        fg_mask, code0)
    bb_min, bb_max = jax.vmap(
        lambda c: mesh_mod.sdf_bbox(params, spec, c))(res.code)
    # one combined flags fetch: [is_good (U,) | obj_valid (O,)] — obj_valid
    # rides along so host slot allocation needs no second round trip
    flags = jnp.concatenate([(res.is_good & valid).astype(jnp.int32),
                             state.obj_valid.astype(jnp.int32)])
    return res, bb_min, bb_max, flags


def recon_unmatched(params, spec, cfg, state, detections, det_indices,
                    mesh=None, min_cap: int = 1):
    """Joint Sim3+code GN over every unmatched detection as one program.

    Returns (res, bb_min, bb_max, good (U,) np, obj_valid np, U).  With a
    multi-device `mesh`, the batch shards over the (obj, ray) axes
    (`parallel/sharded_recon.py` — the PRODUCT path, not just the dryrun);
    `min_cap` = the mesh's obj-axis size so the batch divides evenly.
    """
    U = len(det_indices)
    Ucap = bucket(U, minimum=min_cap, cap=max(U, min_cap))
    S = detections[det_indices[0]].pts.shape[0]
    R = detections[det_indices[0]].rays.shape[0]
    L = cfg.code_len
    t_co = np.zeros((Ucap, 4, 4), np.float32)
    t_co[:] = np.eye(4)
    b = {
        "pts": np.zeros((Ucap, S, 3), np.float32),
        "pts_mask": np.zeros((Ucap, S), bool),
        "rays": np.zeros((Ucap, R, 3), np.float32),
        "ray_mask": np.zeros((Ucap, R), bool),
        "depth": np.zeros((Ucap, R), np.float32),
        "fg_mask": np.zeros((Ucap, R), bool),
    }
    b["rays"][:, :, 2] = 1.0  # unit-norm padding rows (masked anyway)
    for j, di in enumerate(det_indices):
        d = detections[di]
        t = np.asarray(d.t_co, np.float32).copy()
        t[:3, :3] *= d.scale  # Sim(3) seed: scale folded into R
        t_co[j] = t
        b["pts"][j], b["pts_mask"][j] = d.pts, d.pts_mask
        b["rays"][j], b["ray_mask"][j] = d.rays, d.ray_mask
        b["depth"][j], b["fg_mask"][j] = d.depth, d.fg_mask
    valid = np.zeros(Ucap, bool)
    valid[:U] = True
    code0 = np.zeros((Ucap, L), np.float32)

    arrs = dict(t_cam_obj=jnp.asarray(t_co), code_init=jnp.asarray(code0),
                **{k: jnp.asarray(v) for k, v in b.items()})
    if mesh is not None:
        from dsp_slam_rgbd_tpu.parallel import sharded_recon

        arrs = sharded_recon.shard_batch(
            dict(t_cam_obj=arrs["t_cam_obj"], pts=arrs["pts"],
                 pts_mask=arrs["pts_mask"], rays=arrs["rays"],
                 ray_mask=arrs["ray_mask"], depth_obs=arrs["depth"],
                 fg_mask=arrs["fg_mask"], code_init=arrs["code_init"]),
            mesh)
        arrs["depth"] = arrs.pop("depth_obs")

    res, bb_min, bb_max, flags = _recon_unmatched_device(
        params, spec, cfg, state, arrs["t_cam_obj"], arrs["pts"],
        arrs["pts_mask"], arrs["rays"], arrs["ray_mask"], arrs["depth"],
        arrs["fg_mask"], arrs["code_init"], jnp.asarray(valid))
    return res, bb_min, bb_max, flags, Ucap, U


def recon_unmatched_read(pending, flags=None):
    """Fetch + unpack a `recon_unmatched` result — call AFTER dispatching
    downstream device work (local BA) so the flags round trip overlaps it.
    `flags`: optionally the already-fetched flags vector (bundled-fetch
    callers)."""
    res, bb_min, bb_max, flags_dev, Ucap, U = pending
    if flags is None:
        flags = np.asarray(flags_dev)  # the object stage's blocking fetch
    good = flags[:Ucap].astype(bool)
    obj_valid = flags[Ucap:].astype(bool)
    return res, bb_min, bb_max, good, obj_valid, U


@jax.jit
def insert_new_objects(state, slots, ok, t_sim3, codes, bb_min, bb_max,
                       kf_slot, kfseq, oobs_q):
    """Scatter every accepted reconstruction into the map in ONE dispatch
    (pose/scale decomposition, world pose, bbox, obs edge, membership)."""
    O = state.obj_pose.shape[0]
    Q = state.oobs_kf.shape[0]
    t_cw = state.kf_pose[kf_slot]
    s = jnp.cbrt(jnp.linalg.det(t_sim3[:, :3, :3]))
    t_se3 = t_sim3.at[:, :3, :3].divide(
        jnp.maximum(s, 1e-9)[:, None, None])
    t_wc = lie.inv_se3(t_cw)
    t_wo = jnp.einsum("ij,ajk->aik", t_wc, t_se3)

    sl = jnp.maximum(slots, 0)
    tgt = jnp.where(ok, sl, O)
    qt = jnp.where(ok, jnp.maximum(oobs_q, 0), Q)
    state = state._replace(
        obj_pose=state.obj_pose.at[tgt].set(t_wo, mode="drop"),
        obj_scale=state.obj_scale.at[tgt].set(s, mode="drop"),
        obj_code=state.obj_code.at[tgt].set(codes, mode="drop"),
        obj_valid=state.obj_valid.at[tgt].set(True, mode="drop"),
        obj_n_obs=state.obj_n_obs.at[tgt].set(1, mode="drop"),
        obj_last_kf=state.obj_last_kf.at[tgt].set(kf_slot, mode="drop"),
        obj_ref_kfseq=state.obj_ref_kfseq.at[tgt].set(kfseq, mode="drop"),
        obj_recon=state.obj_recon.at[tgt].set(True, mode="drop"),
        obj_bbox_min=state.obj_bbox_min.at[tgt].set(bb_min, mode="drop"),
        obj_bbox_max=state.obj_bbox_max.at[tgt].set(bb_max, mode="drop"),
        obj_velocity=state.obj_velocity.at[tgt].set(
            jnp.zeros_like(state.obj_velocity[sl]), mode="drop"),
        obj_dynamic=state.obj_dynamic.at[tgt].set(False, mode="drop"),
        oobs_kf=state.oobs_kf.at[qt].set(kf_slot, mode="drop"),
        oobs_obj=state.oobs_obj.at[qt].set(sl.astype(jnp.int32),
                                           mode="drop"),
        oobs_t_co=state.oobs_t_co.at[qt].set(t_se3, mode="drop"),
        oobs_valid=state.oobs_valid.at[qt].set(True, mode="drop"),
    )
    return _membership_update(state, slots, ok)
