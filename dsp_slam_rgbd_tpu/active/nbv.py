"""Next-best-view generation: viewpoint candidates, rewards, planning glue.

Covers `NbvGenerator` (`src/NbvGenerator.cpp:27-160`, `include/
NbvGenerator.h:49-148`): pick a target object, compute its NBV viewpoint
(`MapObject::compute_NBV` — the centroid reflection heuristic, here
`mapping.objects.compute_nbv`), enumerate rotated viewpoint candidates
around it (`RotateCandidates`, NbvGenerator.cpp:449-480: mDivide=36 yaw
steps over [−π/2, π/2]), score each candidate with a reward
(`Candidate.reward` weighted by the `mReward_dis` / `mReward_angle_cost`
config fields, NbvGenerator.h:49-57,148 — declared by the reference;
the working scoring here is expected SDF-uncertainty reduction from the
fork's per-point |SDF| diagnostic, `MapObject_util.cc:9-49`, minus motion
cost), and plan a collision-free path with RRT.

TPU design: candidate poses and rewards are one batched jitted program —
frustum-visibility of the object's member points × their |SDF| error,
vmapped over all candidates at once — instead of a per-candidate host loop.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dsp_slam_rgbd_tpu.active import rrt
from dsp_slam_rgbd_tpu.mapping import objects as obj_mod
from dsp_slam_rgbd_tpu.ops import camera as cam_ops
from dsp_slam_rgbd_tpu.ops import lie
from dsp_slam_rgbd_tpu.recon.optimizer import mean_sdf_loss

N_DIVIDE = 36        # reference RotateCandidates mDivide
MAX_MEMBER_PTS = 2048  # fixed-capacity member-point subset for scoring


class NbvPlan(NamedTuple):
    target_obj: int
    view_t_wc: np.ndarray        # (4, 4) best camera pose (cam→world)
    path: Optional[np.ndarray]   # (N, 3) waypoints or None
    score: float                 # mean |SDF| of owned points (uncertainty)
    candidates: Optional[np.ndarray] = None  # (C, 4, 4) enumerated poses
    rewards: Optional[np.ndarray] = None     # (C,) per-candidate rewards


def object_uncertainty(state, obj_slot: int, decoder_params, decoder_spec
                       ) -> float:
    """Mean |SDF| of the object's member points in its normalized frame —
    high values mean the shape fit disagrees with the map (reference
    `compute_sdf_loss_of_all_inside_points`)."""
    member = np.asarray(state.pt_object) == obj_slot
    member &= np.asarray(state.pt_valid)
    if member.sum() < 5 or decoder_params is None:
        return 0.0
    pts_w = state.pt_pos
    T_ow = lie.inv_se3(state.obj_pose[obj_slot])
    local = lie.transform_points(T_ow, pts_w) / state.obj_scale[obj_slot]
    return float(mean_sdf_loss(
        decoder_params, decoder_spec, local, jnp.asarray(member),
        state.obj_code[obj_slot],
    ))


@partial(jax.jit, static_argnames=("n_divide",))
def rotate_candidates(t_wc_init: jnp.ndarray, n_divide: int = N_DIVIDE
                      ) -> jnp.ndarray:
    """(n_divide+1, 4, 4) yaw-divided candidate poses about the base pose
    (reference `RotateCandidates`: angles −π/2..π/2 in π/n steps, rotation
    in place).  The reference yaws the robot base about the ROS z-up axis;
    with no base frame here the rotation is about the camera's up axis
    (−y of the y-down optical frame) — the same sweep of headings."""
    a = jnp.arange(n_divide + 1) * (jnp.pi / n_divide) - jnp.pi / 2.0
    ca, sa = jnp.cos(a), jnp.sin(a)
    z = jnp.zeros_like(a)
    o = jnp.ones_like(a)
    # rotation about the camera-frame y axis (optical up is −y; yawing
    # about −y or +y sweeps the same set of headings)
    ry = jnp.stack([
        jnp.stack([ca, z, sa, z], -1),
        jnp.stack([z, o, z, z], -1),
        jnp.stack([-sa, z, ca, z], -1),
        jnp.stack([z, z, z, o], -1),
    ], -2)                                  # (C, 4, 4)
    return jnp.einsum("ij,cjk->cik", t_wc_init, ry)


@partial(jax.jit, static_argnames=("cam",))
def score_candidates(cam, cand_t_wc, cur_t_wc, pts_w, pt_err, pt_mask,
                     w_dis: float = 0.2, w_angle: float = 0.3):
    """(C,) rewards: Σ |SDF error| of member points visible in the
    candidate's frustum − w_dis·travel − w_angle·heading change (the
    reference's `mReward_dis` / `mReward_angle_cost` weights).  One vmapped
    program over all candidates — no per-candidate host loop."""
    def one(t_wc):
        t_cw = lie.inv_se3(t_wc)
        pc = lie.transform_points(t_cw, pts_w)
        uv = cam_ops.project(cam, pc)
        vis = (pc[:, 2] > 0.2) \
            & (uv[:, 0] >= 0.0) & (uv[:, 0] < 2.0 * cam.cx) \
            & (uv[:, 1] >= 0.0) & (uv[:, 1] < 2.0 * cam.cy)
        gain = jnp.sum(jnp.where(vis & pt_mask, pt_err, 0.0))
        dis = jnp.linalg.norm(t_wc[:3, 3] - cur_t_wc[:3, 3])
        cosang = jnp.clip(jnp.dot(t_wc[:3, 2], cur_t_wc[:3, 2]), -1.0, 1.0)
        return gain - w_dis * dis - w_angle * jnp.arccos(cosang)

    return jax.vmap(one)(cand_t_wc)


def member_sdf_errors(state, obj_slot: int, decoder_params, decoder_spec):
    """Fixed-capacity member-point subset with per-point |SDF| errors in
    the world frame: (pts_w (M, 3), err (M,), mask (M,)).  The error is the
    fork's per-point SDF diagnostic (`MapObject_util.cc:9-49`)."""
    from dsp_slam_rgbd_tpu.models import deepsdf

    member = (np.asarray(state.pt_object) == obj_slot) \
        & np.asarray(state.pt_valid)
    sel = np.nonzero(member)[0]
    if len(sel) > MAX_MEMBER_PTS:
        sel = sel[np.linspace(0, len(sel) - 1, MAX_MEMBER_PTS).astype(int)]
    idx = np.zeros(MAX_MEMBER_PTS, np.int64)
    idx[: len(sel)] = sel
    mask = np.zeros(MAX_MEMBER_PTS, bool)
    mask[: len(sel)] = True
    pts_w = state.pt_pos[jnp.asarray(idx)]
    T_ow = lie.inv_se3(state.obj_pose[obj_slot])
    local = lie.transform_points(T_ow, pts_w) / jnp.maximum(
        state.obj_scale[obj_slot], 1e-6)
    err = jnp.abs(deepsdf.sdf(decoder_params, decoder_spec,
                              state.obj_code[obj_slot], local))
    return pts_w, err, jnp.asarray(mask)


def generate(state, cam_t_wc: np.ndarray, decoder_params=None,
             decoder_spec=None, target: int | None = None, cam=None,
             n_candidates: int = N_DIVIDE) -> NbvPlan | None:
    """Pick the target object (index 0 by default, like the reference's
    `mvpMapObjects[0]`), compute its NBV, enumerate + score rotated
    candidates (when a camera model and decoder are given), and plan an
    RRT path to the winner."""
    valid = np.nonzero(np.asarray(state.obj_valid))[0]
    if len(valid) == 0:
        return None
    if target is None:
        target = int(valid[0])
    cam_pos = np.asarray(cam_t_wc)[:3, 3]
    center = np.asarray(state.obj_pose)[target][:3, 3]
    view = np.asarray(obj_mod.compute_nbv(jnp.asarray(center),
                                          jnp.asarray(cam_pos)))
    score = object_uncertainty(state, target, decoder_params, decoder_spec)

    candidates = rewards = None
    if cam is not None and decoder_params is not None:
        cands = rotate_candidates(jnp.asarray(view), n_candidates)
        pts_w, err, mask = member_sdf_errors(
            state, target, decoder_params, decoder_spec)
        r = score_candidates(cam, cands, jnp.asarray(cam_t_wc, jnp.float32),
                             pts_w, err, mask)
        candidates = np.asarray(cands)
        rewards = np.asarray(r)
        view = candidates[int(np.argmax(rewards))]

    obstacles = rrt.obstacles_from_map(state)
    plan = rrt.plan(cam_pos, view[:3, 3], obstacles)
    return NbvPlan(target, view, plan.path, score, candidates, rewards)
