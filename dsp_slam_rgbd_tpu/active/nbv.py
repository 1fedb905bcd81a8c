"""Next-best-view generation: viewpoint scoring + planning glue.

Covers `NbvGenerator::Run` (`src/NbvGenerator.cpp:27-160`): pick a target
object, compute its NBV viewpoint (`MapObject::compute_NBV` — the centroid
reflection heuristic, here `mapping.objects.compute_nbv`), plan a
collision-free path with RRT, and score candidate viewpoints by expected
SDF-uncertainty reduction (the fork's per-point |SDF| diagnostic,
`MapObject_util.cc:9-49`).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from dsp_slam_rgbd_tpu.active import rrt
from dsp_slam_rgbd_tpu.mapping import objects as obj_mod
from dsp_slam_rgbd_tpu.ops import lie
from dsp_slam_rgbd_tpu.recon.optimizer import mean_sdf_loss


class NbvPlan(NamedTuple):
    target_obj: int
    view_t_wc: np.ndarray        # (4, 4) suggested camera pose (cam→world)
    path: Optional[np.ndarray]   # (N, 3) waypoints or None
    score: float                 # mean |SDF| of owned points (uncertainty)


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


def generate(state, cam_t_wc: np.ndarray, decoder_params=None,
             decoder_spec=None, target: int | None = None) -> NbvPlan | None:
    """Pick the target object (index 0 by default, like the reference's
    `mvpMapObjects[0]`), compute its NBV and an RRT path to it."""
    valid = np.nonzero(np.asarray(state.obj_valid))[0]
    if len(valid) == 0:
        return None
    if target is None:
        target = int(valid[0])
    cam_pos = np.asarray(cam_t_wc)[:3, 3]
    center = np.asarray(state.obj_pose)[target][:3, 3]
    view = np.asarray(obj_mod.compute_nbv(jnp.asarray(center),
                                          jnp.asarray(cam_pos)))
    obstacles = rrt.obstacles_from_map(state)
    plan = rrt.plan(cam_pos, view[:3, 3], obstacles)
    score = object_uncertainty(state, target, decoder_params, decoder_spec)
    return NbvPlan(target, view, plan.path, score)
