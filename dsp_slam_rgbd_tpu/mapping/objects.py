"""Map-object logic: data association, cuboid init, dynamics, NBV.

Covers the object-level algorithms of the reference outside the GN fit:

  * `associate_detections` — `Tracking::ObjectDataAssociation`
    (`Tracking_util.cc:60-153`): 2D ground-plane distance between predicted
    object centers and detections, dynamic objects predicted by velocity,
    best detection per object within a gate;
  * `cuboid_from_points_pca` — `MapObject::ComputeCuboidPCA_onlyformono`
    (`MapObject.cc:330-443`): PCA box with ShapeNet axis convention,
    5–95 percentile extent, pose seed with 0.4·l scale;
  * `update_dynamics` — velocity estimate + dynamic flag
    (`MapObject.cc:459-505`, `LocalMapping_util.cc:84-154` innovation test);
  * `compute_nbv` — the fork's centroid-reflection next-best-view heuristic
    (`MapObject_util.cc:71-106`).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from dsp_slam_rgbd_tpu.ops import lie


@jax.jit
def associate_detections(obj_centers_w, obj_valid, obj_dynamic, obj_velocity,
                         det_t_co, det_valid, t_cw, dt: float = 1.0,
                         gate: float = 4.0):
    """Greedy best-detection-per-object by planar distance.

    obj_centers_w: (O, 3) object centers in world; det_t_co: (D, 4, 4)
    detection poses (camera frame).  Returns (assoc (O,) int32 detection
    index or −1, unmatched_det (D,) bool).

    Distance is on the camera ground plane (x, z) like the reference's
    2D check; dynamic objects are advanced by their velocity first.
    """
    t_wc = lie.inv_se3(t_cw)
    det_c_w = jnp.einsum("ij,dj->di", t_wc[:3, :3], det_t_co[:, :3, 3]) \
        + t_wc[:3, 3]  # (D, 3) detection centers in world
    pred = obj_centers_w + jnp.where(obj_dynamic[:, None],
                                     obj_velocity * dt, 0.0)
    d = pred[:, None, :] - det_c_w[None, :, :]  # (O, D, 3)
    dist = jnp.sqrt(d[..., 0] ** 2 + d[..., 2] ** 2)  # ground-plane (x, z)
    dist = jnp.where(obj_valid[:, None] & det_valid[None, :], dist, jnp.inf)

    best = jnp.argmin(dist, axis=1)
    best_d = jnp.min(dist, axis=1)
    assoc = jnp.where(obj_valid & (best_d <= gate), best, -1)
    # resolve conflicts: the closest object wins a detection
    O = assoc.shape[0]
    dist_best = jnp.where(assoc >= 0, best_d, jnp.inf)
    claimed = jnp.full(det_valid.shape[0] + 1, jnp.inf)
    claimed = claimed.at[jnp.where(assoc >= 0, assoc, -1)].min(dist_best)
    win = dist_best <= claimed[jnp.where(assoc >= 0, assoc, -1)]
    assoc = jnp.where(win, assoc, -1)
    matched = jnp.zeros(det_valid.shape[0] + 1, bool).at[
        jnp.where(assoc >= 0, assoc, det_valid.shape[0])
    ].set(True)[:-1]
    return assoc, det_valid & ~matched


class Cuboid(NamedTuple):
    t_wo: jnp.ndarray    # (4, 4) pose seed (SE3)
    scale: jnp.ndarray   # scalar (0.4·l, reference seed)
    extent: jnp.ndarray  # (3,) full box dims (w, h, l)
    outlier: jnp.ndarray # (N,) bool — outside the 1.2× PCA box


def remove_outliers_simple(pts_w: jnp.ndarray, owned: jnp.ndarray,
                           max_dist: float = 1.0) -> jnp.ndarray:
    """Points farther than `max_dist` from the owned-set centroid are
    released (reference `MapObject::RemoveOutliersSimple`,
    `MapObject.cc:249-283`).  Returns the surviving owned mask."""
    w = owned.astype(jnp.float32)
    n = jnp.maximum(w.sum(), 1.0)
    c = jnp.einsum("n,ni->i", w, pts_w) / n
    return owned & (jnp.linalg.norm(pts_w - c, axis=-1) <= max_dist)


def cuboid_from_points_pca(pts_w: jnp.ndarray, mask: jnp.ndarray,
                           ground_normal=None) -> Cuboid:
    """PCA cuboid seed from owned map points (mono path), with the
    reference's exact conventions (`MapObject::ComputeCuboidPCA_onlyformono`,
    `MapObject.cc:330-443`):

      * eigenvectors of the centered covariance, ascending;
      * ShapeNet axes: x = middle axis, y = smallest (up), z = −largest
        (car length), det fixed by flipping x, y forced toward camera-up
        (world −y);
      * box = 5–95 percentile extents of UNCENTERED coords along the axes,
        centre = percentile midpoints;
      * scale seed = 0.40·l (z extent); outliers = outside the 1.2× box.
    """
    w = mask.astype(jnp.float32)
    n = jnp.maximum(w.sum(), 1.0)
    c_mean = jnp.einsum("n,ni->i", w, pts_w) / n
    q = (pts_w - c_mean) * w[:, None]
    C = q.T @ q
    _, vecs = jnp.linalg.eigh(C)  # ascending eigenvalues
    ex = vecs[:, 1]
    ey = vecs[:, 0]
    ez = -vecs[:, 2]
    R = jnp.stack([ex, ey, ez], axis=1)  # columns = object axes in world
    # det(R) = −1 → flip x (reference :376-377)
    flip = jnp.sign(jnp.linalg.det(R))
    R = R.at[:, 0].multiply(flip)
    # y must point up (dot with world −y ≥ 0): flip x and y (:380-386)
    upflip = jnp.where(R[1, 1] > 0.0, -1.0, 1.0)
    R = R.at[:, 0].multiply(upflip).at[:, 1].multiply(upflip)
    # percentile box over UNCENTERED local coords (reference :388-405);
    # padding slots become NaN so they cannot drag the quantiles
    local = pts_w @ R  # = R⁻¹ · x (R orthonormal)
    local_masked = jnp.where(mask[:, None], local, jnp.nan)
    lo = jnp.nanquantile(local_masked, 0.05, axis=0)
    hi = jnp.nanquantile(local_masked, 0.95, axis=0)
    ok = jnp.isfinite(hi - lo)
    extent = jnp.where(ok, hi - lo, 0.0)
    centre_o = jnp.where(ok, 0.5 * (hi + lo), 0.0)
    centre_w = R @ centre_o
    scale = 0.4 * extent[2]  # 0.40·l (reference :436)
    # outliers: outside the 1.2× box (reference :409-431 SetOutlierFlag)
    d = jnp.abs(local - centre_o)
    outlier = mask & jnp.any(d > 1.2 * 0.5 * extent, axis=-1)
    return Cuboid(lie.rt_to_mat(R, centre_w), scale, extent, outlier)


def model_outliers(pts_w: jnp.ndarray, owned: jnp.ndarray, t_wo: jnp.ndarray,
                   scale, bbox_min: jnp.ndarray, bbox_max: jnp.ndarray
                   ) -> jnp.ndarray:
    """Model-based outlier gating with the decoded shape's bbox
    (reference `MapObject::RemoveOutliersModel`, `MapObject.cc:285-328`):
    points outside the per-axis inflated (1.2, 1.5, 1.2)× bbox of the
    reconstructed mesh, in normalized object coordinates, are outliers."""
    T_ow = lie.inv_se3(t_wo)
    local = lie.transform_points(T_ow, pts_w) / jnp.maximum(scale, 1e-6)
    s = jnp.array([1.2, 1.5, 1.2])
    out = (local > s * bbox_max) | (local < s * bbox_min)
    return owned & jnp.any(out, axis=-1)


@jax.jit
def update_dynamics(prev_center, new_center, dt, prev_velocity,
                    innovation_th: float = 0.3, alpha: float = 0.6):
    """Velocity filter + dynamic classification by innovation
    (reference `LocalMapping_util.cc:84-154`)."""
    v_obs = (new_center - prev_center) / jnp.maximum(dt, 1e-6)
    innovation = jnp.linalg.norm(new_center - prev_center)
    dynamic = innovation > innovation_th
    v = alpha * prev_velocity + (1 - alpha) * v_obs
    return v, dynamic, innovation


def compute_nbv(obj_center_w, cam_center_w, standoff: float = None):
    """Next-best-view: reflect the current viewpoint through the object
    centroid at equal standoff (reference `MapObject_util.cc:71-106`)."""
    d = obj_center_w - cam_center_w
    dist = jnp.linalg.norm(d)
    if standoff is None:
        standoff = dist
    dir_ = d / jnp.maximum(dist, 1e-9)
    nbv_pos = obj_center_w + dir_ * standoff  # opposite side
    look = -dir_
    # camera z looks at the object; build a rotation with y down-ish
    up = jnp.array([0.0, -1.0, 0.0])
    z = look / jnp.maximum(jnp.linalg.norm(look), 1e-9)
    x = jnp.cross(up, z)
    x = x / jnp.maximum(jnp.linalg.norm(x), 1e-9)
    y = jnp.cross(z, x)
    R_wc = jnp.stack([x, y, z], axis=1)
    return lie.rt_to_mat(R_wc, nbv_pos)  # T_wc of the suggested view


@jax.jit
def cull_objects(obj_valid, obj_n_obs, obj_last_kf, current_kf,
                 min_obs: int = 2, max_age: int = 20):
    """MapObjectCulling role (`LocalMapping_util.cc:29-82`): drop objects
    with too few observations that went stale."""
    stale = (current_kf - obj_last_kf) > max_age
    keep = obj_valid & ~(stale & (obj_n_obs < min_obs))
    return keep
