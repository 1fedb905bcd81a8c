"""Shape/pose reconstruction losses with analytic GN Jacobians.

Re-implements the semantics of the reference `reconstruct/loss.py`
(compute_sdf_loss :22-43, compute_render_loss :60-166,
compute_rotation_loss_sim3 :169-192) in masked fixed-shape JAX:

  * every variable-length gather in the reference (valid samples, with-grad
    samples, non-zero-grad samples) becomes a mask or a fixed-capacity
    compaction (`jnp.nonzero(size=K)`), so the whole loss jits once and vmaps
    over objects;
  * the decoder Jacobian is the fused forward+reverse sweep from
    `models.deepsdf.sdf_and_input_jacobian` — no autograd graphs per point.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dsp_slam_rgbd_tpu.models import deepsdf
from dsp_slam_rgbd_tpu.ops import lie


def sdf_to_occupancy(sdf: jnp.ndarray, th: float = 0.01) -> jnp.ndarray:
    """Linear SDF→occupancy ramp on ±th (reference `loss_utils.py:40-48`)."""
    return 0.5 - jnp.clip(sdf, -th, th) / (2.0 * th)


class SdfLossResult(NamedTuple):
    jac_pose: jnp.ndarray   # (N, 7) d res / d sim3(t_obj_cam), tangent [v,w,s]
    jac_code: jnp.ndarray   # (N, L)
    res: jnp.ndarray        # (N,)
    mask: jnp.ndarray       # (N,) live surface points


def compute_sdf_loss(params, spec, pts_surface_cam, mask, t_obj_cam, code,
                     compute_dtype=jnp.float32, pallas_wb=None,
                     pallas_interpret: bool = False) -> SdfLossResult:
    """Surface-point SDF term: residual = SDF(T_oc · p_cam; z).

    Masked equivalent of reference `loss.py:22-43`.  `t_obj_cam` may be
    Sim(3); jac_pose is wrt its left-perturbation tangent (7,).

    pallas_wb: optional packed (W, b) stacks — routes the fused
    value+Jacobian sweep through the Pallas TPU kernel
    (`ops/pallas/mlp_sdf.py`) instead of the stock XLA path.
    """
    pts_obj = lie.transform_points(t_obj_cam, pts_surface_cam)
    if pallas_wb is not None:
        from dsp_slam_rgbd_tpu.ops.pallas import mlp_sdf

        res, jac_in = mlp_sdf.sdf_and_input_jacobian_fused(
            pallas_wb, code, pts_obj,
            compute_dtype=compute_dtype, interpret=pallas_interpret,
        )
    else:
        res, jac_in = deepsdf.sdf_and_input_jacobian(
            params, spec, code, pts_obj, compute_dtype
        )
    de_dxo = jac_in[:, -3:]                                  # (N, 3)
    dxo_dT = lie.points_to_pose_jacobian_sim3(pts_obj)       # (N, 3, 7)
    jac_pose = jnp.einsum("ni,nij->nj", de_dxo, dxo_dT)      # (N, 7)
    jac_code = jac_in[:, :-3]                                # (N, L)
    return SdfLossResult(jac_pose, jac_code, res, mask)


class RenderLossResult(NamedTuple):
    jac_pose: jnp.ndarray   # (K, 7)
    jac_code: jnp.ndarray   # (K, L)
    res: jnp.ndarray        # (K,)
    mask: jnp.ndarray       # (K,) live gradient points
    n_valid: jnp.ndarray    # scalar: in-sphere sample count (failure check)
    # per-ray diagnostics for active-ray selection (coarse-to-fine phase 2,
    # `optimizer.reconstruct_object`): depth residual and closest |SDF|
    # along the ray — a ray whose chord never approaches the surface
    # produces no gradient points and can be dropped from later iterations
    res_ray: jnp.ndarray = None      # (R,) clamped depth residual
    min_abs_sdf: jnp.ndarray = None  # (R,) min |SDF| over in-sphere samples


def chord_sample_depths(t_obj_cam, ray_dirs, num_samples: int,
                        eps: float = 1e-4):
    """Per-ray depth samples spanning exactly the ray ∩ unit-sphere chord.

    The decoder's support is the object-frame unit sphere; a ray's in-sphere
    region is one contiguous interval with closed-form endpoints
    (|A·d·t + c| = 1 quadratic, A/c from t_obj_cam).  Sampling M depths
    inside the chord puts EVERY sample where the SDF is defined — unlike the
    reference's global linspace over d_center ± scale (`optimizer.py:122-128`)
    which wastes 30-60% of samples outside the sphere and, in a
    fixed-capacity TPU formulation, would force either a huge dense grid or
    biased truncation.  Sample density ≥ the reference's everywhere (equal
    on diameter-crossing rays, higher on edge rays).

    Returns (depths (R, M), hit (R,)); depths are garbage where ~hit.
    """
    A = t_obj_cam[:3, :3]
    c = t_obj_cam[:3, 3]
    u = ray_dirs @ A.T                        # (R, 3) object-frame ray dirs
    a = jnp.sum(u * u, axis=-1)               # (R,)
    b = 2.0 * (u @ c)
    cc = jnp.dot(c, c) - 1.0
    disc = b * b - 4.0 * a * cc
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    a_safe = jnp.maximum(a, 1e-12)
    t0 = (-b - sq) / (2.0 * a_safe)
    t1 = (-b + sq) / (2.0 * a_safe)
    t0 = jnp.maximum(t0, eps)                 # clip to in front of camera
    hit = (disc > 0.0) & (t1 > t0)
    frac = jnp.linspace(0.0, 1.0, num_samples)
    depths = t0[:, None] + (t1 - t0)[:, None] * frac[None, :]
    return depths, hit


def compute_render_loss(params, spec, ray_dirs, ray_mask, depth_obs, t_obj_cam,
                        sampled_depths, code, th: float = 0.01,
                        max_grad_points: int = 2048,
                        max_valid_samples: int = 8192,
                        fast_value_pass: bool = False,
                        compute_dtype=jnp.float32,
                        d_max=None, pallas_wb=None,
                        pallas_interpret: bool = False) -> RenderLossResult:
    """Depth-rendering term via ray termination probabilities.

    Dense masked re-derivation of reference `loss.py:60-166`:

      * sample R rays × M depths, transform to object frame;
      * occupancy o = ramp(SDF) where ‖x‖ < 1, else 0 (value-only pass);
      * per-ray transmittance T_l = Π_{j≤l}(1−o_j); termination probability
        p_l = o_l · T_{l−1}; rendered depth d_u = Σ d̂_l p_l with the
        background bin d̂_M = 1.1 d_max, o_M = 1;
      * ∂e/∂o_m = (Σ_{l≥m} T_l)/(1−o_m) — a reverse cumsum, no per-point
      ray copies;
      * gradient points (|SDF| < th and ∂e/∂o > 1e-2) are compacted to a
        static capacity K = max_grad_points and only those get the decoder
        Jacobian pass.

    `sampled_depths` is either (M,) — the reference's global linspace over
    d_center ± scale, kept for parity (`optimizer.py:122-128`) — or (R, M)
    per-ray chord samples from `chord_sample_depths` (the TPU-native
    default: every sample in-support, dense value pass, no valid-sample
    compaction/truncation).

    Residual is clamped to ±0.30 m (reference :153).

    `d_max` (optional scalar): the far plane used for the background bin
    depth (1.1·d_max).  The optimizer passes its own d_center+scale so the
    background bin depth and the background depth_obs are the SAME quantity
    (reference `optimizer.py:128` / `loss.py:98` use one d_max for both) —
    unoccluded background rays then carry exactly zero residual.  When None,
    it is derived from the sample range as before.
    """
    R = ray_dirs.shape[0]
    chord_mode = sampled_depths.ndim == 2
    M = sampled_depths.shape[-1]
    if chord_mode:
        d_per_ray = sampled_depths                        # (R, M)
        if d_max is None:
            d_max = jnp.max(jnp.where(ray_mask, d_per_ray[:, -1], 0.0))
        delta_d = (d_per_ray[:, -1] - d_per_ray[:, 0]) / (M - 1)  # (R,)
    else:
        d_per_ray = jnp.broadcast_to(sampled_depths[None, :], (R, M))
        if d_max is None:
            d_max = sampled_depths[-1]
        delta_d = jnp.broadcast_to(
            (sampled_depths[-1] - sampled_depths[0]) / (M - 1), (R,)
        )
    pts_cam = ray_dirs[:, None, :] * d_per_ray[:, :, None]   # (R, M, 3)
    pts_obj = lie.transform_points(
        t_obj_cam, pts_cam.reshape(-1, 3)
    ).reshape(R, M, 3)

    valid = (jnp.linalg.norm(pts_obj, axis=-1) < 1.0) & ray_mask[:, None]

    # The value-only pass feeds the occupancy ramp and band selection — no
    # gradients flow through it.  1-pass bf16 MXU precision (DEFAULT) is
    # enough there (the reference's torch/RTX path runs TF32 everywhere);
    # the Jacobian pass below stays at 3-pass HIGH.
    val_precision = (jax.lax.Precision.DEFAULT if fast_value_pass
                     else jax.lax.Precision.HIGH)
    if pallas_wb is not None:
        from dsp_slam_rgbd_tpu.ops.pallas import mlp_sdf

        def _value_pass(pts):
            # bf16 MXU when fast_value_pass (DEFAULT precision class);
            # f32-HIGHEST otherwise — the kernel keeps weights+activations
            # in VMEM for the whole 9-layer sweep
            dt = jnp.bfloat16 if fast_value_pass else jnp.float32
            return mlp_sdf.sdf_value_fused(
                pallas_wb, code, pts, compute_dtype=dt,
                interpret=pallas_interpret)
    else:
        def _value_pass(pts):
            return deepsdf.sdf(params, spec, code, pts, compute_dtype,
                               precision=val_precision)
    if chord_mode:
        # chord samples are in-support by construction: dense value pass,
        # nothing truncated
        sdf_vals = _value_pass(pts_obj.reshape(-1, 3)).reshape(R, M)
    else:
        # global-linspace mode: typically only ~10-40% of samples are
        # in-sphere — compact to a static capacity before the value pass.
        # Samples beyond capacity are treated as empty space (size the cap
        # for the geometry, or use chord mode which needs none of this).
        flat_valid = valid.reshape(-1)
        (idx_val,) = jnp.nonzero(flat_valid, size=max_valid_samples,
                                 fill_value=R * M)
        pts_flat = pts_obj.reshape(-1, 3)
        pts_val = pts_flat[jnp.minimum(idx_val, R * M - 1)]
        sdf_val = _value_pass(pts_val)
        sdf_vals = (
            jnp.zeros(R * M + 1).at[idx_val].set(sdf_val, mode="drop")[:-1]
        ).reshape(R, M)
        covered = (
            jnp.zeros(R * M + 1, bool).at[idx_val].set(True, mode="drop")[:-1]
        ).reshape(R, M)
        valid = valid & covered
    occ = jnp.where(valid, sdf_to_occupancy(sdf_vals, th), 0.0)  # (R, M)
    acc_trans = jnp.cumprod(1.0 - occ, axis=-1)  # (R, M) = T_1..T_M
    # augmented: T_0 = 1 prepended; o_M = 1 appended; d̂_M = 1.1 d_max
    acc_aug = jnp.concatenate([jnp.ones((R, 1)), acc_trans], axis=-1)  # (R, M+1)
    o_aug = jnp.concatenate([occ, jnp.ones((R, 1))], axis=-1)
    d_aug = jnp.concatenate(
        [d_per_ray, jnp.full((R, 1), 1.1 * d_max)], axis=1
    )  # (R, M+1)
    term_prob = o_aug * acc_aug  # (R, M+1)
    d_u = jnp.sum(d_aug * term_prob, axis=-1)  # (R,)

    # de/do_m = (Σ_{l≥m} T_l) / (1 − o_m)
    rev_cumsum = jnp.cumsum(acc_trans[:, ::-1], axis=-1)[:, ::-1]  # (R, M)
    de_do = rev_cumsum / jnp.maximum(1.0 - occ, 1e-6)

    with_grad = valid & (jnp.abs(sdf_vals) < th) & (de_do > 1e-2)
    n_valid = jnp.sum(valid)

    # residual per ray, clamped; broadcast to sample points
    res_ray = jnp.clip(depth_obs - d_u, -0.30, 0.30)  # (R,)

    do_ds = -1.0 / (2.0 * th)
    de_ds = de_do * delta_d[:, None] * do_ds  # (R, M)

    # ---- fixed-capacity compaction of gradient points ----
    flat_mask = with_grad.reshape(-1)
    (idx,) = jnp.nonzero(flat_mask, size=max_grad_points, fill_value=0)
    live = flat_mask[idx]
    pts_sel = pts_obj.reshape(-1, 3)[idx]          # (K, 3)
    de_ds_sel = de_ds.reshape(-1)[idx]             # (K,)
    res_sel = jnp.repeat(res_ray[:, None], M, 1).reshape(-1)[idx]

    if pallas_wb is not None:
        from dsp_slam_rgbd_tpu.ops.pallas import mlp_sdf

        _, ds_di = mlp_sdf.sdf_and_input_jacobian_fused(
            pallas_wb, code, pts_sel,
            compute_dtype=compute_dtype, interpret=pallas_interpret,
        )
    else:
        _, ds_di = deepsdf.sdf_and_input_jacobian(
            params, spec, code, pts_sel, compute_dtype
        )
    de_di = de_ds_sel[:, None] * ds_di             # (K, L+3)
    de_dxo = de_di[:, -3:]
    dxo_dT = lie.points_to_pose_jacobian_sim3(pts_sel)
    jac_pose = jnp.einsum("ni,nij->nj", de_dxo, dxo_dT)
    jac_code = de_di[:, :-3]
    min_abs = jnp.min(jnp.where(valid, jnp.abs(sdf_vals), jnp.inf), axis=-1)
    return RenderLossResult(jac_pose, jac_code, res_sel, live, n_valid,
                            res_ray=res_ray, min_abs_sdf=min_abs)


def compute_rotation_loss_sim3(t_obj_cam):
    """Vertical-axis prior E = 1 − r_y · n_g (reference `loss.py:169-192`).

    Returns (J_sim3 (7,), res scalar); both zero when already aligned.
    """
    t_cam_obj = lie.inv_sim3(t_obj_cam)
    sR = t_cam_obj[:3, :3]
    scale = jnp.cbrt(jnp.linalg.det(sR))
    r_co = sR / scale
    r_oc = r_co.T
    ey = jnp.array([0.0, 1.0, 0.0])
    ng = jnp.array([0.0, -1.0, 0.0])
    ry = r_co @ ey
    res = 1.0 - jnp.dot(ry, ng)
    J_rot = jnp.cross(r_oc @ ng, ey)
    J = jnp.zeros(7).at[3:6].set(J_rot)
    zero = res < 1e-7
    return jnp.where(zero, jnp.zeros(7), J), jnp.where(zero, 0.0, res)
