"""Lie-group operations for SE(3) / Sim(3) / SO(3), batched and jit-safe.

Semantics follow the reference DSP-SLAM math (tangent ordering is
(translation v, rotation w[, log-scale s]) — see reference
`reconstruct/loss_utils.py:139-243` for exp_se3/exp_sim3 and
`include/ObjectPoseGraph.h:72` for the relative-pose log-map error), but the
implementation is branch-free jnp so every function vmaps/jits and runs on
TPU.  All small-angle limits are handled with `jnp.where` on safe operands
(no NaN gradients).

Conventions:
  * Transforms are (4, 4) row-major homogeneous matrices acting on column
    vectors: y = T @ [x; 1].
  * se3 tangent x = [v (3), w (3)];  sim3 tangent x = [v (3), w (3), s (1)].
  * Left perturbation: T' = exp(dx) @ T (matches the reference GN updates,
    `reconstruct/optimizer.py:75,193`).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """so(3) hat operator: (…, 3) -> (…, 3, 3) skew-symmetric matrix."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zero = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zero, -wz, wy], axis=-1),
            jnp.stack([wz, zero, -wx], axis=-1),
            jnp.stack([-wy, wx, zero], axis=-1),
        ],
        axis=-2,
    )


def vee(W: jnp.ndarray) -> jnp.ndarray:
    """Inverse of hat: (…, 3, 3) -> (…, 3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _safe_norm(w: jnp.ndarray) -> jnp.ndarray:
    """‖w‖ with a finite gradient at w = 0 (jnp.linalg.norm has a NaN
    gradient there, which poisons jacfwd/jacrev through exp maps)."""
    sq = jnp.sum(w * w, axis=-1)
    return jnp.sqrt(jnp.maximum(sq, 1e-24))


def _sinc_coeffs(theta):
    """Return (sin θ/θ, (1-cos θ)/θ², (θ-sin θ)/θ³) with Taylor fallbacks."""
    small = theta < 1e-5
    t2 = theta * theta
    safe = jnp.where(small, 1.0, theta)
    a = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(safe) / safe)
    b = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(safe)) / (safe * safe))
    c = jnp.where(small, 1.0 / 6.0 - t2 / 120.0, (safe - jnp.sin(safe)) / (safe ** 3))
    return a, b, c


def exp_so3(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: (…, 3) -> (…, 3, 3)."""
    theta = _safe_norm(w)
    a, b, _ = _sinc_coeffs(theta)
    W = hat(w)
    W2 = W @ W
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I + a[..., None, None] * W + b[..., None, None] * W2


def so3_left_jacobian(w: jnp.ndarray) -> jnp.ndarray:
    """Left Jacobian J of SO(3): exp_se3 translation = J @ v."""
    theta = _safe_norm(w)
    _, b, c = _sinc_coeffs(theta)
    W = hat(w)
    W2 = W @ W
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I + b[..., None, None] * W + c[..., None, None] * W2


def exp_se3(x: jnp.ndarray) -> jnp.ndarray:
    """se(3) exponential, tangent ordered [v, w]: (…, 6) -> (…, 4, 4)."""
    v, w = x[..., :3], x[..., 3:6]
    R = exp_so3(w)
    t = jnp.einsum("...ij,...j->...i", so3_left_jacobian(w), v)
    return _rt_to_mat(R, t)


def log_so3(R: jnp.ndarray) -> jnp.ndarray:
    """SO(3) log map: (…, 3, 3) -> (…, 3). Valid for θ < π.

    Uses the arctan2 form (sin θ from the skew part, cos θ from the trace)
    instead of arccos — arccos has an infinite derivative at θ = 0, which
    would poison autodiff through pose-graph residuals.
    """
    v = vee(R - jnp.swapaxes(R, -1, -2)) * 0.5  # = sin θ · axis
    sin_theta = _safe_norm(v)
    cos_theta = jnp.clip((jnp.trace(R, axis1=-2, axis2=-1) - 1.0) * 0.5,
                         -1.0, 1.0)
    theta = jnp.arctan2(sin_theta, cos_theta)
    small = sin_theta < 1e-5
    safe_sin = jnp.where(small, 1.0, sin_theta)
    # w = θ/sin θ · v ; Taylor θ/sinθ ≈ 1 + θ²/6
    k = jnp.where(small, 1.0 + theta * theta / 6.0, theta / safe_sin)
    return k[..., None] * v


def log_se3(T: jnp.ndarray) -> jnp.ndarray:
    """SE(3) log map -> tangent [v, w]."""
    R, t = T[..., :3, :3], T[..., :3, 3]
    w = log_so3(R)
    Jinv = _so3_left_jacobian_inv(w)
    v = jnp.einsum("...ij,...j->...i", Jinv, t)
    return jnp.concatenate([v, w], axis=-1)


def _so3_left_jacobian_inv(w: jnp.ndarray) -> jnp.ndarray:
    theta = _safe_norm(w)
    small = theta < 1e-5
    safe = jnp.where(small, 1.0, theta)
    half = safe * 0.5
    # k = 1/θ² - (1+cosθ)/(2θ sinθ) ; Taylor: 1/12 + θ²/720
    k = jnp.where(
        small,
        1.0 / 12.0 + theta * theta / 720.0,
        1.0 / (safe * safe) - (1.0 + jnp.cos(safe)) / (2.0 * safe * jnp.sin(safe)),
    )
    W = hat(w)
    W2 = W @ W
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I - 0.5 * W + k[..., None, None] * W2


def exp_sim3(x: jnp.ndarray) -> jnp.ndarray:
    """Sim(3) exponential, tangent [v, w, s]: (…, 7) -> (…, 4, 4).

    Rotation block is e^s * exp_so3(w); translation uses the Sim(3) "W"
    matrix (same closed form as reference `loss_utils.py:198-243`).
    """
    v, w, s = x[..., :3], x[..., 3:6], x[..., 6]
    theta = _safe_norm(w)
    e_s = jnp.exp(s)
    R = exp_so3(w)

    s_small = jnp.abs(s) < 1e-5
    safe_s = jnp.where(s_small, 1.0, s)
    # c = (e^s - 1)/s, Taylor: 1 + s/2 + s²/6
    c = jnp.where(s_small, 1.0 + s / 2.0 + s * s / 6.0, (e_s - 1.0) / safe_s)

    t_small = theta < 1e-5
    safe_t = jnp.where(t_small, 1.0, theta)
    s2t2 = s * s + theta * theta
    safe_d = jnp.where(s2t2 < 1e-12, 1.0, s2t2)
    a_ = e_s * jnp.sin(safe_t)
    b_ = e_s * jnp.cos(safe_t)
    # J = c·I + (k1/θ)·W + (k2/θ²)·W² with closed-form θ→0 / s→0 limits:
    #   k1/θ → (e^s s + 1 - e^s)/s²  → 1/2 as s→0
    #   k2/θ² → (e^s(s-1) - s²/2 + 1)/s³ → 1/6 as s→0
    k1 = (a_ * s + (1.0 - b_) * safe_t) / safe_d
    k2 = c - ((b_ - 1.0) * s + a_ * safe_t) / safe_d
    k1_over_t = jnp.where(
        t_small,
        jnp.where(s_small, 0.5 + s / 3.0, (e_s * s + 1.0 - e_s) / (safe_s * safe_s)),
        k1 / safe_t,
    )
    k2_over_t2 = jnp.where(
        t_small,
        jnp.where(s_small, 1.0 / 6.0, (e_s * (s - 1.0) - (s * s) / 2.0 + 1.0)
                  / (safe_s * safe_s * safe_s)),
        k2 / (safe_t * safe_t),
    )

    W = hat(w)
    W2 = W @ W
    I = jnp.broadcast_to(jnp.eye(3, dtype=x.dtype), W.shape)
    J = c[..., None, None] * I + k1_over_t[..., None, None] * W \
        + k2_over_t2[..., None, None] * W2
    t = jnp.einsum("...ij,...j->...i", J, v)
    return _rt_to_mat(e_s[..., None, None] * R, t)


def log_sim3(T: jnp.ndarray) -> jnp.ndarray:
    """Sim(3) log map -> tangent [v, w, s] (inverse of exp_sim3)."""
    sR = T[..., :3, :3]
    t = T[..., :3, 3]
    e_s = jnp.cbrt(jnp.linalg.det(sR))
    s = jnp.log(e_s)
    R = sR / e_s[..., None, None]
    w = log_so3(R)

    # Rebuild the Sim(3) J matrix and invert it to recover v.
    theta = _safe_norm(w)
    s_small = jnp.abs(s) < 1e-5
    safe_s = jnp.where(s_small, 1.0, s)
    c = jnp.where(s_small, 1.0 + s / 2.0 + s * s / 6.0, (e_s - 1.0) / safe_s)
    t_small = theta < 1e-5
    safe_t = jnp.where(t_small, 1.0, theta)
    s2t2 = s * s + theta * theta
    safe_d = jnp.where(s2t2 < 1e-12, 1.0, s2t2)
    a_ = e_s * jnp.sin(safe_t)
    b_ = e_s * jnp.cos(safe_t)
    k1 = (a_ * s + (1.0 - b_) * safe_t) / safe_d
    k2 = c - ((b_ - 1.0) * s + a_ * safe_t) / safe_d
    k1_over_t = jnp.where(
        t_small,
        jnp.where(s_small, 0.5 + s / 3.0, (e_s * s + 1.0 - e_s) / (safe_s * safe_s)),
        k1 / safe_t,
    )
    k2_over_t2 = jnp.where(
        t_small,
        jnp.where(s_small, 1.0 / 6.0, (e_s * (s - 1.0) - (s * s) / 2.0 + 1.0)
                  / (safe_s * safe_s * safe_s)),
        k2 / (safe_t * safe_t),
    )
    W = hat(w)
    W2 = W @ W
    I = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), W.shape)
    J = c[..., None, None] * I + k1_over_t[..., None, None] * W \
        + k2_over_t2[..., None, None] * W2
    v = jnp.linalg.solve(J, t[..., None])[..., 0]
    return jnp.concatenate([v, w, s[..., None]], axis=-1)


def _rt_to_mat(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    batch = R.shape[:-2]
    T = jnp.zeros(batch + (4, 4), dtype=R.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def rt_to_mat(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Assemble homogeneous (…, 4, 4) from rotation and translation."""
    return _rt_to_mat(R, t)


def inv_se3(T: jnp.ndarray) -> jnp.ndarray:
    """Fast inverse of an SE(3) matrix (R orthonormal)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return _rt_to_mat(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def inv_sim3(T: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a Sim(3) matrix (rotation block is s·R)."""
    sR = T[..., :3, :3]
    t = T[..., :3, 3]
    s2 = jnp.cbrt(jnp.linalg.det(sR)) ** 2
    inv_sR = jnp.swapaxes(sR, -1, -2) / s2[..., None, None]
    return _rt_to_mat(inv_sR, -jnp.einsum("...ij,...j->...i", inv_sR, t))


def transform_points(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply (4,4) transform to (…, 3) points."""
    return jnp.einsum("ij,...j->...i", T[:3, :3], pts) + T[:3, 3]


def sim3_scale(T: jnp.ndarray) -> jnp.ndarray:
    """Scale factor of a Sim(3) matrix: det(sR)^(1/3)."""
    return jnp.cbrt(jnp.linalg.det(T[..., :3, :3]))


def adjoint_se3(T: jnp.ndarray) -> jnp.ndarray:
    """SE(3) adjoint in [v, w] tangent ordering: (…, 6, 6).

    Ad(T) = [[R, t^ R], [0, R]] so that exp(Ad(T) x) = T exp(x) T^{-1}.
    """
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    tR = hat(t) @ R
    top = jnp.concatenate([R, tR], axis=-1)
    bottom = jnp.concatenate([jnp.zeros_like(R), R], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def points_to_pose_jacobian_se3(pts: jnp.ndarray) -> jnp.ndarray:
    """d(exp(x)·p)/dx at x=0 for SE(3), tangent [v, w]: (N, 3) -> (N, 3, 6).

    Equals [I | -p^] (left perturbation), matching reference
    `loss_utils.py:117-136`.
    """
    I = jnp.broadcast_to(jnp.eye(3, dtype=pts.dtype), pts.shape[:-1] + (3, 3))
    return jnp.concatenate([I, -hat(pts)], axis=-1)


def points_to_pose_jacobian_sim3(pts: jnp.ndarray) -> jnp.ndarray:
    """d(exp(x)·p)/dx at x=0 for Sim(3): (N, 3) -> (N, 3, 7) = [I | -p^ | p].

    Matches reference `loss_utils.py:176-195`.
    """
    I = jnp.broadcast_to(jnp.eye(3, dtype=pts.dtype), pts.shape[:-1] + (3, 3))
    return jnp.concatenate([I, -hat(pts), pts[..., None]], axis=-1)


def quat_to_rot(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (w, x, y, z) -> rotation matrix (…, 3, 3)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )


def rot_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> unit quaternion (w, x, y, z), branch-free.

    Uses the 4-candidate construction and picks the numerically best one with
    `argmax`, so it vmaps and is safe at all rotations.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    qw = jnp.stack([1.0 + tr, 1.0 + m00 - m11 - m22,
                    1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22], axis=-1)
    qw = jnp.sqrt(jnp.maximum(qw, 1e-12)) * 0.5
    cand = jnp.stack(
        [
            jnp.stack([qw[..., 0], (m21 - m12) / (4 * qw[..., 0]),
                       (m02 - m20) / (4 * qw[..., 0]), (m10 - m01) / (4 * qw[..., 0])], -1),
            jnp.stack([(m21 - m12) / (4 * qw[..., 1]), qw[..., 1],
                       (m01 + m10) / (4 * qw[..., 1]), (m02 + m20) / (4 * qw[..., 1])], -1),
            jnp.stack([(m02 - m20) / (4 * qw[..., 2]), (m01 + m10) / (4 * qw[..., 2]),
                       qw[..., 2], (m12 + m21) / (4 * qw[..., 2])], -1),
            jnp.stack([(m10 - m01) / (4 * qw[..., 3]), (m02 + m20) / (4 * qw[..., 3]),
                       (m12 + m21) / (4 * qw[..., 3]), qw[..., 3]], -1),
        ],
        axis=-2,
    )
    best = jnp.argmax(qw, axis=-1)
    q = jnp.take_along_axis(cand, best[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    # canonical sign: w >= 0
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def orthonormalize_so3(R: jnp.ndarray) -> jnp.ndarray:
    """Project a near-rotation back onto SO(3) with two Newton iterations
    of the symmetric orthogonalization R ← R·(3I − RᵀR)/2 (quadratic
    convergence for ‖RᵀR − I‖ < 1; pure matmuls, batch-friendly).

    Pose chains of the form T_t · inv_se3(T_{t−1}) AMPLIFY orthonormality
    error multiplicatively: inv_se3 uses the transpose-inverse, which is
    only exact on SO(3), so an ε defect becomes ~2ε per frame — measured
    doubling per frame on the long-run fixture until tracking collapsed
    (the f32 BA/GN compositions seed ε ≈ 1e-3).  Every producer of a pose
    that re-enters such a chain must re-orthonormalize."""
    eye = jnp.eye(3, dtype=R.dtype)
    for _ in range(2):
        RtR = jnp.einsum("...ji,...jk->...ik", R, R)
        R = 0.5 * jnp.einsum("...ij,...jk->...ik", R, 3.0 * eye - RtR)
    return R


def orthonormalize_se3(T: jnp.ndarray) -> jnp.ndarray:
    """Re-project the rotation block of (…, 4, 4) SE(3) matrices onto
    SO(3) (see orthonormalize_so3); translation untouched."""
    R = orthonormalize_so3(T[..., :3, :3])
    return T.at[..., :3, :3].set(R)
