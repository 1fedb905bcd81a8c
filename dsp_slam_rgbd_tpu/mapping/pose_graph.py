"""Sim(3)/SE(3) pose-graph optimization (essential graph).

Covers the reference `Optimizer::OptimizeEssentialGraph`
(`src/Optimizer.cc:780`: Sim3 vertices over all keyframes, relative-Sim3
edges from the spanning tree / covisibility / loop closures, scale fixed for
stereo) and the relative-pose machinery of `ObjectPoseGraph.h`.

TPU form: all edge residuals e = log_sim3(S_ji · S_i · S_j⁻¹) and their
Jacobians come from one batched `jacfwd` (exact, no hand-derived adjoint
approximations), the normal equations assemble by scatter-add, and the dense
(7K, 7K) system solves on the MXU — K keyframes ≤ a few hundred is small.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from dsp_slam_rgbd_tpu.ops import lie


def _edge_error(xi, Si, Sj, Sji, fix_scale):
    """Residual of one edge with perturbations xi = [ξi (7) | ξj (7)]."""
    if fix_scale:
        # scale component of the perturbation forced to zero
        xi = xi.at[6].set(0.0).at[13].set(0.0)
    Si_p = lie.exp_sim3(xi[:7]) @ Si
    Sj_p = lie.exp_sim3(xi[7:]) @ Sj
    E = Sji @ Si_p @ lie.inv_sim3(Sj_p)
    return lie.log_sim3(E)


class PoseGraphResult(NamedTuple):
    poses: jnp.ndarray   # (K, 4, 4) optimized Sim(3)
    cost: jnp.ndarray


@partial(jax.jit, static_argnames=("n_iters", "fix_scale"))
def optimize_pose_graph(poses, valid, fixed, edge_i, edge_j, edge_meas,
                        edge_mask, edge_weight=None, n_iters: int = 20,
                        fix_scale: bool = False,
                        damping: float = 1e-6) -> PoseGraphResult:
    """GN over Sim(3) poses.

    poses: (K, 4, 4) initial Sim(3) estimates (S_cw convention, like the
    reference's vScw).  edge_meas: (E, 4, 4) measured S_ji such that ideally
    S_ji = S_j · S_i⁻¹.  fixed: (K,) bool — the loop keyframe is held.
    """
    K = poses.shape[0]
    En = edge_i.shape[0]
    if edge_weight is None:
        edge_weight = jnp.ones(En)

    err_and_jac = jax.vmap(
        lambda Si, Sj, Sji: (
            _edge_error(jnp.zeros(14), Si, Sj, Sji, fix_scale),
            jax.jacfwd(_edge_error)(jnp.zeros(14), Si, Sj, Sji, fix_scale),
        )
    )

    w = edge_weight * edge_mask * valid[edge_i] * valid[edge_j]
    fix = fixed | ~valid
    fix7 = jnp.repeat(fix, 7)

    def edge_cost(poses):
        e, _ = err_and_jac(poses[edge_i], poses[edge_j], edge_meas)
        return jnp.sum(jnp.einsum("ed,ed,e->", e, e, w))

    # Levenberg-Marquardt (the reference optimizes the essential graph with
    # g2o's OptimizationAlgorithmLevenberg): a loop closure on a long drift
    # injects large rotation+translation residuals on every edge crossing
    # the warped-group boundary, and pure GN with fixed tiny damping
    # oscillates or diverges there (observed on the long-run fixture).
    def step(_, carry):
        poses, lam, cost_prev = carry
        Si = poses[edge_i]
        Sj = poses[edge_j]
        e, J = err_and_jac(Si, Sj, edge_meas)  # (E, 7), (E, 7, 14)
        Ji = J[:, :, :7]
        Jj = J[:, :, 7:]

        H = jnp.zeros((K, K, 7, 7))
        b = jnp.zeros((K, 7))
        H = H.at[edge_i, edge_i].add(jnp.einsum("edi,edj,e->eij", Ji, Ji, w))
        H = H.at[edge_j, edge_j].add(jnp.einsum("edi,edj,e->eij", Jj, Jj, w))
        Hij = jnp.einsum("edi,edj,e->eij", Ji, Jj, w)
        H = H.at[edge_i, edge_j].add(Hij)
        H = H.at[edge_j, edge_i].add(jnp.swapaxes(Hij, -1, -2))
        b = b.at[edge_i].add(-jnp.einsum("edi,ed,e->ei", Ji, e, w))
        b = b.at[edge_j].add(-jnp.einsum("edi,ed,e->ei", Jj, e, w))

        Hd = H.transpose(0, 2, 1, 3).reshape(K * 7, K * 7)
        Hd = jnp.where(fix7[:, None] | fix7[None, :], 0.0, Hd)
        diag = jnp.where(fix7, 1.0,
                         damping + lam * jnp.maximum(jnp.diag(Hd), 1e-9))
        Hd = Hd + jnp.diag(diag)
        bf = jnp.where(fix7, 0.0, b.reshape(-1))
        dx = jnp.linalg.solve(Hd, bf).reshape(K, 7)
        if fix_scale:
            dx = dx.at[:, 6].set(0.0)
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
        cand = jax.vmap(lambda d, S: lie.exp_sim3(d) @ S)(dx, poses)
        cost_new = edge_cost(cand)
        accept = cost_new < cost_prev
        poses = jnp.where(accept, cand, poses)
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-8), lam * 4.0)
        return poses, lam, jnp.minimum(cost_new, cost_prev)

    poses, _, cost = jax.lax.fori_loop(
        0, n_iters, step, (poses, jnp.asarray(1e-4), edge_cost(poses)))
    return PoseGraphResult(poses, cost)


def relative_sim3(S_j, S_i):
    """Measured S_ji from two absolute poses: S_j · S_i⁻¹."""
    return S_j @ lie.inv_sim3(S_i)
