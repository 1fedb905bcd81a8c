"""Bundle adjustment: batched Schur-complement Gauss-Newton.

The TPU-native replacement for the reference's g2o solvers
(`src/Optimizer.cc` / `Optimizer_util.cc`):

  * `local_ba` covers LocalBundleAdjustment / LocalJointBundleAdjustment
    (`Optimizer_util.cc:309-771`): KF SE(3) vertices + marginalized point
    vertices + object SE(3) vertices with relative-pose edges
    (`ObjectPoseGraph.h` semantics: error = log(Z⁻¹·T_cw·T_wo), information
    1e3·I₆, Huber δ=√(0.10·1e3)), fixed-frontier keyframes, two-stage
    optimization with χ² outlier gating between stages (:647-657);
  * `global_ba` covers GlobalBundleAdjustemnt/JointBA over all keyframes.

Design: observations are COO triplets with static capacity and masks.  Point
blocks are marginalized in closed form (batched 3x3 solves); the reduced
system couples KF and object pose blocks and is solved densely — the local
window is small (≤ ~32 poses → ≤ 192x192).  Outlier gating is a mask update
between jitted stages, exactly like the reference's two rounds.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from dsp_slam_rgbd_tpu.ops import camera as cam_ops
from dsp_slam_rgbd_tpu.ops import lie

CHI2_MONO = 5.991
CHI2_STEREO = 7.815
OBJ_INFO = 1.0e3                 # information of object edges (1e3·I6)
OBJ_HUBER = (0.10 * 1.0e3) ** 0.5    # Huber δ (reference :80-84)
# (plain float: a module-level jnp op would initialize the XLA backend
# at import, breaking jax.distributed.initialize-before-first-use)
OBJ_CHI2_PRUNE = 1.0e3           # object-edge prune threshold (:647-657)


class BAProblem(NamedTuple):
    """Static-capacity BA problem. K poses, P points, O objects."""
    kf_pose: jnp.ndarray      # (K, 4, 4) T_cw
    kf_fixed: jnp.ndarray     # (K,) bool — fixed frontier / first KF
    kf_valid: jnp.ndarray     # (K,) bool
    pts: jnp.ndarray          # (P, 3) world
    pt_valid: jnp.ndarray     # (P,) bool
    # reprojection edges (N,)
    obs_kf: jnp.ndarray       # (N,) int32 -> K
    obs_pt: jnp.ndarray       # (N,) int32 -> P
    obs_uv: jnp.ndarray       # (N, 3) (u, v, uR); uR = −1 for mono edges
    obs_info: jnp.ndarray     # (N,) 1/σ² per edge
    obs_mask: jnp.ndarray     # (N,) bool
    # object pose edges (M,)
    obj_pose: jnp.ndarray     # (O, 4, 4) T_wo (world→object? see note)
    obj_valid: jnp.ndarray    # (O,) bool
    oobs_kf: jnp.ndarray      # (M,) int32 -> K
    oobs_obj: jnp.ndarray     # (M,) int32 -> O
    oobs_t_co: jnp.ndarray    # (M, 4, 4) measured camera→object SE(3)
    oobs_mask: jnp.ndarray    # (M,) bool


class BAResult(NamedTuple):
    kf_pose: jnp.ndarray
    pts: jnp.ndarray
    obj_pose: jnp.ndarray
    obs_mask: jnp.ndarray     # post-gating reprojection inliers
    oobs_mask: jnp.ndarray    # post-gating object edges
    cost: jnp.ndarray


def _reproj_terms(cam, prob: BAProblem):
    """Per-edge residuals/Jacobians for current state.

    Returns res (N, 3), J_c (N, 3, 6), J_p (N, 3, 3), w_dim (N, 3) row mask
    (third row zeroed for mono edges).
    """
    Tk = prob.kf_pose[prob.obs_kf]          # (N, 4, 4)
    pw = prob.pts[prob.obs_pt]              # (N, 3)
    pc = jnp.einsum("nij,nj->ni", Tk[:, :3, :3], pw) + Tk[:, :3, 3]
    x, y, z = pc[:, 0], pc[:, 1], pc[:, 2]
    zi = 1.0 / jnp.maximum(z, 1e-6)
    zi2 = zi * zi
    u = cam.fx * x * zi + cam.cx
    v = cam.fy * y * zi + cam.cy
    ur = u - cam.bf * zi
    pred = jnp.stack([u, v, ur], axis=-1)
    res = pred - prob.obs_uv
    stereo = prob.obs_uv[:, 2] >= 0.0
    row_mask = jnp.stack(
        [jnp.ones_like(stereo), jnp.ones_like(stereo), stereo], -1
    ).astype(jnp.float32)
    res = res * row_mask

    du = jnp.stack([cam.fx * zi, jnp.zeros_like(z), -cam.fx * x * zi2], -1)
    dv = jnp.stack([jnp.zeros_like(z), cam.fy * zi, -cam.fy * y * zi2], -1)
    dur = du + jnp.stack(
        [jnp.zeros_like(z), jnp.zeros_like(z), cam.bf * zi2], -1
    )
    dpred_dpc = jnp.stack([du, dv, dur], axis=-2)  # (N, 3, 3)
    dpred_dpc = dpred_dpc * row_mask[..., None]
    Jc = jnp.einsum("ndk,nkj->ndj", dpred_dpc,
                    lie.points_to_pose_jacobian_se3(pc))  # (N, 3, 6)
    Jp = jnp.einsum("ndk,nkj->ndj", dpred_dpc, Tk[:, :3, :3])  # (N, 3, 3)
    return res, Jc, Jp, row_mask


def _object_terms(prob: BAProblem):
    """Object relative-pose edges: e = log(Z⁻¹ · T_cw · T_wo) ∈ se(3).

    Convention: obj_pose = T_wo (object frame → world), so
    T_co_est = T_cw @ T_wo and e = log(Z⁻¹ · T_co_est); Jacobians wrt left
    perturbations of T_cw and of T_wo (right-perturbation pulled to left via
    adjoints, matching `ObjectPoseGraph.h:75-88`'s adjoint structure).
    """
    Tk = prob.kf_pose[prob.oobs_kf]         # (M, 4, 4) T_cw
    To = prob.obj_pose[prob.oobs_obj]       # (M, 4, 4) T_wo
    Z = prob.oobs_t_co                       # (M, 4, 4)
    T_co = jnp.einsum("nij,njk->nik", Tk, To)
    E = jnp.einsum("nij,njk->nik", jax.vmap(lie.inv_se3)(Z), T_co)
    e = jax.vmap(lie.log_se3)(E)            # (M, 6)
    # J wrt ξ_k (left pert of T_cw): d log(Z⁻¹ exp(ξ) T_co) ≈ J_l⁻¹ Ad(Z⁻¹) ξ
    # ≈ Ad(Z⁻¹) for small e (reference uses the same first-order adjoint
    # approximation with J_l⁻¹ ≈ I).
    Ad_Zinv = jax.vmap(lie.adjoint_se3)(jax.vmap(lie.inv_se3)(Z))  # (M, 6, 6)
    Jk = Ad_Zinv
    # J wrt η (left pert of T_wo): T_cw exp(η) T_wo = exp(Ad(T_cw) η) T_co
    Ad_k = jax.vmap(lie.adjoint_se3)(Tk)
    Jo = jnp.einsum("nij,njk->nik", Ad_Zinv, Ad_k)
    return e, Jk, Jo


def _assemble_and_solve(cam, prob: BAProblem, damping: float):
    """One GN step over (K+O) pose blocks with marginalized points."""
    K = prob.kf_pose.shape[0]
    P = prob.pts.shape[0]
    O = prob.obj_pose.shape[0]
    B = K + O  # pose-block count

    res, Jc, Jp, row_mask = _reproj_terms(cam, prob)
    # robust weight (Huber on χ²), edge weight
    chi2 = jnp.sum(res * res, -1) * prob.obs_info
    en = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    stereo = prob.obs_uv[:, 2] >= 0.0
    delta = jnp.where(stereo, jnp.sqrt(CHI2_STEREO), jnp.sqrt(CHI2_MONO))
    w_rob = jnp.where(en <= delta, 1.0, delta / en)
    w = prob.obs_info * w_rob * prob.obs_mask
    w = w * prob.pt_valid[prob.obs_pt] * prob.kf_valid[prob.obs_kf]

    # accumulate blocks
    Hcc = jnp.zeros((B, 6, 6))
    bc = jnp.zeros((B, 6))
    Hpp = jnp.zeros((P, 3, 3))
    bp = jnp.zeros((P, 3))
    Hcp = jnp.zeros((B, P, 6, 3))

    JcT_Jc = jnp.einsum("ndi,ndj,n->nij", Jc, Jc, w)
    JpT_Jp = jnp.einsum("ndi,ndj,n->nij", Jp, Jp, w)
    JcT_Jp = jnp.einsum("ndi,ndj,n->nij", Jc, Jp, w)
    JcT_r = jnp.einsum("ndi,nd,n->ni", Jc, res, w)
    JpT_r = jnp.einsum("ndi,nd,n->ni", Jp, res, w)

    Hcc = Hcc.at[prob.obs_kf].add(JcT_Jc)
    bc = bc.at[prob.obs_kf].add(-JcT_r)
    Hpp = Hpp.at[prob.obs_pt].add(JpT_Jp)
    bp = bp.at[prob.obs_pt].add(-JpT_r)
    Hcp = Hcp.at[prob.obs_kf, prob.obs_pt].add(JcT_Jp)

    # object edges (couple pose blocks k and K+o: both land in the reduced
    # system directly)
    e_o, Jk_o, Jo_o = _object_terms(prob)
    chi2_o = OBJ_INFO * jnp.sum(e_o * e_o, -1)
    en_o = jnp.sqrt(jnp.maximum(chi2_o, 1e-12))
    w_rob_o = jnp.where(en_o <= OBJ_HUBER, 1.0, OBJ_HUBER / en_o)
    w_o = OBJ_INFO * w_rob_o * prob.oobs_mask \
        * prob.obj_valid[prob.oobs_obj] * prob.kf_valid[prob.oobs_kf]

    S = jnp.zeros((B, B, 6, 6))
    kk = jnp.einsum("ndi,ndj,n->nij", Jk_o, Jk_o, w_o)
    oo = jnp.einsum("ndi,ndj,n->nij", Jo_o, Jo_o, w_o)
    ko = jnp.einsum("ndi,ndj,n->nij", Jk_o, Jo_o, w_o)
    Hcc = Hcc.at[prob.oobs_kf].add(kk)
    Hcc = Hcc.at[K + prob.oobs_obj].add(oo)
    S = S.at[prob.oobs_kf, K + prob.oobs_obj].add(ko)
    S = S.at[K + prob.oobs_obj, prob.oobs_kf].add(
        jnp.swapaxes(ko, -1, -2)
    )
    bc = bc.at[prob.oobs_kf].add(-jnp.einsum("ndi,nd->ni", Jk_o, e_o * w_o[:, None]))
    bc = bc.at[K + prob.oobs_obj].add(-jnp.einsum("ndi,nd->ni", Jo_o, e_o * w_o[:, None]))

    # marginalize points: S −= Hcp Hpp⁻¹ Hcpᵀ ; bc −= Hcp Hpp⁻¹ bp
    eye3 = jnp.eye(3)
    pt_live = prob.pt_valid
    Hpp_d = Hpp + 1e-6 * eye3
    Hpp_d = jnp.where(pt_live[:, None, None], Hpp_d, eye3)
    Hpp_inv = jnp.linalg.inv(Hpp_d)
    HcpHinv = jnp.einsum("bpij,pjk->bpik", Hcp, Hpp_inv)  # (B, P, 6, 3)
    S = S - jnp.einsum("bpik,cpjk->bcij", HcpHinv, Hcp)
    bc_red = bc - jnp.einsum("bpik,pk->bi", HcpHinv, bp)
    # diagonal blocks carry the unary Hcc terms
    S = S.at[jnp.arange(B), jnp.arange(B)].add(Hcc)

    # fix poses: fixed KFs and invalid blocks get identity rows (no update)
    fixed = jnp.concatenate(
        [prob.kf_fixed | ~prob.kf_valid, ~prob.obj_valid], axis=0
    )  # (B,)
    Sd = S.transpose(0, 2, 1, 3).reshape(B * 6, B * 6)
    bflat = bc_red.reshape(B * 6)
    fix6 = jnp.repeat(fixed, 6)
    Sd = jnp.where(fix6[:, None] | fix6[None, :], 0.0, Sd)
    # LM-style multiplicative damping (g2o: λ·diag).  An absolute-only
    # floor leaves near-null gauge directions (mono scale!) at the mercy of
    # f32 summation noise in S — the solved step along those directions then
    # depends on edge order.  λ·diag dominates the noise at every scale.
    dg = jnp.maximum(jnp.diag(Sd), 1e-6)
    Sd = Sd + jnp.diag(jnp.where(fix6, 1.0, damping * dg + 1e-4))
    bflat = jnp.where(fix6, 0.0, bflat)

    dx = jnp.linalg.solve(Sd, bflat)
    dx = jnp.where(jnp.isfinite(dx), dx, 0.0).reshape(B, 6)

    # back-substitute points: dp = Hpp⁻¹ (bp − Hcpᵀ dc)
    dc_kf = dx[:K]
    Hcp_dc = jnp.einsum("bpik,bi->pk", Hcp, dx)
    dp = jnp.einsum("pij,pj->pi", Hpp_inv, bp - Hcp_dc)
    dp = jnp.where(pt_live[:, None] & jnp.all(jnp.isfinite(dp), -1,
                                              keepdims=True), dp, 0.0)

    # apply updates
    new_kf = jax.vmap(lambda d, T: lie.exp_se3(d) @ T)(dc_kf, prob.kf_pose)
    new_obj = jax.vmap(lambda d, T: lie.exp_se3(d) @ T)(dx[K:], prob.obj_pose)
    new_pts = prob.pts + dp

    live = prob.obs_mask & (prob.pt_valid[prob.obs_pt]) \
        & prob.kf_valid[prob.obs_kf]
    cost = jnp.sum(jnp.where(live, chi2, 0.0)) \
        + jnp.sum(jnp.where(prob.oobs_mask, chi2_o, 0.0))
    return prob._replace(kf_pose=new_kf, obj_pose=new_obj, pts=new_pts), cost


def _gate(cam, prob: BAProblem):
    """χ² outlier gating of both edge types (reference :647-736)."""
    res, _, _, _ = _reproj_terms(cam, prob)
    chi2 = jnp.sum(res * res, -1) * prob.obs_info
    stereo = prob.obs_uv[:, 2] >= 0.0
    th = jnp.where(stereo, CHI2_STEREO, CHI2_MONO)
    # positive depth requirement as in the reference
    Tk = prob.kf_pose[prob.obs_kf]
    pc = jnp.einsum("nij,nj->ni", Tk[:, :3, :3], prob.pts[prob.obs_pt]) \
        + Tk[:, :3, 3]
    obs_mask = prob.obs_mask & (chi2 <= th) & (pc[:, 2] > 0)

    e_o, _, _ = _object_terms(prob)
    chi2_o = OBJ_INFO * jnp.sum(e_o * e_o, -1)
    oobs_mask = prob.oobs_mask & (chi2_o <= OBJ_CHI2_PRUNE)
    return prob._replace(obs_mask=obs_mask, oobs_mask=oobs_mask)


def _robust_cost(cam, prob: BAProblem):
    """Huber-robustified total cost — the LM acceptance metric."""
    res, _, _, _ = _reproj_terms(cam, prob)
    chi2 = jnp.sum(res * res, -1) * prob.obs_info
    en = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    stereo = prob.obs_uv[:, 2] >= 0.0
    delta = jnp.where(stereo, jnp.sqrt(CHI2_STEREO), jnp.sqrt(CHI2_MONO))
    rho = jnp.where(en <= delta, chi2, 2.0 * delta * en - delta * delta)
    live = prob.obs_mask & prob.pt_valid[prob.obs_pt] \
        & prob.kf_valid[prob.obs_kf]
    e_o, _, _ = _object_terms(prob)
    chi2_o = OBJ_INFO * jnp.sum(e_o * e_o, -1)
    en_o = jnp.sqrt(jnp.maximum(chi2_o, 1e-12))
    rho_o = jnp.where(en_o <= OBJ_HUBER, chi2_o,
                      2.0 * OBJ_HUBER * en_o - OBJ_HUBER * OBJ_HUBER)
    live_o = prob.oobs_mask * prob.obj_valid[prob.oobs_obj] \
        * prob.kf_valid[prob.oobs_kf]
    return jnp.sum(jnp.where(live, rho, 0.0)) \
        + jnp.sum(jnp.where(live_o, rho_o, 0.0))


@partial(jax.jit, static_argnames=("cam", "stage1_iters", "stage2_iters"))
def local_ba(cam, prob: BAProblem, stage1_iters: int = 5,
             stage2_iters: int = 10, damping: float = 1e-3) -> BAResult:
    """Two-stage robust BA (reference `LocalJointBundleAdjustment`
    :309-771: 5 iters → gate outliers → 10 iters → final gate).

    Each stage is TRUE Levenberg-Marquardt, not fixed-λ GN: a step is
    accepted only if the Huber cost decreases (λ halves), otherwise the
    state is kept and λ grows 8×.  Fixed-λ GN measurably DIVERGED on
    weak-geometry windows (dense keyframe runs over near-coplanar
    structure: the long-run circuit fixture blew the map up to 100 px
    median reprojection in a single keyframe's BA) — g2o gets the same
    protection from its own LM loop."""

    def run(prob, n):
        def body(i, carry):
            p, lam, cost_p = carry
            cand, _ = _assemble_and_solve(cam, p, lam)
            cost_c = _robust_cost(cam, cand)
            accept = cost_c <= cost_p
            p_next = jax.tree_util.tree_map(
                lambda a, b: jnp.where(accept, a, b), cand, p)
            lam_next = jnp.where(accept,
                                 jnp.maximum(lam * 0.5, 1e-5),
                                 jnp.minimum(lam * 8.0, 1e3))
            return (p_next, lam_next, jnp.where(accept, cost_c, cost_p))

        cost0 = _robust_cost(cam, prob)
        p, _, c = jax.lax.fori_loop(
            0, n, body, (prob, jnp.asarray(damping), cost0))
        return p, c

    prob, _ = run(prob, stage1_iters)
    prob = _gate(cam, prob)
    prob, cost = run(prob, stage2_iters)
    prob = _gate(cam, prob)
    return BAResult(prob.kf_pose, prob.pts, prob.obj_pose, prob.obs_mask,
                    prob.oobs_mask, cost)


def global_ba(cam, prob: BAProblem, n_iters: int = 20, damping: float = 1e-3):
    """Global (joint) BA — same machinery over the full problem
    (reference `GlobalJointBundleAdjustemnt` `Optimizer_util.cc:36-42`).
    Dense reduced system: use only when K+O is small (≲ 100 pose blocks);
    `global_ba_pcg` below is the at-scale path."""
    return local_ba(cam, prob, stage1_iters=n_iters // 2,
                    stage2_iters=n_iters - n_iters // 2, damping=damping)


# ---------------------------------------------------------------------------
# Matrix-free PCG Schur solver — the at-scale global BA path.
#
# The dense path materializes the reduced system S (B, B, 6, 6) and the
# camera-point coupling Hcp (B, P, 6, 3): O(B²) / O(B·P) memory, which caps
# B at ~100 pose blocks.  Here S is never formed: every S·x product is three
# edgewise gather/scatter passes over the COO observation list (O(N) work,
# O(N) memory), preconditioned with the EXACT Schur block diagonal (exact
# because each (kf, pt) pair appears at most once, so the point
# marginalization's diagonal contribution is a single edgewise scatter).
# This is how a KITTI-00-sized map (≥1.3k KFs, ≥100k points, ~1M edges)
# fits one chip: ~50 f32/edge of per-edge blocks instead of a 600 MB dense
# reduced system + a (B·6)³ factorization.
# ---------------------------------------------------------------------------


def _pcg_gn_step(cam, prob: BAProblem, damping: float, cg_iters: int,
                 axis: str | None = None):
    """One GN step of the reduced (pose+object) system via PCG.

    axis: when set (inside `shard_map`), the observation/object-edge arrays
    of `prob` are SHARDS and every edge-derived reduction crosses shards
    with an explicit `lax.psum` over `axis` — the Schur-complement
    boundary exchange of SURVEY §2.4 riding ICI/DCN: one psum to merge the
    assembled normal-equation blocks, one per CG matvec to merge each
    shard's coupling contributions.  Pose/point state stays replicated
    (the reduced vector is (B, 6) — tiny next to the edge set)."""
    ps = (lambda t: jax.lax.psum(t, axis)) if axis is not None \
        else (lambda t: t)
    K = prob.kf_pose.shape[0]
    P = prob.pts.shape[0]
    O = prob.obj_pose.shape[0]
    B = K + O

    res, Jc, Jp, _ = _reproj_terms(cam, prob)
    chi2 = jnp.sum(res * res, -1) * prob.obs_info
    en = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    stereo = prob.obs_uv[:, 2] >= 0.0
    delta = jnp.where(stereo, jnp.sqrt(CHI2_STEREO), jnp.sqrt(CHI2_MONO))
    w_rob = jnp.where(en <= delta, 1.0, delta / en)
    w = prob.obs_info * w_rob * prob.obs_mask
    w = w * prob.pt_valid[prob.obs_pt] * prob.kf_valid[prob.obs_kf]

    # per-edge weighted blocks (the only O(N) state PCG needs)
    Ccc = jnp.einsum("ndi,ndj,n->nij", Jc, Jc, w)   # (N, 6, 6)
    Cpp = jnp.einsum("ndi,ndj,n->nij", Jp, Jp, w)   # (N, 3, 3)
    Ccp = jnp.einsum("ndi,ndj,n->nij", Jc, Jp, w)   # (N, 6, 3)
    gc = jnp.einsum("ndi,nd,n->ni", Jc, res, w)     # (N, 6)
    gp = jnp.einsum("ndi,nd,n->ni", Jp, res, w)

    Hcc = jnp.zeros((B, 6, 6)).at[prob.obs_kf].add(Ccc)
    bc = jnp.zeros((B, 6)).at[prob.obs_kf].add(-gc)
    Hpp = jnp.zeros((P, 3, 3)).at[prob.obs_pt].add(Cpp)
    bp = jnp.zeros((P, 3)).at[prob.obs_pt].add(-gp)

    # object relative-pose edges couple blocks (kf, K+obj)
    e_o, Jk_o, Jo_o = _object_terms(prob)
    chi2_o = OBJ_INFO * jnp.sum(e_o * e_o, -1)
    en_o = jnp.sqrt(jnp.maximum(chi2_o, 1e-12))
    w_rob_o = jnp.where(en_o <= OBJ_HUBER, 1.0, OBJ_HUBER / en_o)
    w_o = OBJ_INFO * w_rob_o * prob.oobs_mask \
        * prob.obj_valid[prob.oobs_obj] * prob.kf_valid[prob.oobs_kf]
    kk = jnp.einsum("ndi,ndj,n->nij", Jk_o, Jk_o, w_o)
    oo = jnp.einsum("ndi,ndj,n->nij", Jo_o, Jo_o, w_o)
    ko = jnp.einsum("ndi,ndj,n->nij", Jk_o, Jo_o, w_o)   # (M, 6, 6)
    Hcc = Hcc.at[prob.oobs_kf].add(kk)
    Hcc = Hcc.at[K + prob.oobs_obj].add(oo)
    bc = bc.at[prob.oobs_kf].add(
        -jnp.einsum("ndi,nd->ni", Jk_o, e_o * w_o[:, None])
    )
    bc = bc.at[K + prob.oobs_obj].add(
        -jnp.einsum("ndi,nd->ni", Jo_o, e_o * w_o[:, None])
    )

    # boundary exchange #1: merge per-shard normal-equation blocks
    Hcc, bc, Hpp, bp = ps((Hcc, bc, Hpp, bp))

    eye3 = jnp.eye(3)
    pt_live = prob.pt_valid
    Hpp_d = Hpp + 1e-6 * eye3
    Hpp_d = jnp.where(pt_live[:, None, None], Hpp_d, eye3)
    Hpp_inv = jnp.linalg.inv(Hpp_d)

    # reduced RHS: bc − Hcp Hpp⁻¹ bp, edgewise (edge part crosses shards)
    hb = jnp.einsum("pij,pj->pi", Hpp_inv, bp)           # (P, 3)
    bc_red = bc - ps(jnp.zeros((B, 6)).at[prob.obs_kf].add(
        jnp.einsum("nij,nj->ni", Ccp, hb[prob.obs_pt])
    ))

    fixed = jnp.concatenate(
        [prob.kf_fixed | ~prob.kf_valid, ~prob.obj_valid], axis=0
    )  # (B,)
    free = ~fixed

    # exact Schur block diagonal (one edge per (kf, pt) pair → edgewise)
    contrib = jnp.einsum(
        "nij,njk,nlk->nil", Ccp, Hpp_inv[prob.obs_pt], Ccp
    )  # (N, 6, 6)
    Sdiag0 = Hcc - ps(
        jnp.zeros((B, 6, 6)).at[prob.obs_kf].add(contrib))
    # LM-style multiplicative damping (see the dense path): λ·diag + floor
    dvec = jnp.maximum(
        jnp.diagonal(Sdiag0, axis1=-2, axis2=-1), 1e-6
    )  # (B, 6)
    damp_vec = damping * dvec + 1e-4
    eye6 = jnp.eye(6)
    Sdiag = Sdiag0 + jax.vmap(jnp.diag)(damp_vec)
    Minv = jnp.linalg.inv(jnp.where(free[:, None, None], Sdiag, eye6))

    def matvec(x):
        x = jnp.where(free[:, None], x, 0.0)
        y = jnp.einsum("bij,bj->bi", Hcc, x)
        # boundary exchange #2 (per CG iteration): each shard's coupling
        # contributions merge via psum — first the point-side accumulation,
        # then the pose-side products
        u = ps(jnp.zeros((P, 3)).at[prob.obs_pt].add(
            jnp.einsum("nij,ni->nj", Ccp, x[prob.obs_kf])
        ))
        v = jnp.einsum("pij,pj->pi", Hpp_inv, u)
        y_edge = jnp.zeros((B, 6)).at[prob.obs_kf].add(
            -jnp.einsum("nij,nj->ni", Ccp, v[prob.obs_pt])
        )
        y_edge = y_edge.at[prob.oobs_kf].add(
            jnp.einsum("mij,mj->mi", ko, x[K + prob.oobs_obj])
        )
        y_edge = y_edge.at[K + prob.oobs_obj].add(
            jnp.einsum("mij,mi->mj", ko, x[prob.oobs_kf])
        )
        y = y + ps(y_edge) + damp_vec * x
        return jnp.where(free[:, None], y, 0.0)

    b = jnp.where(free[:, None], bc_red, 0.0)

    def dot(a, b_):
        return jnp.sum(a * b_)

    def cg_body(_, carry):
        x, r, z, p, rz = carry
        Ap = matvec(p)
        alpha = rz / jnp.maximum(dot(p, Ap), 1e-20)
        x = x + alpha * p
        r = r - alpha * Ap
        z = jnp.einsum("bij,bj->bi", Minv, r)
        rz_new = dot(r, z)
        beta = rz_new / jnp.maximum(rz, 1e-20)
        p = z + beta * p
        return x, r, z, p, rz_new

    x0 = jnp.zeros((B, 6))
    z0 = jnp.einsum("bij,bj->bi", Minv, b)
    dx, *_ = jax.lax.fori_loop(
        0, cg_iters, cg_body, (x0, b, z0, z0, dot(b, z0))
    )
    dx = jnp.where(jnp.isfinite(dx), dx, 0.0)

    # back-substitute points: dp = Hpp⁻¹ (bp − Hcpᵀ dc), edgewise
    u = ps(jnp.zeros((P, 3)).at[prob.obs_pt].add(
        jnp.einsum("nij,ni->nj", Ccp, dx[prob.obs_kf])
    ))
    dp = jnp.einsum("pij,pj->pi", Hpp_inv, bp - u)
    dp = jnp.where(
        pt_live[:, None] & jnp.all(jnp.isfinite(dp), -1, keepdims=True),
        dp, 0.0,
    )

    new_kf = jax.vmap(lambda d, T: lie.exp_se3(d) @ T)(dx[:K], prob.kf_pose)
    new_obj = jax.vmap(lambda d, T: lie.exp_se3(d) @ T)(dx[K:],
                                                        prob.obj_pose)
    new_pts = prob.pts + dp

    live = prob.obs_mask & prob.pt_valid[prob.obs_pt] \
        & prob.kf_valid[prob.obs_kf]
    cost = ps(jnp.sum(jnp.where(live, chi2, 0.0))
              + jnp.sum(jnp.where(prob.oobs_mask, chi2_o, 0.0)))
    return prob._replace(kf_pose=new_kf, obj_pose=new_obj, pts=new_pts), cost


@partial(jax.jit, static_argnames=("cam", "stage1_iters", "stage2_iters",
                                   "cg_iters"))
def _global_ba_pcg_jit(cam, prob: BAProblem, stage1_iters: int,
                       stage2_iters: int, cg_iters: int,
                       damping: float) -> BAResult:
    def run(prob, n):
        # LM step control, like local_ba: a PCG-GN step is accepted only
        # if the Huber cost decreases (fixed-λ GN diverges the same way
        # on weak geometry — see local_ba)
        def body(i, carry):
            p, lam, cost_p = carry
            cand, _ = _pcg_gn_step(cam, p, lam, cg_iters)
            cost_c = _robust_cost(cam, cand)
            accept = cost_c <= cost_p
            p_next = jax.tree_util.tree_map(
                lambda a, b: jnp.where(accept, a, b), cand, p)
            lam_next = jnp.where(accept,
                                 jnp.maximum(lam * 0.5, 1e-5),
                                 jnp.minimum(lam * 8.0, 1e3))
            return (p_next, lam_next, jnp.where(accept, cost_c, cost_p))

        cost0 = _robust_cost(cam, prob)
        p, _, c = jax.lax.fori_loop(
            0, n, body, (prob, jnp.asarray(damping), cost0))
        return p, c

    prob, _ = run(prob, stage1_iters)
    prob = _gate(cam, prob)
    prob, cost = run(prob, stage2_iters)
    prob = _gate(cam, prob)
    return BAResult(prob.kf_pose, prob.pts, prob.obj_pose, prob.obs_mask,
                    prob.oobs_mask, cost)


def global_ba_pcg(cam, prob: BAProblem, n_iters: int = 10,
                  cg_iters: int = 48, damping: float = 3e-3) -> BAResult:
    """Global joint BA at scale: two-stage robust GN (gate between stages,
    like the reference's 5+10 scheme) with each step's reduced system solved
    matrix-free by block-Jacobi-preconditioned CG."""
    return _global_ba_pcg_jit(cam, prob, max(n_iters // 2, 1),
                              max(n_iters - n_iters // 2, 1), cg_iters,
                              damping)
