"""Multi-device sharded bundle adjustment.

The TPU analog of "sequence parallelism" for SLAM (SURVEY.md §5): the BA
factor blocks (reprojection observations) shard across devices; each device
accumulates partial normal equations for the same pose/point blocks from its
observation shard, and the blocks reduce with `psum` before the (small)
reduced solve — Schur-complement boundary exchange over ICI.

Implementation: `shard_map` over the `ray` mesh axis with the observation
COO arrays sharded and state replicated; H/b accumulation happens per-shard,
psum merges, and every device runs the identical reduced solve (cheap,
deterministic).  The result is bit-identical to single-device BA up to
reduction order.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dsp_slam_rgbd_tpu.mapping import ba


def shard_problem(prob: ba.BAProblem, mesh: Mesh) -> ba.BAProblem:
    """Place a BAProblem: observations sharded over `ray`, state replicated."""
    obs_sharded = P("ray")
    repl = P()
    specs = ba.BAProblem(
        kf_pose=repl, kf_fixed=repl, kf_valid=repl, pts=repl, pt_valid=repl,
        obs_kf=obs_sharded, obs_pt=obs_sharded, obs_uv=obs_sharded,
        obs_info=obs_sharded, obs_mask=obs_sharded,
        obj_pose=repl, obj_valid=repl, oobs_kf=repl, oobs_obj=repl,
        oobs_t_co=repl, oobs_mask=repl,
    )
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), prob, specs
    )


@partial(jax.jit, static_argnames=("cam", "stage1_iters", "stage2_iters"))
def local_ba_sharded(cam, prob: ba.BAProblem, stage1_iters: int = 5,
                     stage2_iters: int = 10) -> ba.BAResult:
    """Jit the standard local BA over a sharded problem: GSPMD partitions
    the per-observation einsums along the sharded axis and inserts psum for
    the scatter-adds into the replicated H/b blocks automatically."""
    return ba.local_ba(cam, prob, stage1_iters=stage1_iters,
                       stage2_iters=stage2_iters)


def run_sharded_ba(cam, prob: ba.BAProblem, mesh: Mesh, **kw) -> ba.BAResult:
    placed = shard_problem(prob, mesh)
    return local_ba_sharded(cam, placed, **kw)


# ---------------------------------------------------------------------------
# Explicitly sharded global PCG: observation block rows sharded over the
# mesh, Schur boundary exchange as hand-placed psums (SURVEY §2.4).  Unlike
# `run_sharded_ba` (GSPMD auto-partitioning with the reduced solve
# replicated), this one states the communication pattern: one psum merges
# the per-shard normal-equation blocks, one psum per CG matvec merges each
# shard's coupling contributions — the collectives ride ICI within a host
# and DCN across `jax.distributed` processes.
# ---------------------------------------------------------------------------

_EDGE_FIELDS = ("obs_kf", "obs_pt", "obs_uv", "obs_info", "obs_mask",
                "oobs_kf", "oobs_obj", "oobs_t_co", "oobs_mask")


def global_ba_pcg_sharded(cam, prob: ba.BAProblem, mesh: Mesh,
                          axis: str = "ray", stage1_iters: int = 3,
                          stage2_iters: int = 7, cg_iters: int = 32,
                          damping: float = 1e-3) -> ba.BAResult:
    """At-scale global BA with the edge set sharded over `axis`.

    Edge capacities must divide the axis size (they are powers of two).
    Returns a fully-replicated BAResult (edge masks gathered back)."""
    from jax.experimental.shard_map import shard_map

    n_sh = mesh.shape[axis]

    def _pad_edges(p):
        """Pad edge arrays to a multiple of the shard count (masked-out
        rows are inert)."""
        upd = {}
        for group, mask_f in (("obs", "obs_mask"), ("oobs", "oobs_mask")):
            n = getattr(p, mask_f).shape[0]
            pad = (-n) % n_sh
            if pad == 0:
                continue
            for f in _EDGE_FIELDS:
                if not f.startswith(group + "_"):
                    continue
                a = getattr(p, f)
                fill = jnp.zeros((pad,) + a.shape[1:], a.dtype)
                upd[f] = jnp.concatenate([a, fill], axis=0)
        return p._replace(**upd) if upd else p

    n_obs0, n_oobs0 = prob.obs_mask.shape[0], prob.oobs_mask.shape[0]
    prob = _pad_edges(prob)

    in_specs = ba.BAProblem(**{
        f: P(axis) if f in _EDGE_FIELDS else P()
        for f in ba.BAProblem._fields
    })
    out_specs = ba.BAResult(kf_pose=P(), pts=P(), obj_pose=P(),
                            obs_mask=P(axis), oobs_mask=P(axis), cost=P())

    def inner(p):
        def run(p, n):
            def body(i, carry):
                q, lam, cost_p = carry
                cand, _ = ba._pcg_gn_step(cam, q, lam, cg_iters, axis=axis)
                cost_c = jax.lax.psum(ba._robust_cost(cam, cand), axis)
                accept = cost_c <= cost_p
                q_next = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(accept, a, b), cand, q)
                lam_next = jnp.where(accept,
                                     jnp.maximum(lam * 0.5, 1e-5),
                                     jnp.minimum(lam * 8.0, 1e3))
                return (q_next, lam_next,
                        jnp.where(accept, cost_c, cost_p))

            cost0 = jax.lax.psum(ba._robust_cost(cam, p), axis)
            q, _, c = jax.lax.fori_loop(
                0, n, body, (p, jnp.asarray(damping), cost0))
            return q, c

        p, _ = run(p, stage1_iters)
        p = ba._gate(cam, p)       # edgewise: shard-local
        p, cost = run(p, stage2_iters)
        p = ba._gate(cam, p)
        return ba.BAResult(p.kf_pose, p.pts, p.obj_pose, p.obs_mask,
                           p.oobs_mask, cost)

    fn = shard_map(inner, mesh=mesh, in_specs=(in_specs,),
                   out_specs=out_specs, check_rep=False)
    res = jax.jit(fn)(prob)
    return res._replace(obs_mask=res.obs_mask[:n_obs0],
                        oobs_mask=res.oobs_mask[:n_oobs0])
