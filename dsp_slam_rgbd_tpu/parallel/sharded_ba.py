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
