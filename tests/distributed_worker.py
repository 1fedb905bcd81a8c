"""Worker entrypoint for the multi-process distribution test.

Each process joins the `jax.distributed` collective (2 processes x 4
virtual CPU devices = 8 global devices), then runs the SAME sharded
reconstruction and sharded BA programs used single-process — GSPMD places
the cross-process collectives (gloo here; DCN/ICI on TPU pods).  Process 0
writes the gathered results for the test to compare against the
single-process reference.

Usage: python distributed_worker.py <rank> <nprocs> <port> <out.npz>
"""
import os
import sys

rank = int(sys.argv[1])
nprocs = int(sys.argv[2])
port = int(sys.argv[3])
out_path = sys.argv[4]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/root/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from dsp_slam_rgbd_tpu.parallel import distributed as dist  # noqa: E402

dist.initialize(f"localhost:{port}", nprocs, rank)
assert len(jax.devices()) == 4 * nprocs, len(jax.devices())

from test_mapping import CAM, sim_ba_problem  # noqa: E402
from test_parallel import make_batch  # noqa: E402
from test_recon import CODE_LEN, PARAMS, SPEC  # noqa: E402

from dsp_slam_rgbd_tpu.mapping import ba  # noqa: E402
from dsp_slam_rgbd_tpu.parallel import sharded_recon  # noqa: E402
from dsp_slam_rgbd_tpu.recon.optimizer import ReconConfig  # noqa: E402

# ---- sharded reconstruction over the global (obj,) mesh ----
cfg = ReconConfig(code_len=CODE_LEN, num_iterations=3, k4=0.0,
                  cut_off_threshold=0.05, b2=0.05, max_grad_points=256)
batch = make_batch(B=8)
mesh = dist.global_mesh("obj")
placed = {k: dist.shard_global(np.asarray(v), mesh) for k, v in batch.items()}
params_r = dist.replicate(jax.tree_util.tree_map(np.asarray, PARAMS), mesh)
res = sharded_recon._recon_batched(params_r, SPEC, cfg, placed)
code = dist.fetch(res.code)
t_co = dist.fetch(res.t_cam_obj)
good = dist.fetch(res.is_good)

# ---- sharded BA: observations sharded over all 8 devices ----
prob, _, _, _ = sim_ba_problem(np.random.default_rng(11), stereo=True)
bmesh = dist.global_mesh("ray")
from jax.sharding import PartitionSpec as P  # noqa: E402

obs_fields = {"obs_kf", "obs_pt", "obs_uv", "obs_info", "obs_mask"}
placed_prob = ba.BAProblem(**{
    f: (dist.shard_global(np.asarray(getattr(prob, f)), bmesh, axis="ray")
        if f in obs_fields else
        dist.replicate(np.asarray(getattr(prob, f)), bmesh))
    for f in ba.BAProblem._fields
})
from dsp_slam_rgbd_tpu.parallel import sharded_ba  # noqa: E402

out_ba = sharded_ba.local_ba_sharded(CAM, placed_prob)
kf_pose = dist.fetch(out_ba.kf_pose)
pts = dist.fetch(out_ba.pts)

if rank == 0:
    np.savez(out_path, code=code, t_cam_obj=t_co, is_good=good,
             kf_pose=kf_pose, pts=pts)
    print("worker0: wrote", out_path, flush=True)
print(f"worker{rank}: done", flush=True)
