"""Multi-process (DCN-analog) distribution: 2 CPU processes x 4 virtual
devices run the sharded reconstruction + sharded BA over one 8-device
collective and match the single-process result.

Covers SURVEY §2.4's multi-host row: the reference has no multi-process
story at all (single process, pthreads, one GPU); here `jax.distributed`
joins processes and the SAME GSPMD programs span them (gloo collectives on
CPU, DCN/ICI on TPU pods).  BASELINE.md's 2-host scaling target is
exercised in simulation by `tools/bench_scaling.py --processes 2`.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from test_mapping import CAM, sim_ba_problem
from test_parallel import make_batch
from test_recon import CODE_LEN, PARAMS, SPEC

from dsp_slam_rgbd_tpu.mapping import ba
from dsp_slam_rgbd_tpu.parallel import sharded_recon, mesh as meshmod
from dsp_slam_rgbd_tpu.recon.optimizer import ReconConfig

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_sharded_matches_single(tmp_path):
    port = _free_port()
    out = tmp_path / "dist_out.npz"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device split
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "distributed_worker.py"),
             str(r), "2", str(port), str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for r in range(2)
    ]
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=840)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout)
    for p, log in zip(procs, logs):
        assert p.returncode == 0, log[-3000:]
    assert out.exists(), logs[0][-3000:]
    z = np.load(out)

    # single-process references (this process: 8 virtual devices)
    cfg = ReconConfig(code_len=CODE_LEN, num_iterations=3, k4=0.0,
                      cut_off_threshold=0.05, b2=0.05, max_grad_points=256)
    batch = make_batch(B=8)
    m1 = meshmod.make_mesh(n_obj=1, n_ray=1, devices=jax.devices()[:1])
    ref = sharded_recon.reconstruct_sharded(PARAMS, SPEC, cfg, batch, m1)
    np.testing.assert_allclose(z["code"], np.asarray(ref.code), atol=1e-4)
    np.testing.assert_allclose(z["t_cam_obj"], np.asarray(ref.t_cam_obj),
                               atol=1e-4)
    assert z["is_good"].all()

    prob, kf_true, _, _ = sim_ba_problem(np.random.default_rng(11),
                                         stereo=True)
    ref_ba = ba.local_ba(CAM, prob)
    np.testing.assert_allclose(z["kf_pose"], np.asarray(ref_ba.kf_pose),
                               atol=1e-3)
    np.testing.assert_allclose(z["pts"], np.asarray(ref_ba.pts), atol=1e-2)
