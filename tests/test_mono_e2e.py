"""Monocular end-to-end: H/F init + up-to-scale tracking on the synthetic
tilted-plane world."""
import numpy as np
import jax.numpy as jnp

from dsp_slam_rgbd_tpu.solvers import sim3
from dsp_slam_rgbd_tpu.system.slam import SLAMSystem

from test_system_e2e import make_cfg, make_texture, render, STEP


def test_mono_e2e():
    texture = make_texture(np.random.default_rng(0))
    cfg = make_cfg(sensor="mono")
    sys_ = SLAMSystem(cfg)
    step = 0.3  # larger baseline per frame: mono needs parallax
    n = 10
    for i in range(n):
        sys_.track_mono(render(texture, i * step), timestamp=i * 0.1)
    sys_.flush()

    traj = sys_.tracker.trajectory
    ok = np.asarray([o for _, _, o in traj])
    assert ok.sum() >= 6  # initialized and kept tracking
    assert sys_.n_kf >= 2

    # up-to-scale trajectory check: align estimated camera centers to ground
    # truth with a Sim(3) (mono scale is free)
    from dsp_slam_rgbd_tpu.ops import lie

    est_c, gt_c = [], []
    for (t, p, o) in traj:
        if not o:
            continue
        est_c.append(np.asarray(lie.inv_se3(jnp.asarray(p)))[:3, 3])
        gt_c.append([t / 0.1 * step, 0.0, 0.0])
    est_c = jnp.asarray(np.stack(est_c))
    gt_c = jnp.asarray(np.asarray(gt_c, np.float32))
    T, ate = sim3.align_trajectories(est_c, gt_c, fix_scale=False)
    # aligned ATE under 8% of the path length
    path_len = float(gt_c[-1, 0] - gt_c[0, 0])
    assert float(ate) < 0.08 * path_len
