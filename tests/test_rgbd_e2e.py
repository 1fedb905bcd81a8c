"""RGB-D end-to-end on the synthetic tilted-plane world (the Redwood-style
config: depth map instead of a right image)."""
import numpy as np

from dsp_slam_rgbd_tpu.system.slam import SLAMSystem

from test_system_e2e import (CAM, FX, H, PLANE_TILT, PLANE_Z, STEP, W,
                             make_cfg, make_texture, render)


def depth_map(cam_x: float) -> np.ndarray:
    """Analytic depth of the tilted plane for every pixel."""
    u, v = np.meshgrid(np.arange(W), np.arange(H))
    dx = (u - CAM.cx) / FX
    t = (PLANE_Z + PLANE_TILT * cam_x) / (1.0 - PLANE_TILT * dx)
    return t.astype(np.float32)


def test_rgbd_e2e_tracking():
    texture = make_texture(np.random.default_rng(0))
    sys_ = SLAMSystem(make_cfg(sensor="rgbd"))
    n = 10
    for i in range(n):
        x = i * STEP
        sys_.track_rgbd(render(texture, x), depth_map(x), timestamp=i * 0.1)
    sys_.flush()

    traj = sys_.tracker.trajectory
    ok = np.asarray([o for _, _, o in traj])
    assert ok.mean() > 0.8
    est_x = np.asarray([-p[0, 3] for _, p, o in traj if o])
    gt_x = np.asarray([t / 0.1 * STEP for t, _, o in traj if o])
    err = np.abs(est_x - gt_x)
    assert err.max() < 0.08
    assert sys_.n_kf >= 2
    # depth-spawned points land on the plane depth range
    z = np.asarray(sys_.state.pt_pos)[np.asarray(sys_.state.pt_valid), 2]
    assert np.isfinite(z).all()
    assert 7.0 < np.median(z) < 14.0
