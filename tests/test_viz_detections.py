"""Tests for visualization helpers and detection preprocessing."""
import numpy as np
import jax.numpy as jnp

from dsp_slam_rgbd_tpu.system import detections as det_mod
from dsp_slam_rgbd_tpu.system import viz


class _FakeFeats:
    def __init__(self, xy, valid):
        self.xy = xy
        self.valid = valid


class _FakeFrame:
    def __init__(self, xy, valid, pt_idx):
        self.feats = _FakeFeats(xy, valid)
        self.pt_idx = pt_idx


def test_draw_frame():
    img = np.full((60, 80), 100.0, np.float32)
    xy = jnp.asarray([[10.0, 10.0], [40.0, 30.0], [200.0, 10.0]])
    frame = _FakeFrame(xy, jnp.asarray([True, True, True]),
                       jnp.asarray([5, -1, 2]))
    out = viz.draw_frame(img, frame)
    assert out.shape == (60, 80, 3)
    # tracked keypoint drawn green (box around (10,10))
    assert (out[7:14, 7:14, 1] == 255).any()
    # untracked keypoint marked blue-ish
    assert (out[30, 40] == [120, 120, 255]).all()


def test_trajectory_figure(tmp_path):
    poses = np.stack([np.eye(4, dtype=np.float32)] * 5)
    for i in range(5):
        poses[i][0, 3] = -i * 0.5
    pts = np.random.default_rng(0).standard_normal((50, 3)).astype(np.float32)
    out = tmp_path / "traj.png"
    viz.trajectory_figure(poses, pts, str(out))
    assert out.exists() and out.stat().st_size > 1000


def test_make_detection_sim3_scale_split():
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] *= 2.0  # Sim(3) with scale 2
    T[:3, 3] = [1, 2, 3]
    d = det_mod.make_detection(T)
    assert abs(d.scale - 2.0) < 1e-5
    np.testing.assert_allclose(d.t_co[:3, :3], np.eye(3), atol=1e-6)
    np.testing.assert_allclose(d.t_co[:3, 3], [1, 2, 3])


def test_crop_lidar_to_box():
    rng = np.random.default_rng(1)
    velo = rng.uniform(-10, 10, (2000, 3)).astype(np.float32)
    t_co = np.eye(4, dtype=np.float32)
    t_co[:3, 3] = [2.0, 0.0, 5.0]
    extent = [2.0, 2.0, 4.0]
    out = det_mod.crop_lidar_to_box(velo, t_co, extent, margin=1.0)
    local = velo - t_co[:3, 3]
    inside = np.all(np.abs(local) <= np.asarray(extent) / 2.0, axis=1)
    assert len(out) == inside.sum()


def test_sample_background_rays():
    mask = np.zeros((100, 100), bool)
    mask[40:60, 40:60] = True  # object region
    invK = np.linalg.inv(
        np.asarray([[100.0, 0, 50], [0, 100.0, 50], [0, 0, 1]])
    )
    rays = det_mod.sample_background_rays((30, 30, 70, 70), mask, invK,
                                          n_bg=50)
    assert rays.shape == (50, 3)
    # all rays have unit z-scale convention
    np.testing.assert_allclose(rays[:, 2], 1.0, atol=1e-6)
