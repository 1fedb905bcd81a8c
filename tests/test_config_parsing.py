"""Parse the reference's ACTUAL config files (all dataset flavors)."""
import os

import numpy as np
import pytest

from dsp_slam_rgbd_tpu import config as cfg_mod

REF = "/root/reference/configs"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference configs absent")


def test_kitti_config():
    cfg = cfg_mod.from_reference_yaml_json(
        f"{REF}/KITTI00-02.yaml", f"{REF}/config_kitti.json", "stereo"
    )
    assert abs(cfg.cam.fx - 718.856) < 1e-3
    assert cfg.cam.bf > 300
    assert cfg.orb.n_features == 2000
    assert cfg.recon.k4 == 1e7
    assert cfg.recon.num_iterations == 10
    assert cfg.recon.pose_only_iterations == 5


def test_redwood_config():
    cfg = cfg_mod.from_reference_yaml_json(
        f"{REF}/redwood_01053.yaml", f"{REF}/config_redwood_01053.json",
        "mono",
    )
    assert cfg.recon.k1 == 10.0
    assert cfg.recon.k4 == 0.0
    assert cfg.recon.scale_damping == 100.0
    assert cfg.recon.num_iterations == 5
    assert cfg.cam.fx > 0


def test_freiburg_config_ground_pose():
    cfg = cfg_mod.from_reference_yaml_json(
        f"{REF}/freiburg_001.yaml", f"{REF}/config_freiburg_001.json",
        "mono",
    )
    # the fork's Tworld_camera ground-frame initialization keys
    if cfg.t_world_camera0 is not None:
        T = np.asarray(cfg.t_world_camera0)
        assert T.shape == (4, 4)
        R = T[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)


def test_mono_mask_detection():
    from dsp_slam_rgbd_tpu.system.detections import mono_detection_from_mask

    mask = np.zeros((120, 160), bool)
    mask[40:80, 60:100] = True
    invK = np.linalg.inv(
        np.asarray([[100.0, 0, 80], [0, 100.0, 60], [0, 0, 1]])
    )
    feats = np.asarray([[70.0, 50.0], [10.0, 10.0], [90.0, 70.0]])
    det = mono_detection_from_mask(mask, invK, feats_xy=feats,
                                   erode=2, n_bg=50)
    # only keypoints inside the (eroded) mask
    assert set(det.kp_idx) == {0, 2}
    assert det.bg_rays.shape == (50, 3)
    np.testing.assert_allclose(det.bg_rays[:, 2], 1.0, atol=1e-6)
    assert not det.is_good  # fewer than 20 keypoints
