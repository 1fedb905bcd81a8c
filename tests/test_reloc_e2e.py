"""Tracking-loss + relocalization end-to-end: blank frames break tracking,
then the camera returns to a known viewpoint and PnP relocalization must
recover the pose."""
import numpy as np

from dsp_slam_rgbd_tpu.system.slam import SLAMSystem

from test_system_e2e import BASELINE, STEP, make_cfg, make_texture, render


def test_lost_and_relocalize():
    texture = make_texture(np.random.default_rng(0))
    sys_ = SLAMSystem(make_cfg())
    blank = np.zeros((160, 224), np.float32)

    # phase 1: build a map over 6 frames
    for i in range(6):
        x = i * STEP
        out = sys_.track_stereo(render(texture, x), render(texture, x + BASELINE),
                                timestamp=i * 0.1)
    assert sys_.tracker.status == "OK"
    assert sys_.n_kf >= 1

    # phase 2: blackout -> tracking must be LOST
    for i in range(6, 8):
        out = sys_.track_stereo(blank, blank, timestamp=i * 0.1)
    assert sys_.tracker.status == "LOST"
    assert not out["ok"]

    # phase 3: camera re-appears at a previously mapped viewpoint
    reloc_x = 2 * STEP
    recovered = False
    for i in range(8, 11):
        out = sys_.track_stereo(render(texture, reloc_x),
                                render(texture, reloc_x + BASELINE),
                                timestamp=i * 0.1)
        if out["ok"]:
            recovered = True
            break
    assert recovered, "relocalization failed"
    est_x = -np.asarray(out["frame"].t_cw)[0, 3]
    assert abs(est_x - reloc_x) < 0.08
    assert sys_.tracker.status == "OK"
