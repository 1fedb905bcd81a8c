import numpy as np
import jax.numpy as jnp

from dsp_slam_rgbd_tpu.mapping import map_state as ms
from dsp_slam_rgbd_tpu.utils import checkpoint, timers


def test_stage_timers():
    t = timers.StageTimers()
    with t.stage("a"):
        _ = sum(range(1000))
    with t.stage("a"):
        _ = sum(range(1000))
    with t.stage("b"):
        pass
    s = t.summary()
    assert s["a"]["n"] == 2
    assert s["b"]["n"] == 1
    assert "a" in t.report()


def test_checkpoint_roundtrip(tmp_path):
    st = ms.empty(max_kf=4, max_feat=8, max_pts=16, max_obj=2)
    st = st._replace(
        kf_valid=st.kf_valid.at[1].set(True),
        pt_pos=st.pt_pos.at[3].set(jnp.asarray([1.0, 2.0, 3.0])),
        pt_valid=st.pt_valid.at[3].set(True),
        obj_code=st.obj_code.at[0, :3].set(jnp.asarray([0.1, 0.2, 0.3])),
    )
    p = str(tmp_path / "map.npz")
    checkpoint.save_state(p, st, extra={"frame_id": 42})
    st2, extra = checkpoint.load_state(p)
    assert int(extra["frame_id"]) == 42
    for f in ms.MapState._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(st, f)), np.asarray(getattr(st2, f)),
            err_msg=f,
        )


def test_live_viewer_serves_map():
    """The live HTTP viewer (reference Viewer role on a headless TPU host,
    `src/Viewer.cc:60`) serves the page and a rendered map PNG of the
    current system state."""
    import urllib.request

    from dsp_slam_rgbd_tpu.config import MapConfig, SystemConfig
    from dsp_slam_rgbd_tpu.system.live_viewer import LiveViewer
    from dsp_slam_rgbd_tpu.system.slam import SLAMSystem

    sys_ = SLAMSystem(SystemConfig(
        map=MapConfig(max_kf=4, max_feat=32, max_pts=64, max_obj=2,
                      max_oobs=8)))
    viewer = LiveViewer(sys_, port=0, refresh_s=0.1)
    try:
        import time as _time

        for _ in range(50):  # wait for the first render
            page = urllib.request.urlopen(
                f"http://127.0.0.1:{viewer.port}/", timeout=5).read()
            png = urllib.request.urlopen(
                f"http://127.0.0.1:{viewer.port}/map.png", timeout=5).read()
            if png[:8] == b"\x89PNG\r\n\x1a\n":
                break
            _time.sleep(0.1)
        assert b"live map" in page
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
    finally:
        viewer.close()
