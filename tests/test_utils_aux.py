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
