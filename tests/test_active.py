import numpy as np
import jax.numpy as jnp

from dsp_slam_rgbd_tpu.active import nbv, rrt
from dsp_slam_rgbd_tpu.mapping import map_state as ms


def test_rrt_straight_line_no_obstacles():
    res = rrt.plan([0, 0, 0], [3, 0, 0], [], step=0.5, seed=1)
    assert res.path is not None
    np.testing.assert_allclose(res.path[0], [0, 0, 0])
    np.testing.assert_allclose(res.path[-1], [3, 0, 0])


def test_rrt_avoids_obstacle():
    box = rrt.BoxObstacle(center=np.asarray([1.5, 0, 0], np.float32),
                          R=np.eye(3, dtype=np.float32),
                          half=np.asarray([0.5, 1.0, 1.0], np.float32))
    res = rrt.plan([0, 0, 0], [3, 0, 0], [box], step=0.4, seed=2,
                   max_iters=5000)
    assert res.path is not None
    # no waypoint inside the box
    local = np.abs(res.path - box.center)
    inside = np.all(local <= box.half, axis=1)
    assert not inside.any()


def test_rrt_fails_when_goal_enclosed():
    box = rrt.BoxObstacle(center=np.asarray([3, 0, 0], np.float32),
                          R=np.eye(3, dtype=np.float32),
                          half=np.asarray([1.0, 1.0, 1.0], np.float32))
    res = rrt.plan([0, 0, 0], [3, 0, 0], [box], step=0.4, seed=3,
                   max_iters=300)
    assert res.path is None


def test_nbv_generate():
    st = ms.empty(max_kf=4, max_feat=8, max_pts=16, max_obj=2)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [0, 0, 5]
    st = st._replace(
        obj_pose=jnp.asarray(np.stack([pose, np.eye(4)])),
        obj_valid=jnp.asarray([True, False]),
    )
    plan = nbv.generate(st, np.eye(4))
    assert plan is not None
    assert plan.target_obj == 0
    # NBV is the reflected viewpoint behind the object
    np.testing.assert_allclose(plan.view_t_wc[:3, 3], [0, 0, 10], atol=1e-4)
    assert plan.path is not None


def test_nbv_none_without_objects():
    st = ms.empty(max_kf=4, max_feat=8, max_pts=16, max_obj=2)
    assert nbv.generate(st, np.eye(4)) is None
