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


def _sphere_fn(params, inputs):
    xyz = inputs[..., 4:]
    return jnp.linalg.norm(xyz, axis=-1) - 0.5


def _world_with_object(n_member=32):
    """Object at (0,0,5) with member points on its surface."""
    from dsp_slam_rgbd_tpu.models import deepsdf

    st = ms.empty(max_kf=4, max_feat=8, max_pts=64, max_obj=2, code_len=4)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [0, 0, 5]
    rng = np.random.default_rng(0)
    d = rng.standard_normal((n_member, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    pts = pose[:3, 3] + d * 0.55  # slightly off-surface: nonzero |SDF|
    st = st._replace(
        obj_pose=jnp.asarray(np.stack([pose, np.eye(4)])),
        obj_valid=jnp.asarray([True, False]),
        obj_scale=st.obj_scale.at[0].set(1.0),
        pt_pos=st.pt_pos.at[:n_member].set(jnp.asarray(pts)),
        pt_valid=st.pt_valid.at[:n_member].set(True),
        pt_object=st.pt_object.at[:n_member].set(0),
    )
    spec = deepsdf.AnalyticSdfSpec(latent_size=4, fn=_sphere_fn)
    return st, {"layers": []}, spec


def test_rotate_candidates_sweep():
    """37 yaw-divided candidates share the base position; the middle one is
    the base pose itself (angle 0) — reference RotateCandidates."""
    base = np.eye(4, dtype=np.float32)
    base[:3, 3] = [1.0, 2.0, 3.0]
    cands = np.asarray(nbv.rotate_candidates(jnp.asarray(base)))
    assert cands.shape == (37, 4, 4)
    np.testing.assert_allclose(cands[:, :3, 3],
                               np.tile(base[:3, 3], (37, 1)), atol=1e-5)
    np.testing.assert_allclose(cands[18], base, atol=1e-5)
    # headings sweep a half circle: endpoints are ±90° from the base
    f0, fa, fb = base[:3, 2], cands[0][:3, 2], cands[-1][:3, 2]
    assert abs(float(np.dot(f0, fa))) < 1e-4
    assert abs(float(np.dot(f0, fb))) < 1e-4


def test_score_candidates_prefers_visible_uncertainty():
    """A candidate facing the uncertain points out-rewards one facing away."""
    from dsp_slam_rgbd_tpu.ops import camera as cam_ops

    cam = cam_ops.Intrinsics(fx=200.0, fy=200.0, cx=112.0, cy=80.0)
    pts = jnp.asarray(np.asarray([[0, 0, 5.0]] * 8, np.float32))
    err = jnp.ones(8) * 0.3
    mask = jnp.ones(8, bool)
    facing = np.eye(4, dtype=np.float32)          # +z toward the points
    away = np.eye(4, dtype=np.float32)
    away[:3, :3] = np.diag([1.0, -1.0, -1.0])     # rotated 180° about x
    cands = jnp.asarray(np.stack([facing, away]))
    r = np.asarray(nbv.score_candidates(cam, cands,
                                        jnp.asarray(np.eye(4, dtype=np.float32)),
                                        pts, err, mask))
    assert r[0] > r[1]
    assert r[0] > 0.0


def test_nbv_generate_with_candidates():
    """Full generate(): candidates enumerated, rewards computed, the view
    is the argmax candidate."""
    from dsp_slam_rgbd_tpu.ops import camera as cam_ops

    st, params, spec = _world_with_object()
    cam = cam_ops.Intrinsics(fx=200.0, fy=200.0, cx=112.0, cy=80.0)
    plan = nbv.generate(st, np.eye(4), decoder_params=params,
                        decoder_spec=spec, cam=cam)
    assert plan is not None
    assert plan.candidates is not None and plan.candidates.shape == (37, 4, 4)
    assert plan.rewards is not None and plan.rewards.shape == (37,)
    best = int(np.argmax(plan.rewards))
    np.testing.assert_allclose(plan.view_t_wc, plan.candidates[best])
    assert plan.score > 0.0  # off-surface members -> nonzero uncertainty
