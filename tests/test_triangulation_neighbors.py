"""Multi-neighbor triangulation (reference `CreateNewMapPoints`,
`src/LocalMapping.cc:259`: nn = 10/20 best covisible neighbors) and
multi-KF culling (`KeyFrameCulling` :684, sequential over local KFs)."""
import jax.numpy as jnp
import numpy as np

from dsp_slam_rgbd_tpu.mapping import local_mapping as lm
from dsp_slam_rgbd_tpu.mapping import map_state as ms
from dsp_slam_rgbd_tpu.ops import camera as cam_ops
from dsp_slam_rgbd_tpu.ops import lie

CAM = cam_ops.Intrinsics(fx=100.0, fy=100.0, cx=64.0, cy=48.0, bf=0.0)


def _pose_at(x):
    T = np.eye(4, dtype=np.float32)
    T[0, 3] = -x  # T_cw for a camera at world (x, 0, 0)
    return T


def _build_state(rng):
    """4 KFs along x.  20 shared points keep every pair covisible
    (weight >= MIN_WEIGHT); each neighbor KF additionally shares 10
    exclusive unmatched feature pairs with the new KF 3 — triangulable
    only against THAT neighbor."""
    st = ms.empty(max_kf=8, max_feat=64, max_pts=256, max_obj=2)
    kf_x = [0.0, 0.5, 1.0, 1.5]
    shared = np.stack([
        rng.uniform(-2, 2, 20), rng.uniform(-1.5, 1.5, 20),
        rng.uniform(4.5, 6.0, 20)
    ], -1).astype(np.float32)
    excl = {k: np.stack([
        rng.uniform(-2, 2, 10), rng.uniform(-1.5, 1.5, 10),
        rng.uniform(4.5, 6.0, 10)
    ], -1).astype(np.float32) for k in range(3)}

    kf_xy = np.zeros((8, 64, 2), np.float32)
    kf_desc = rng.integers(0, 2**32, (8, 64, 8), dtype=np.uint64) \
        .astype(np.uint32)
    kf_feat_valid = np.zeros((8, 64), bool)
    kf_feat_pt = np.full((8, 64), -1, np.int32)
    pt_pos = np.zeros((256, 3), np.float32)
    pt_pos[:20] = shared

    def proj(x_cam, pts):
        pc = pts - np.array([x_cam, 0, 0], np.float32)
        return np.stack([CAM.fx * pc[:, 0] / pc[:, 2] + CAM.cx,
                         CAM.fy * pc[:, 1] / pc[:, 2] + CAM.cy], -1)

    # shared points: features 0..19 in every KF, associated
    shared_desc = rng.integers(0, 2**32, (20, 8), dtype=np.uint64) \
        .astype(np.uint32)
    for k in range(4):
        kf_xy[k, :20] = proj(kf_x[k], shared)
        kf_desc[k, :20] = shared_desc
        kf_feat_valid[k, :20] = True
        kf_feat_pt[k, :20] = np.arange(20)
    # exclusive free pairs: neighbor k gets features 20..29, KF 3 stacks
    # them at 20+10k .. 29+10k, with identical descriptors
    for k in range(3):
        d = rng.integers(0, 2**32, (10, 8), dtype=np.uint64) \
            .astype(np.uint32)
        kf_xy[k, 20:30] = proj(kf_x[k], excl[k])
        kf_desc[k, 20:30] = d
        kf_feat_valid[k, 20:30] = True
        s = 20 + 10 * k
        kf_xy[3, s:s + 10] = proj(kf_x[3], excl[k])
        kf_desc[3, s:s + 10] = d
        kf_feat_valid[3, s:s + 10] = True

    st = st._replace(
        kf_pose=jnp.asarray(np.stack([_pose_at(x) for x in kf_x]
                                     + [np.eye(4, dtype=np.float32)] * 4)),
        kf_valid=jnp.asarray([True] * 4 + [False] * 4),
        kf_frame_id=jnp.asarray([0, 1, 2, 3, -1, -1, -1, -1], jnp.int32),
        kf_xy=jnp.asarray(kf_xy),
        kf_desc=jnp.asarray(kf_desc),
        kf_feat_valid=jnp.asarray(kf_feat_valid),
        kf_feat_pt=jnp.asarray(kf_feat_pt),
        pt_pos=jnp.asarray(pt_pos),
        pt_valid=jnp.asarray([True] * 20 + [False] * 236),
    )
    return st, excl


def test_multi_neighbor_triangulation():
    rng = np.random.default_rng(3)
    st, excl = _build_state(rng)

    one = lm.triangulate_new_points(st, CAM, 3, n_neighbors=1)
    n_one = int(jnp.sum(one.pt_valid)) - 20
    multi = lm.triangulate_new_points(st, CAM, 3, n_neighbors=3)
    n_multi = int(jnp.sum(multi.pt_valid)) - 20

    assert n_one <= 10                      # one neighbor: one block only
    assert n_multi >= 24                    # three neighbors: ~all 30
    assert n_multi > n_one + 10

    # new points land near their true positions
    new = np.asarray(multi.pt_pos[20:20 + n_multi])
    truth = np.concatenate([excl[0], excl[1], excl[2]])
    d = np.linalg.norm(new[:, None] - truth[None], axis=-1).min(1)
    assert np.median(d) < 0.05


def test_multi_kf_culling():
    """Several fully-redundant KFs are removed in one round (the reference
    visits every local KF; the pre-r3 code culled at most one)."""
    st = ms.empty(max_kf=8, max_feat=32, max_pts=64, max_obj=2)
    # 6 KFs all observing the same 30 points: every one of KF 1..4 is
    # redundant (points seen by >= 3 others)
    kf_feat_pt = np.full((8, 32), -1, np.int32)
    for k in range(6):
        kf_feat_pt[k, :30] = np.arange(30)
    st = st._replace(
        kf_valid=jnp.asarray([True] * 6 + [False] * 2),
        kf_frame_id=jnp.arange(8, dtype=jnp.int32),
        kf_feat_valid=jnp.ones((8, 32), bool),
        kf_feat_pt=jnp.asarray(kf_feat_pt),
        pt_valid=jnp.asarray([True] * 30 + [False] * 34),
    )
    st2, culled = lm.cull_keyframes(st, 5, max_cull=4)
    assert len(culled) >= 2                 # more than one goes per round
    assert 5 not in culled                  # never the fresh KF
    # survivors still cover the points: every point keeps >= 2 observers
    n_obs = np.asarray(ms.point_obs_counts(st2))[:30]
    assert (n_obs >= 2).all()
