"""KITTI online detection assembly: 3D-box LiDAR crop, projected-point
mask voting, background-pixel sampling, occlusion masks
(reference `kitti_sequence.py:99-216`)."""
import numpy as np

from dsp_slam_rgbd_tpu.system.detections import (assemble_kitti_detections,
                                                 box_to_t_velo_obj)

# simple velodyne->cam: velo (x fwd, y left, z up) -> cam (x right, y down,
# z fwd)
T_CAM_VELO = np.array([
    [0, -1, 0, 0],
    [0, 0, -1, 0],
    [1, 0, 0, 0],
    [0, 0, 0, 1],
], np.float32)
K = np.array([[300.0, 0, 310.0], [0, 300.0, 120.0], [0, 0, 1]], np.float32)
H, W = 240, 620


def _scene(rng):
    """Two cars ahead of the sensor + ground clutter."""
    def car(cx, cy, w=1.8, h=1.5, length=4.0):
        n = 400
        # theta=0: object z (car length) lies along -velo y, object x along
        # velo x, object y (up) along velo z (box_to_t_velo_obj convention)
        pts = np.stack([
            rng.uniform(-w / 2, w / 2, n),
            rng.uniform(-length / 2, length / 2, n),
            rng.uniform(0.0, h, n),
        ], -1)
        return pts + [cx, cy, 0.0]

    near = car(8.0, 1.0)     # closer car (velo x = 8)
    far = car(14.0, -2.0)    # farther car
    ground = np.stack([rng.uniform(3, 25, 3000),
                       rng.uniform(-8, 8, 3000),
                       rng.uniform(-0.2, 0.05, 3000)], -1)
    velo = np.concatenate([near, far, ground]).astype(np.float32)
    boxes = np.array([
        [8.0, 1.0, 0.0, 1.8, 1.5, 4.0, 0.0],
        [14.0, -2.0, 0.0, 1.8, 1.5, 4.0, 0.0],
    ], np.float32)
    return velo, boxes


def _mask_of(velo_car):
    """Rasterize a car's projected points into a 2D mask + bbox."""
    cam = velo_car @ T_CAM_VELO[:3, :3].T + T_CAM_VELO[:3, 3]
    uv = (cam @ K.T)
    uv = uv[:, :2] / uv[:, 2:3]
    m = np.zeros((H, W), bool)
    ok = (uv[:, 0] >= 2) & (uv[:, 0] < W - 2) & (uv[:, 1] >= 2) \
        & (uv[:, 1] < H - 2)
    px = uv[ok].astype(int)
    for du in range(-4, 5):
        for dv in range(-4, 5):
            m[np.clip(px[:, 1] + dv, 0, H - 1),
              np.clip(px[:, 0] + du, 0, W - 1)] = True
    xs, ys = np.nonzero(m)[1], np.nonzero(m)[0]
    bbox = np.array([xs.min(), ys.min(), xs.max(), ys.max()], np.float32)
    return m, bbox


def test_assembly_votes_masks_and_builds_rays():
    rng = np.random.default_rng(0)
    velo, boxes = _scene(rng)
    m_near, bb_near = _mask_of(velo[:400])
    m_far, bb_far = _mask_of(velo[400:800])
    # shuffle mask order so association is non-trivial
    masks = np.stack([m_far, m_near])
    bboxes = np.stack([bb_far, bb_near])

    dets, occs = assemble_kitti_detections(
        K, np.linalg.inv(K), T_CAM_VELO, velo, boxes, masks, bboxes,
        (H, W), min_mask_area=50)
    assert len(dets) == 2
    # depth-sorted: nearer car first
    assert dets[0].t_co[2, 3] < dets[1].t_co[2, 3]
    for d in dets:
        assert d.pts_mask.sum() >= 50          # LiDAR crop found the car
        assert d.fg_mask.sum() > 20            # fg rays from projections
        assert (d.ray_mask & ~d.fg_mask).sum() > 20  # background rays
        # depth entries = z of surface points
        zs = d.pts[d.pts_mask][:, 2]
        assert abs(np.median(d.depth[d.fg_mask]) - np.median(zs)) < 1.0
        # scale folded into t_co: det(R)^(1/3) = inflated half-length
        assert abs(d.scale - 1.1 * 2.0) < 1e-3
    # occlusion: first (nearest) instance sees empty occ mask, the second
    # sees the union of closer masks
    assert occs[0] is not None and occs[0].sum() == 0
    assert occs[1] is not None and occs[1].sum() == m_near.sum()


def test_association_rejects_wrong_mask():
    """A mask that covers none of the projected points is not associated:
    no rays are built (the reference leaves instance.rays = None)."""
    rng = np.random.default_rng(1)
    velo, boxes = _scene(rng)
    stray = np.zeros((H, W), bool)
    stray[5:40, 5:60] = True  # corner blob, far from both cars
    dets, occs = assemble_kitti_detections(
        K, np.linalg.inv(K), T_CAM_VELO, velo, boxes[:1],
        np.stack([stray]), np.array([[5, 5, 60, 40]], np.float32),
        (H, W), min_mask_area=50)
    assert len(dets) == 1
    assert dets[0].ray_mask.sum() == 0         # no mask -> no rays
    assert dets[0].pts_mask.sum() > 0          # surface points still there
    assert occs[0] is None


def test_box_pose_convention():
    """T_velo_obj maps the object's up axis (y) to velodyne +z and centres
    the box at trans + h/2 (reference kitti_sequence.py:115-121)."""
    T = box_to_t_velo_obj(np.array([5.0, 2.0, -1.0]),
                          np.array([1.8, 1.5, 4.0]), 0.3)
    np.testing.assert_allclose(T[:3, 1], [0, 0, 1], atol=1e-7)  # y_obj -> z
    np.testing.assert_allclose(T[:3, 3], [5.0, 2.0, 1.0], atol=1e-7)
    R = T[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
    assert np.linalg.det(R) > 0.99
