"""KITTI online detection assembly: 3D-box LiDAR crop, projected-point
mask voting, background-pixel sampling, occlusion masks
(reference `kitti_sequence.py:99-216`).

Box-size convention under test (reference `kitti_sequence.py:115-132`):
rows are [x, y, z, w, l, h, theta] with trans = the box *bottom* center
and size = (width, length, height); the object origin is lifted by h/2,
the crop keeps |y|<h/2 (height) and |z|<1.1*l/2 (length), and the scale
folded into T_cam_obj is the inflated half-length 1.1*l/2.  The
assertions below fail if width/length/height are permuted in any way.
"""
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

CAR_W, CAR_L, CAR_H = 1.8, 4.0, 1.5
N_CAR = 250  # <= MAX_SURFACE so the subsample cap never hides crop losses


def _scene(rng):
    """Two cars ahead of the sensor + ground clutter."""
    def car(cx, cy):
        # theta=0: object z (car length) lies along -velo y, object x
        # (width) along velo x, object y (up) along velo z
        # (box_to_t_velo_obj convention); the car sits on the ground,
        # spanning velo z in [0, CAR_H]
        pts = np.stack([
            rng.uniform(-CAR_W / 2, CAR_W / 2, N_CAR),
            rng.uniform(-CAR_L / 2, CAR_L / 2, N_CAR),
            rng.uniform(0.0, CAR_H, N_CAR),
        ], -1)
        return pts + [cx, cy, 0.0]

    near = car(8.0, 1.0)     # closer car (velo x = 8)
    far = car(14.0, -2.0)    # farther car
    ground = np.stack([rng.uniform(3, 25, 3000),
                       rng.uniform(-8, 8, 3000),
                       rng.uniform(-0.2, 0.05, 3000)], -1)
    velo = np.concatenate([near, far, ground]).astype(np.float32)
    # PointPillars row layout: [x, y, z(bottom), w, l, h, theta]
    boxes = np.array([
        [8.0, 1.0, 0.0, CAR_W, CAR_L, CAR_H, 0.0],
        [14.0, -2.0, 0.0, CAR_W, CAR_L, CAR_H, 0.0],
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
    m_near, bb_near = _mask_of(velo[:N_CAR])
    m_far, bb_far = _mask_of(velo[N_CAR:2 * N_CAR])
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
        # the crop must keep essentially the WHOLE car: a swapped
        # width/length/height convention crops a thin slab and fails here
        assert d.pts_mask.sum() >= 0.92 * N_CAR
        pts = d.pts[d.pts_mask]
        # crop spans the car's full height (cam y is -velo z)
        assert pts[:, 1].max() - pts[:, 1].min() > 0.9 * CAR_H
        # ... and its full length (projected onto cam x/z plane)
        span = np.linalg.norm(pts[:, [0, 2]].max(0) - pts[:, [0, 2]].min(0))
        assert span > 0.9 * CAR_L
        assert d.fg_mask.sum() > 20            # fg rays from projections
        assert (d.ray_mask & ~d.fg_mask).sum() > 20  # background rays
        # depth entries = z of surface points
        zs = pts[:, 2]
        assert abs(np.median(d.depth[d.fg_mask]) - np.median(zs)) < 1.0
        # scale folded into t_co: det(R)^(1/3) = inflated half-LENGTH
        assert abs(d.scale - 1.1 * CAR_L / 2) < 1e-3
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
    """T_velo_obj maps the object's up axis (y) to velodyne +z and lifts
    the bottom-center trans by half the HEIGHT = size[2]/2 under the
    (w, l, h) layout (reference kitti_sequence.py:115-121,131)."""
    T = box_to_t_velo_obj(np.array([5.0, 2.0, -1.0]),
                          np.array([CAR_W, CAR_L, CAR_H]), 0.3)
    np.testing.assert_allclose(T[:3, 1], [0, 0, 1], atol=1e-7)  # y_obj -> z
    np.testing.assert_allclose(T[:3, 3], [5.0, 2.0, -1.0 + CAR_H / 2],
                               atol=1e-7)
    R = T[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
    assert np.linalg.det(R) > 0.99
