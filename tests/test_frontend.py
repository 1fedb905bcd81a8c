"""Feature-frontend tests on synthetic images (SURVEY.md §4: FAST/BRIEF on
synthetic images vs dense oracles)."""
import jax
import jax.numpy as jnp
import numpy as np

from dsp_slam_rgbd_tpu.frontend import fast, matcher, orb, pyramid, stereo


def checkerboard(h=120, w=160, sq=20, lo=50.0, hi=200.0):
    y, x = np.mgrid[0:h, 0:w]
    board = (((y // sq) + (x // sq)) % 2) * (hi - lo) + lo
    return board.astype(np.float32)


def corners_img(h=96, w=128, pts=((30, 40), (60, 90), (20, 100)), bright=250.0):
    img = np.full((h, w), 30.0, np.float32)
    for (y, x) in pts:
        img[y : y + 8, x : x + 8] = bright  # bright square: corners at edges
    return img


def test_pyramid_shapes():
    img = jnp.asarray(checkerboard())
    levels = pyramid.build_pyramid(img)
    assert len(levels) == 8
    assert levels[0].shape == (120, 160)
    assert levels[1].shape == (100, 133)


def test_gaussian_blur_preserves_mean():
    img = jnp.asarray(checkerboard())
    out = pyramid.gaussian_blur(img)
    assert out.shape == img.shape
    np.testing.assert_allclose(float(out.mean()), float(img.mean()), rtol=0.01)


def test_fast_detects_square_corners():
    img = jnp.asarray(corners_img())
    xy, score, valid = fast.detect(img, max_kp=64, threshold=20.0)
    got = np.asarray(xy)[np.asarray(valid)]
    # per-cell best keeps at most one corner per 16px cell; 3 squares with 4
    # corners each yield at least 6 distinct cells
    assert len(got) >= 6
    # every detection lies near a square boundary (within 3 px of one of the
    # 8x8 squares' corner points)
    sq_corners = []
    for (y, x) in ((30, 40), (60, 90), (20, 100)):
        for dy in (0, 7):
            for dx in (0, 7):
                sq_corners.append((x + dx, y + dy))
    sq_corners = np.asarray(sq_corners, np.float32)
    d = np.linalg.norm(got[:, None, :] - sq_corners[None, :, :], axis=-1)
    assert d.min(axis=1).max() < 4.0


def test_fast_no_corners_on_flat():
    img = jnp.full((64, 64), 100.0)
    xy, score, valid = fast.detect(img, max_kp=32)
    assert int(jnp.sum(valid)) == 0


def test_orientation_rotation_consistency():
    """Rotating the image by 90° shifts IC angles by ~90°."""
    rng = np.random.default_rng(0)
    patch = rng.uniform(0, 255, (31, 31)).astype(np.float32)
    # smooth gradient patch with clear centroid direction
    y, x = np.mgrid[-15:16, -15:16]
    patch = (x * 4.0 + 128).astype(np.float32)
    a0 = float(orb.orientations(jnp.asarray(patch)[None])[0])
    patch90 = np.rot90(patch, k=-1).copy()  # rotate cw: gradient moves to +y
    a1 = float(orb.orientations(jnp.asarray(patch90)[None])[0])
    diff = (a1 - a0) % (2 * np.pi)
    assert abs(diff - np.pi / 2) < 0.05


def test_descriptor_invariance_to_rotation():
    """The pipeline contract: descriptors computed at each patch's own IC
    angle are stable under in-plane rotation of the patch (this is exactly
    how `extract` uses orientations — convention-free)."""
    rng = np.random.default_rng(1)
    from scipy.ndimage import gaussian_filter, rotate

    base = gaussian_filter(rng.uniform(0, 255, (61, 61)), 2.0).astype(
        np.float32
    )
    patch = base[15:46, 15:46].copy()
    rot_full = rotate(base, 35.0, reshape=False, order=1)
    patch_rot = rot_full[15:46, 15:46].astype(np.float32)

    a0 = orb.orientations(jnp.asarray(patch)[None])
    a1 = orb.orientations(jnp.asarray(patch_rot)[None])
    d0 = orb.descriptors(jnp.asarray(patch)[None], a0)
    d1 = orb.descriptors(jnp.asarray(patch_rot)[None], a1)
    dist = int(matcher.hamming_matrix(d0, d1)[0, 0])
    assert dist < 60  # well under the ~128 expected for random pairs


def test_extract_full_pipeline():
    img = jnp.asarray(checkerboard(240, 320, sq=24))
    cfg = orb.OrbConfig(n_features=500, n_levels=4)
    feats = orb.extract(img, cfg)
    n_valid = int(jnp.sum(feats.valid))
    assert n_valid > 50
    assert feats.desc.shape[1] == 8
    assert feats.xy.shape[0] == feats.desc.shape[0]
    # level-0 coords within image bounds
    ok = np.asarray(feats.valid)
    xy = np.asarray(feats.xy)[ok]
    assert xy[:, 0].max() < 320 and xy[:, 1].max() < 240


def test_matching_self():
    """Features of an image match themselves 1:1 at distance 0."""
    img = jnp.asarray(checkerboard(120, 160))
    cfg = orb.OrbConfig(n_features=200, n_levels=2)
    f = orb.extract(img, cfg)
    m = matcher.match(f.desc, f.valid, f.desc, f.valid, max_dist=10)
    ok = np.asarray(m.valid)
    assert ok.sum() == int(jnp.sum(f.valid))
    np.testing.assert_array_equal(
        np.asarray(m.idx)[ok], np.arange(len(ok))[ok]
    )


def test_matching_translated():
    """Features survive a small translation of the image."""
    base = checkerboard(120, 160, sq=20)
    rng = np.random.default_rng(2)
    base += rng.normal(0, 3.0, base.shape).astype(np.float32)
    shifted = np.roll(base, (0, 5), axis=(0, 1))
    cfg = orb.OrbConfig(n_features=150, n_levels=2)
    fa = orb.extract(jnp.asarray(base), cfg)
    fb = orb.extract(jnp.asarray(shifted), cfg)
    mask = matcher.radius_mask(fa.xy, fb.xy, 12.0)
    m = matcher.match(fa.desc, fa.valid, fb.desc, fb.valid, mask=mask,
                      max_dist=matcher.TH_LOW)
    ok = np.asarray(m.valid)
    assert ok.sum() >= 10
    # matched pairs displaced by ≈ (5, 0)
    dx = np.asarray(fb.xy)[np.asarray(m.idx)[ok], 0] - np.asarray(fa.xy)[ok, 0]
    assert np.abs(np.median(dx) - 5.0) < 1.5


def test_stereo_matching_synthetic():
    """Right image = left shifted by a constant disparity."""
    rng = np.random.default_rng(3)
    left = checkerboard(120, 160, sq=15) + rng.normal(
        0, 4.0, (120, 160)
    ).astype(np.float32)
    disp = 8.0
    right = np.roll(left, -int(disp), axis=1)
    cfg = orb.OrbConfig(n_features=150, n_levels=2)
    fl = orb.extract(jnp.asarray(left), cfg)
    fr = orb.extract(jnp.asarray(right), cfg)
    bf = 40.0
    sm = stereo.match_stereo(fl, fr, jnp.asarray(left), jnp.asarray(right),
                             bf=bf, min_z=bf / 40.0)
    ok = np.asarray(sm.valid)
    assert ok.sum() >= 10
    est_disp = np.asarray(fl.xy)[ok, 0] - np.asarray(sm.u_right)[ok]
    assert abs(np.median(est_disp) - disp) < 1.0
    depths = np.asarray(sm.depth)[ok]
    assert abs(np.median(depths) - bf / disp) < 1.0


def test_rgbd_depth_to_stereo():
    img = jnp.asarray(checkerboard())
    cfg = orb.OrbConfig(n_features=100, n_levels=2)
    f = orb.extract(img, cfg)
    depth_map = jnp.full(img.shape, 3.0)
    sm = stereo.depth_to_stereo(f, depth_map, bf=40.0)
    ok = np.asarray(sm.valid)
    assert ok.sum() == int(jnp.sum(f.valid))
    np.testing.assert_allclose(np.asarray(sm.depth)[ok], 3.0)
    ur = np.asarray(sm.u_right)[ok]
    np.testing.assert_allclose(
        np.asarray(f.xy)[ok, 0] - ur, 40.0 / 3.0, atol=1e-4
    )


def test_moment_angles_match_patch_gather():
    """Regression guard for the fused paths in extract() (ADVICE r1):
    moment_angles must equal orientations over gathered patches, and
    descriptors_flat must be bit-identical to the patch-gather descriptors,
    including border keypoints."""
    rng = np.random.default_rng(11)
    img = jnp.asarray(rng.uniform(0, 255, size=(64, 80)).astype(np.float32))
    # interior + border keypoints (corners, edges)
    xy = jnp.asarray(np.array(
        [[40.0, 32.0], [5.0, 5.0], [0.0, 0.0], [79.0, 63.0], [2.0, 60.0],
         [78.0, 1.0], [15.0, 0.0], [0.0, 30.0]], np.float32))
    ang_fast = orb.moment_angles(img, xy)
    ang_ref = orb.orientations(orb.gather_patches(img, xy))
    np.testing.assert_allclose(np.asarray(ang_fast), np.asarray(ang_ref),
                               atol=1e-3)


def test_descriptors_flat_match_patch_gather():
    rng = np.random.default_rng(12)
    img = jnp.asarray(rng.uniform(0, 255, size=(64, 80)).astype(np.float32))
    xy = jnp.asarray(np.array(
        [[40.0, 32.0], [5.0, 5.0], [0.0, 0.0], [79.0, 63.0], [2.0, 60.0],
         [78.0, 1.0], [15.0, 0.0], [0.0, 30.0]], np.float32))
    ang = orb.moment_angles(img, xy)
    d_flat = orb.descriptors_flat(img, xy, ang)
    d_ref = orb.descriptors(orb.gather_patches(img, xy), ang)
    assert np.array_equal(np.asarray(d_flat), np.asarray(d_ref))


def test_frame_undistortion_plumbed():
    """Distortion in the camera config undistorts keypoint coordinates in
    make_frame (reference Frame::UndistortKeyPoints, Frame.cc:421-435)."""
    import numpy as np
    from dsp_slam_rgbd_tpu.config import SystemConfig, MapConfig
    from dsp_slam_rgbd_tpu.frontend.orb import OrbConfig
    from dsp_slam_rgbd_tpu.ops import camera as cam_ops
    from dsp_slam_rgbd_tpu.tracking.tracker import Tracker
    from dsp_slam_rgbd_tpu.mapping import map_state as ms

    rng = np.random.default_rng(0)
    from scipy.ndimage import gaussian_filter
    img = gaussian_filter(rng.uniform(0, 255, (120, 160)), 1.0).astype(
        np.float32)

    cam0 = cam_ops.Intrinsics(fx=120.0, fy=120.0, cx=80.0, cy=60.0)
    cam1 = cam0._replace(dist=(-0.25, 0.05, 0.001, -0.002, 0.0))

    def frame_of(cam):
        cfg = SystemConfig(sensor="mono", cam=cam,
                           orb=OrbConfig(n_features=200, n_levels=2),
                           map=MapConfig(max_kf=4, max_feat=256,
                                         max_pts=512, max_obj=2))
        tr = Tracker(cfg, ms.empty(max_kf=4, max_feat=256, max_pts=512))
        return tr.make_frame(img)

    f0 = frame_of(cam0)
    f1 = frame_of(cam1)
    raw = np.asarray(f0.feats.xy)
    und = np.asarray(f1.feats.xy)
    v = np.asarray(f0.feats.valid) & np.asarray(f1.feats.valid)
    # same detections, coordinates mapped through undistort_pixels
    expect = np.asarray(cam_ops.undistort_pixels(cam1, f0.feats.xy))
    np.testing.assert_allclose(und[v], expect[v], atol=1e-3)
    # barrel distortion actually moves off-center points
    off = v & (np.abs(raw[:, 0] - 80.0) > 30.0)
    if off.any():
        assert np.abs(und[off] - raw[off]).max() > 0.5


def test_rotation_consistency_gate():
    """The rotation-histogram gate (reference rotHist + ComputeThreeMaxima)
    keeps matches in the dominant angle-difference bins, rejects scattered
    outlier rotations, and exempts entries with no angle (NaN)."""
    rng = np.random.default_rng(7)
    n = 64
    desc = rng.integers(0, 2**32, size=(n, 8), dtype=np.uint32)
    valid = np.ones(n, bool)
    ang_a = rng.uniform(0, 2 * np.pi, n).astype(np.float32)
    ang_b = (ang_a - 0.5).astype(np.float32)       # consistent delta 0.5
    # 8 outliers spread one-per-bin so each bad bin holds <0.1x the max
    bad = np.arange(50, 58)
    ang_b[bad] = ang_a[bad] - 0.5 + np.linspace(0.7, 2.8, len(bad))
    # 4 entries with no angle -> exempt from the gate
    nan = np.arange(58, 62)
    ang_b[nan] = np.nan
    m = matcher.match(
        jnp.asarray(desc), jnp.asarray(valid), jnp.asarray(desc),
        jnp.asarray(valid), max_dist=10, angles_a=jnp.asarray(ang_a),
        angles_b=jnp.asarray(ang_b), check_rotation=True,
    )
    ok = np.asarray(m.valid)
    assert ok[:50].all(), "consistent-rotation matches must survive"
    assert not ok[bad].any(), "scattered-rotation outliers must be rejected"
    assert ok[nan].all(), "angle-less entries are exempt"
    # without the gate everything matches (sanity)
    m0 = matcher.match(jnp.asarray(desc), jnp.asarray(valid),
                       jnp.asarray(desc), jnp.asarray(valid), max_dist=10)
    assert np.asarray(m0.valid).all()
