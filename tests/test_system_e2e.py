"""End-to-end SLAM tests on a synthetic stereo sequence.

World: a fronto-parallel textured plane at z = PLANE_Z viewed by a stereo
camera translating along x.  Images are exact plane-homography samples of
one shared texture, so ground-truth poses/depths are known and ATE can be
asserted (SURVEY.md §4: integration tests with precomputed fixtures).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dsp_slam_rgbd_tpu.config import MapConfig, SystemConfig, TrackingConfig
from dsp_slam_rgbd_tpu.frontend.orb import OrbConfig
from dsp_slam_rgbd_tpu.models import deepsdf
from dsp_slam_rgbd_tpu.ops import camera as cam_ops
from dsp_slam_rgbd_tpu.ops import lie
from dsp_slam_rgbd_tpu.recon.optimizer import ReconConfig
from dsp_slam_rgbd_tpu.system.detections import make_detection
from dsp_slam_rgbd_tpu.system.slam import SLAMSystem

H, W = 160, 224
FX = 200.0
BASELINE = 0.5
PLANE_Z = 10.0
PLANE_TILT = 0.35  # z = PLANE_Z + PLANE_TILT·X: the depth gradient breaks
                   # the translation/yaw near-degeneracy of a fronto-
                   # parallel constant-depth plane
CAM = cam_ops.Intrinsics(fx=FX, fy=FX, cx=W / 2, cy=H / 2, bf=FX * BASELINE)


def make_texture(rng, size=2048):
    from scipy.ndimage import gaussian_filter

    t = rng.uniform(0, 255, (size, size))
    return gaussian_filter(t, 1.2).astype(np.float32)


def render(texture, cam_x, cam_y=0.0, tex_scale=80.0):
    """Sample the tilted-plane texture for a camera at (cam_x, cam_y, 0).

    Plane: z = PLANE_Z + PLANE_TILT·(X_world).  For a pixel with normalized
    ray (dx, dy, 1) from a camera at world x = cam_x:
      t = (PLANE_Z + PLANE_TILT·cam_x) / (1 − PLANE_TILT·dx)
      X = cam_x + dx·t, Y = cam_y + dy·t.
    """
    from scipy.ndimage import map_coordinates

    u, v = np.meshgrid(np.arange(W), np.arange(H))
    dx = (u - CAM.cx) / FX
    dy = (v - CAM.cy) / FX
    t = (PLANE_Z + PLANE_TILT * cam_x) / (1.0 - PLANE_TILT * dx)
    X = cam_x + dx * t
    Y = cam_y + dy * t
    tx = X * tex_scale / 10.0 + texture.shape[1] / 2
    ty = Y * tex_scale / 10.0 + texture.shape[0] / 2
    return map_coordinates(texture, [ty, tx], order=1, mode="wrap").astype(
        np.float32
    )


def make_cfg(sensor="stereo"):
    return SystemConfig(
        sensor=sensor,
        cam=CAM,
        orb=OrbConfig(n_features=400, n_levels=3),
        recon=ReconConfig(code_len=4, num_depth_samples=24,
                          cut_off_threshold=0.05, b2=0.05, k3=0.05, k4=0.0,
                          num_iterations=4, max_grad_points=256,
                          max_valid_samples=1024),
        tracking=TrackingConfig(fps=10.0, th_depth=30.0,
                                max_frames_between_kf=4,
                                min_tracked_for_ok=25),
        map=MapConfig(max_kf=16, max_feat=512, max_pts=4096, max_obj=4,
                      max_oobs=64, local_window=6),
    )


N_FRAMES = 12
STEP = 0.12


def run_sequence(system, texture, with_detections=False):
    det_t_co_world = np.eye(4, dtype=np.float32)
    det_t_co_world[:3, 3] = [1.0, 0.0, 6.0]  # object fixed in world
    rng = np.random.default_rng(7)
    for i in range(N_FRAMES):
        x = i * STEP
        img_l = render(texture, x)
        img_r = render(texture, x + BASELINE)
        dets = None
        if with_detections:
            t_cw = np.eye(4, dtype=np.float32)
            t_cw[0, 3] = -x  # camera at (x,0,0): world→cam translate −x
            t_co = t_cw @ det_t_co_world
            d = rng.standard_normal((100, 3))
            d /= np.linalg.norm(d, axis=1, keepdims=True)
            pts_obj = d * 0.5
            pts_cam = pts_obj @ t_co[:3, :3].T + t_co[:3, 3]
            # foreground rays toward visible surface points + depths
            vis = pts_cam[pts_cam[:, 2] > 0][:64]
            depths = np.linalg.norm(vis, axis=1)
            rays = vis / depths[:, None]
            dets = [make_detection(t_co, pts=pts_cam, rays=rays,
                                   depth=depths, n_fg=len(rays))]
        out = system.track_stereo(img_l, img_r, timestamp=i * 0.1,
                                  detections=dets)
    system.flush()  # adopt in-flight async mapping jobs before asserting
    return out


@pytest.fixture(scope="module")
def texture():
    return make_texture(np.random.default_rng(0))


def test_stereo_e2e_tracking(texture):
    sys_ = SLAMSystem(make_cfg())
    run_sequence(sys_, texture)
    traj = sys_.tracker.trajectory
    ok = np.asarray([o for _, _, o in traj])
    assert ok[2:].mean() > 0.8  # tracks nearly every frame
    # ATE vs ground truth: gt_x from the timestamp (frame i at t = 0.1·i
    # sits at x = i·STEP) — the trajectory may not start at frame 0
    est_x = np.asarray([-p[0, 3] for _, p, o in traj if o])
    gt_x = np.asarray([t / 0.1 * STEP for t, _, o in traj if o])
    err = np.abs(est_x - gt_x)
    assert err.max() < 0.05  # < 5 cm on a 1.4 m path
    # map depths lie on the tilted plane's depth range
    z = np.asarray(sys_.state.pt_pos)[np.asarray(sys_.state.pt_valid), 2]
    assert np.isfinite(z).all()
    assert 7.0 < np.median(z) < 14.0
    assert sys_.n_kf >= 2


def test_stereo_e2e_with_objects(texture):
    code_len = 4

    def sphere_fn(params, inputs):
        xyz = inputs[..., code_len:]
        r = 0.5 + 0.2 * inputs[..., 0]
        return jnp.linalg.norm(xyz, axis=-1) - r

    spec = deepsdf.AnalyticSdfSpec(latent_size=code_len, fn=sphere_fn)
    sys_ = SLAMSystem(make_cfg(), decoder_params={"layers": []},
                      decoder_spec=spec)
    run_sequence(sys_, texture, with_detections=True)
    valid = np.asarray(sys_.state.obj_valid)
    assert valid.sum() == 1  # one object, associated across keyframes
    o = int(np.nonzero(valid)[0][0])
    assert int(sys_.state.obj_n_obs[o]) >= 2
    c = np.asarray(sys_.state.obj_pose)[o][:3, 3]
    np.testing.assert_allclose(c, [1.0, 0.0, 6.0], atol=0.3)
    assert int(np.asarray(sys_.state.oobs_valid).sum()) >= 2


def test_save_outputs(texture, tmp_path):
    sys_ = SLAMSystem(make_cfg())
    run_sequence(sys_, texture)
    sys_.save_trajectory_kitti(str(tmp_path / "traj_kitti.txt"))
    sys_.save_trajectory_tum(str(tmp_path / "traj_tum.txt"))
    sys_.save_entire_map(str(tmp_path / "map"))
    rows = open(tmp_path / "traj_kitti.txt").read().strip().splitlines()
    assert len(rows) >= 8
    assert len(rows[0].split()) == 12
    tum = open(tmp_path / "traj_tum.txt").read().strip().splitlines()
    assert len(tum[0].split()) == 8
    pts = open(tmp_path / "map" / "MapPoints.txt").read().strip().splitlines()
    assert len(pts) > 100
    assert (tmp_path / "map" / "Cameras.txt").exists()


def test_config_from_reference_yaml():
    import os

    from dsp_slam_rgbd_tpu import config as cfg_mod

    y = "/root/reference/configs/KITTI00-02.yaml"
    j = "/root/reference/configs/config_kitti.json"
    if not os.path.isfile(y):
        pytest.skip("reference configs not present")
    cfg = cfg_mod.from_reference_yaml_json(y, j, sensor="stereo")
    assert abs(cfg.cam.fx - 718.856) < 1e-3
    assert cfg.orb.n_features == 2000
    assert cfg.recon.k2 == 100.0
    assert cfg.recon.num_iterations == 10
    assert cfg.recon.k4 == 1e7
