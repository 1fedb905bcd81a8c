"""Mono object pipeline: an object is recovered from masks alone.

Builds a synthetic map (sphere surface points + off-object clutter,
cameras sweeping past) and drives the reference's mono flow —
association-by-voting, poseless object creation, PCA cuboid seeding,
every-5-KF reconstruction with flip disambiguation
(`Tracking_util.cc:210-288`, `LocalMapping_util.cc:213-445`) — asserting
the recovered pose, scale and shape code.
"""
import numpy as np
import jax.numpy as jnp

from dsp_slam_rgbd_tpu.mapping import map_state as ms
from dsp_slam_rgbd_tpu.mapping import objects as obj_mod
from dsp_slam_rgbd_tpu.models import deepsdf, mesh
from dsp_slam_rgbd_tpu.ops import camera as cam_ops
from dsp_slam_rgbd_tpu.recon.optimizer import ReconConfig
from dsp_slam_rgbd_tpu.system import mono_objects
from dsp_slam_rgbd_tpu.system.detections import MonoDetection

CODE_LEN = 4
R_BASE, R_GAIN = 0.5, 0.2
C_TRUE = 0.5                      # true code[0] -> radius 0.6
CENTER_W = np.array([0.5, 0.0, 6.0], np.float32)
R_TRUE = R_BASE + R_GAIN * C_TRUE

CAM = cam_ops.Intrinsics(fx=200.0, fy=200.0, cx=112.0, cy=80.0, bf=100.0)
N_SPHERE, N_CLUTTER = 120, 40
N_KF = 21


def sphere_fn(params, inputs):
    xyz = inputs[..., CODE_LEN:]
    r = R_BASE + R_GAIN * inputs[..., 0]
    return jnp.linalg.norm(xyz, axis=-1) - r


SPEC = deepsdf.AnalyticSdfSpec(latent_size=CODE_LEN, fn=sphere_fn)
PARAMS = {"layers": []}

RECON_CFG = ReconConfig(code_len=CODE_LEN, num_depth_samples=24,
                        cut_off_threshold=0.05, b2=0.05, k3=0.05, k4=0.0,
                        num_iterations=6, max_grad_points=512,
                        max_valid_samples=2048)


def _make_world(rng):
    d = rng.standard_normal((N_SPHERE, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    sphere = CENTER_W + d * R_TRUE
    clutter = rng.uniform(-4, 4, (N_CLUTTER, 3)).astype(np.float32)
    clutter[:, 2] = rng.uniform(9.0, 14.0, N_CLUTTER)  # far background
    return np.concatenate([sphere, clutter]).astype(np.float32)


def _make_state(pts_w):
    P = len(pts_w)
    st = ms.empty(max_kf=N_KF + 2, max_feat=P, max_pts=P + 16, max_obj=4,
                  code_len=CODE_LEN, max_oobs=64)
    st = st._replace(
        pt_pos=st.pt_pos.at[:P].set(jnp.asarray(pts_w)),
        pt_valid=st.pt_valid.at[:P].set(True),
    )
    return st


def _insert_kf(st, k, cam_x):
    t_cw = np.eye(4, dtype=np.float32)
    t_cw[0, 3] = -cam_x
    P = N_SPHERE + N_CLUTTER
    pts_c = np.asarray(st.pt_pos)[:P] + t_cw[:3, 3]
    uv = np.stack([CAM.fx * pts_c[:, 0] / pts_c[:, 2] + CAM.cx,
                   CAM.fy * pts_c[:, 1] / pts_c[:, 2] + CAM.cy], -1)
    st = st._replace(
        kf_pose=st.kf_pose.at[k].set(jnp.asarray(t_cw)),
        kf_valid=st.kf_valid.at[k].set(True),
        kf_frame_id=st.kf_frame_id.at[k].set(k),
        kf_xy=st.kf_xy.at[k, :P].set(jnp.asarray(uv.astype(np.float32))),
        kf_feat_valid=st.kf_feat_valid.at[k, :P].set(True),
        kf_feat_pt=st.kf_feat_pt.at[k, :P].set(jnp.arange(P)),
    )
    return st


def _detection(rng):
    """Keypoints 0..N_SPHERE-1 are 'inside the mask'; bg rays point at the
    plane behind the object."""
    bg = rng.standard_normal((64, 3)).astype(np.float32) * 0.05
    bg[:, 2] = 1.0
    bg[:, 0] += CENTER_W[0] / CENTER_W[2]
    return MonoDetection(np.arange(N_SPHERE), bg, True)


def test_mono_object_recovered_from_masks():
    rng = np.random.default_rng(3)
    pts_w = _make_world(rng)
    st = _make_state(pts_w)

    all_obs = []
    for i in range(N_KF):
        st = _insert_kf(st, i, cam_x=0.08 * i)
        dets = [_detection(rng)]
        st, assoc = mono_objects.associate_by_projection(st, i, dets)
        st, assoc = mono_objects.create_new_objects(st, i, dets, assoc,
                                                    kfseq=i)
        st, obs = mono_objects.process_detected_objects(
            st, CAM, RECON_CFG, PARAMS, SPEC, i, i, dets, assoc)
        all_obs += [(i, o, t) for o, t in obs]
        if i == 0:
            assert assoc[0] == 0           # object created on first KF
        else:
            assert assoc[0] == 0           # re-associated by voting

    # object reconstructed (warmup 15 KFs, recon at 15 and 20)
    assert bool(st.obj_valid[0])
    assert bool(st.obj_recon[0])
    assert len(all_obs) == 2
    # pose: recovered center within 15% of the radius
    c = np.asarray(st.obj_pose)[0][:3, 3]
    np.testing.assert_allclose(c, CENTER_W, atol=0.15 * R_TRUE)
    # scale ~ radius, code ~ C_TRUE (radius residual R_GAIN·|dc| < 2 cm)
    s = float(st.obj_scale[0])
    r_fit = s * (R_BASE + R_GAIN * float(st.obj_code[0, 0]))
    assert abs(r_fit - R_TRUE) < 0.05
    # sphere points owned by the object; clutter not
    po = np.asarray(st.pt_object)
    assert (po[:N_SPHERE] == 0).mean() > 0.9
    assert (po[N_SPHERE:N_SPHERE + N_CLUTTER] == 0).sum() == 0
    # decoded-shape bbox stored and roughly ±(r/s) after normalization
    bb_max = np.asarray(st.obj_bbox_max)[0]
    assert np.all(bb_max > 0.3) and np.all(bb_max < 1.1)


def test_system_dispatches_mono_detections():
    """SLAMSystem._object_stage routes MonoDetections through the mono
    pipeline (association + creation + processing) and records object-KF
    observations for the joint BA."""
    from dsp_slam_rgbd_tpu.config import MapConfig, SystemConfig
    from dsp_slam_rgbd_tpu.system.slam import SLAMSystem

    rng = np.random.default_rng(5)
    pts_w = _make_world(rng)
    cfg = SystemConfig(sensor="mono", cam=CAM, recon=RECON_CFG,
                       map=MapConfig(max_kf=N_KF + 2,
                                     max_feat=N_SPHERE + N_CLUTTER,
                                     max_pts=N_SPHERE + N_CLUTTER + 16,
                                     max_obj=4, max_oobs=64))
    sys_ = SLAMSystem(cfg, decoder_params=PARAMS, decoder_spec=SPEC)
    st = _make_state(pts_w)
    for i in range(16):
        st = _insert_kf(st, i, cam_x=0.08 * i)
    sys_.mapping.state = st
    for i in range(16):
        sys_.mapping._object_stage(i, None, [_detection(rng)], None, kid=i)
    st = sys_.mapping.state
    assert bool(st.obj_valid[0])
    assert bool(st.obj_recon[0])
    assert int(np.asarray(st.oobs_valid).sum()) >= 1
    c = np.asarray(st.obj_pose)[0][:3, 3]
    np.testing.assert_allclose(c, CENTER_W, atol=0.2 * R_TRUE)


def test_pca_cuboid_reference_conventions():
    rng = np.random.default_rng(1)
    # elongated cloud: long in world x (length), flat in world y (height)
    pts = np.stack([rng.uniform(-2, 2, 300), rng.uniform(-0.3, 0.3, 300),
                    rng.uniform(-0.8, 0.8, 300)], -1).astype(np.float32)
    cub = obj_mod.cuboid_from_points_pca(jnp.asarray(pts),
                                         jnp.ones(300, bool))
    R = np.asarray(cub.t_wo)[:3, :3]
    assert abs(R[0, 2]) > 0.99          # z (length) along world x
    assert abs(R[1, 1]) > 0.99          # y (up) along world y
    assert R[1, 1] <= 0.0               # y axis points toward world −y (up)
    assert np.linalg.det(R) > 0.99      # right-handed
    ext = np.asarray(cub.extent)
    assert ext[2] > ext[0] > ext[1]     # l > w > h
    np.testing.assert_allclose(float(cub.scale), 0.4 * ext[2], rtol=1e-5)
    # points just outside the 1.2x box are flagged
    far = pts.copy()
    far[0] = [5.0, 0.0, 0.0]
    cub2 = obj_mod.cuboid_from_points_pca(jnp.asarray(far),
                                          jnp.ones(300, bool))
    assert bool(cub2.outlier[0])


def test_model_outliers_and_sdf_bbox():
    bb_min, bb_max = mesh.sdf_bbox(PARAMS, SPEC,
                                   jnp.asarray([C_TRUE, 0, 0, 0]))
    np.testing.assert_allclose(np.asarray(bb_max), R_TRUE, atol=0.12)
    np.testing.assert_allclose(np.asarray(bb_min), -R_TRUE, atol=0.12)
    # gating: a point at 2x the bbox is an outlier, one inside is not
    pts = jnp.asarray([[0.0, 0.0, 2.0], [0.0, 0.0, 0.3]])
    out = obj_mod.model_outliers(pts, jnp.ones(2, bool), jnp.eye(4), 1.0,
                                 bb_min, bb_max)
    assert bool(out[0]) and not bool(out[1])
    # empty shape (all-positive sdf) falls back to the unit cube
    bb_min0, bb_max0 = mesh.sdf_bbox(PARAMS, SPEC,
                                     jnp.asarray([-10.0, 0, 0, 0]))
    np.testing.assert_allclose(np.asarray(bb_max0), 1.0)
