"""Stereo+LiDAR pipeline on a synthetic KITTI-layout sequence: images,
velodyne .bin files (read by the native C++ loader), calib parsing, offline
detection labels — the full config[3] data path end-to-end."""
import numpy as np
import jax.numpy as jnp
import pytest

from dsp_slam_rgbd_tpu.models import deepsdf
from dsp_slam_rgbd_tpu.system import sequence as seq_mod
from dsp_slam_rgbd_tpu.system.detections import make_detection
from dsp_slam_rgbd_tpu.system.slam import SLAMSystem

from test_system_e2e import BASELINE, STEP, make_cfg, make_texture, render


@pytest.fixture(scope="module")
def kitti_dir(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("kitti")
    (root / "image_2").mkdir()
    (root / "image_3").mkdir()
    (root / "velodyne").mkdir()
    (root / "labels").mkdir()
    texture = make_texture(np.random.default_rng(0))
    rng = np.random.default_rng(1)

    obj_world = np.eye(4, dtype=np.float32)
    obj_world[:3, 3] = [1.0, 0.0, 6.0]

    for i in range(8):
        x = i * STEP
        for sub, cam_x in (("image_2", x), ("image_3", x + BASELINE)):
            img = np.clip(render(texture, cam_x), 0, 255).astype(np.uint8)
            Image.fromarray(img).save(root / sub / f"{i:06d}.png")
        # velodyne: random cloud + a dense cluster on the object surface
        bg = rng.uniform(-10, 10, (3000, 4)).astype(np.float32)
        d = rng.standard_normal((200, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        t_cw = np.eye(4, dtype=np.float32)
        t_cw[0, 3] = -x
        t_co = t_cw @ obj_world
        surf_cam = (d * 0.5) @ t_co[:3, :3].T + t_co[:3, 3]
        surf = np.concatenate(
            [surf_cam, np.ones((200, 1), np.float32)], axis=1
        )
        np.concatenate([bg, surf]).astype(np.float32).tofile(
            root / "velodyne" / f"{i:06d}.bin"
        )
        # offline labels: detection with pose + surface pts + rays
        vis = surf_cam[surf_cam[:, 2] > 0][:64]
        depths = np.linalg.norm(vis, axis=1)
        rays = vis / depths[:, None]
        det = make_detection(t_co, pts=surf_cam, rays=rays, depth=depths,
                             n_fg=len(rays))
        seq_mod.save_label_file(str(root / "labels" / f"{i:06d}.npz"), [det])

    (root / "calib.txt").write_text(
        "P2: 200.0 0.0 112.0 0.0 0.0 200.0 80.0 0.0 0.0 0.0 1.0 0.0\n"
        "Tr: 1.0 0.0 0.0 0.0 0.0 1.0 0.0 0.0 0.0 0.0 1.0 0.0\n"
    )
    return root


def test_kitti_sequence_loading(kitti_dir):
    seq = seq_mod.KittiSequence(str(kitti_dir),
                                labels_dir=str(kitti_dir / "labels"))
    assert len(seq) == 8
    img_l, img_r = seq.frame(0)
    assert img_l.shape == (160, 224)
    velo = seq.velodyne_cam(0)
    assert velo.shape[1] == 3 and len(velo) == 3200
    dets = seq.detections(0)
    assert len(dets) == 1
    assert dets[0].pts_mask.sum() > 100
    # calib parsed: P2 identity-offset handling
    assert seq.P2 is not None


def test_kitti_pipeline_with_objects(kitti_dir):
    code_len = 4

    def sphere_fn(params, inputs):
        xyz = inputs[..., code_len:]
        r = 0.5 + 0.2 * inputs[..., 0]
        return jnp.linalg.norm(xyz, axis=-1) - r

    spec = deepsdf.AnalyticSdfSpec(latent_size=code_len, fn=sphere_fn)
    seq = seq_mod.KittiSequence(str(kitti_dir),
                                labels_dir=str(kitti_dir / "labels"))
    sys_ = SLAMSystem(make_cfg(), decoder_params={"layers": []},
                      decoder_spec=spec)
    for i in range(8):
        img_l, img_r = seq.frame(i)
        sys_.track_stereo(img_l, img_r, timestamp=i * 0.1,
                          detections=seq.detections(i) or None)
    sys_.flush()
    ok = np.asarray([o for _, _, o in sys_.tracker.trajectory])
    assert ok.mean() > 0.7
    valid = np.asarray(sys_.state.obj_valid)
    assert valid.sum() == 1
    o = int(np.nonzero(valid)[0][0])
    c = np.asarray(sys_.state.obj_pose)[o][:3, 3]
    np.testing.assert_allclose(c, [1.0, 0.0, 6.0], atol=0.3)
