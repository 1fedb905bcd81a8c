"""Multiple objects + a moving (dynamic) object through the full system:
association keeps identities apart, the mover is classified dynamic,
excluded from BA and from MapObjects.txt export."""
import numpy as np
import jax.numpy as jnp

from dsp_slam_rgbd_tpu.models import deepsdf
from dsp_slam_rgbd_tpu.system.detections import make_detection
from dsp_slam_rgbd_tpu.system.slam import SLAMSystem

from test_system_e2e import BASELINE, STEP, make_cfg, make_texture, render

CODE_LEN = 4


def sphere_fn(params, inputs):
    xyz = inputs[..., CODE_LEN:]
    r = 0.5 + 0.2 * inputs[..., 0]
    return jnp.linalg.norm(xyz, axis=-1) - r


SPEC = deepsdf.AnalyticSdfSpec(latent_size=CODE_LEN, fn=sphere_fn)


def detection_for(obj_world_t, cam_x, rng):
    t_cw = np.eye(4, dtype=np.float32)
    t_cw[0, 3] = -cam_x
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = obj_world_t
    t_co = t_cw @ T
    d = rng.standard_normal((100, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    pts_cam = (d * 0.5) @ t_co[:3, :3].T + t_co[:3, 3]
    vis = pts_cam[pts_cam[:, 2] > 0][:64]
    depths = np.linalg.norm(vis, axis=1)
    rays = vis / depths[:, None]
    return make_detection(t_co, pts=pts_cam, rays=rays, depth=depths,
                          n_fg=len(rays))


def test_multi_object_and_dynamics(tmp_path):
    texture = make_texture(np.random.default_rng(0))
    rng = np.random.default_rng(1)
    sys_ = SLAMSystem(make_cfg(), decoder_params={"layers": []},
                      decoder_spec=SPEC)
    for i in range(12):
        x = i * STEP
        mover_x = -1.0 + 0.45 * (i // 4)  # jumps ~0.45 m between keyframes
        dets = [
            detection_for([1.0, 0.0, 6.0], x, rng),     # static A
            detection_for([-1.5, 0.0, 7.5], x, rng),    # static B
            detection_for([mover_x, 0.3, 5.0], x, rng), # dynamic C
        ]
        sys_.track_stereo(render(texture, x), render(texture, x + BASELINE),
                          timestamp=i * 0.1, detections=dets)
    sys_.flush()

    valid = np.asarray(sys_.state.obj_valid)
    assert valid.sum() == 3
    centers = np.asarray(sys_.state.obj_pose)[valid][:, :3, 3]
    dyn = np.asarray(sys_.state.obj_dynamic)[valid]

    # identify objects by nearest expected center
    d_a = np.linalg.norm(centers - [1.0, 0.0, 6.0], axis=1)
    d_b = np.linalg.norm(centers - [-1.5, 0.0, 7.5], axis=1)
    ia, ib = int(np.argmin(d_a)), int(np.argmin(d_b))
    assert ia != ib
    assert d_a[ia] < 0.3 and d_b[ib] < 0.3
    assert not dyn[ia] and not dyn[ib]
    ic = ({0, 1, 2} - {ia, ib}).pop()
    assert dyn[ic]  # the mover got classified dynamic

    # export excludes the dynamic object
    sys_.save_entire_map(str(tmp_path))
    from dsp_slam_rgbd_tpu.system.io import load_map_objects

    ids, poses, codes = load_map_objects(str(tmp_path / "MapObjects.txt"))
    assert len(ids) == 2


def test_object_stage_batched_single_dispatch(monkeypatch):
    """8 detections on a keyframe cost ONE batched reconstruction program
    and ONE batched pose-refinement program — not 8 serialized dispatches
    (the reference's GIL-serialized per-detection calls,
    `LocalMapping_util.cc:86,158`, are the antipattern being replaced)."""
    from dsp_slam_rgbd_tpu.system import object_stage as ostage

    calls = {"recon": 0, "refine": 0, "single": 0}
    orig_recon = ostage.recon_unmatched
    orig_refine = ostage.refine_associated

    def count_recon(*a, **k):
        calls["recon"] += 1
        return orig_recon(*a, **k)

    def count_refine(*a, **k):
        calls["refine"] += 1
        return orig_refine(*a, **k)

    from dsp_slam_rgbd_tpu.recon import optimizer as recon_opt

    orig_single = recon_opt.reconstruct_object

    def no_concrete_single(*a, **k):
        # vmap TRACES through reconstruct_object once per batched program —
        # that IS the batched path.  A call with CONCRETE detection arrays
        # would be the reference's per-detection serialized dispatch.
        import jax.core as jc

        if not any(isinstance(x, jc.Tracer) for x in a):
            calls["single"] += 1
        return orig_single(*a, **k)

    monkeypatch.setattr(ostage, "recon_unmatched", count_recon)
    monkeypatch.setattr(ostage, "refine_associated", count_refine)
    monkeypatch.setattr(recon_opt, "reconstruct_object",
                        no_concrete_single)

    from dataclasses import replace

    texture = make_texture(np.random.default_rng(0))
    rng = np.random.default_rng(2)
    cfg = make_cfg()
    cfg = replace(cfg, map=replace(cfg.map, max_obj=12, max_oobs=96))
    sys_ = SLAMSystem(cfg, decoder_params={"layers": []},
                      decoder_spec=SPEC)
    centers = [[-3.0 + 0.9 * j, 0.2 * (j % 2), 5.5 + 0.5 * j]
               for j in range(8)]
    n_kf_frames = 0
    for i in range(8):
        x = i * STEP
        dets = [detection_for(c, x, rng) for c in centers]
        out = sys_.track_stereo(render(texture, x),
                                render(texture, x + BASELINE),
                                timestamp=i * 0.1, detections=dets)
        if out["new_kf"]:
            n_kf_frames += 1
    sys_.flush()
    assert n_kf_frames >= 2
    # one batched recon on the first object keyframe (8 new objects), one
    # batched refine per subsequent object keyframe; NEVER per-detection
    assert calls["single"] == 0
    assert calls["recon"] <= n_kf_frames
    assert 1 <= calls["refine"] <= n_kf_frames
    assert int(np.asarray(sys_.state.obj_valid).sum()) == 8
