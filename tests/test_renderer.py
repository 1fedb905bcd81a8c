"""Object depth renderer (Renderer.hpp/ObjectDrawer role): SDF ray render
produces geometrically correct depth."""
import numpy as np
import jax.numpy as jnp

from dsp_slam_rgbd_tpu.models import deepsdf
from dsp_slam_rgbd_tpu.system.renderer import (render_map_objects,
                                               render_object_depth)

CODE_LEN = 4
R_BASE, R_GAIN = 0.5, 0.2


def sphere_fn(params, inputs):
    xyz = inputs[..., CODE_LEN:]
    r = R_BASE + R_GAIN * inputs[..., 0]
    return jnp.linalg.norm(xyz, axis=-1) - r


SPEC = deepsdf.AnalyticSdfSpec(latent_size=CODE_LEN, fn=sphere_fn)
PARAMS = {"layers": []}
K = np.array([[100.0, 0, 64.0], [0, 100.0, 48.0], [0, 0, 1]], np.float32)


def test_depth_render_of_sphere():
    code = jnp.asarray([0.5, 0, 0, 0])        # radius 0.6 (normalized)
    scale = 2.0                                # world radius 1.2
    t_co = np.eye(4, dtype=np.float32)
    t_co[:3, :3] *= scale
    t_co[2, 3] = 8.0
    d, h = render_object_depth(PARAMS, SPEC, code, jnp.asarray(t_co),
                               jnp.asarray(K), (96, 128), n_samples=48)
    d, h = np.asarray(d), np.asarray(h)
    assert h.any()
    # center pixel: depth = dist - world radius
    assert abs(d[48, 64] - (8.0 - 1.2)) < 0.08
    # silhouette size: radius in pixels ~ fx * r / d_center
    rows, cols = np.nonzero(h)
    rad_px = 0.5 * (cols.max() - cols.min())
    assert abs(rad_px - 100.0 * 1.2 / 8.0) < 3.0
    # background rays don't hit
    assert not h[0, 0]
    # depth increases toward the silhouette edge (sphere curvature)
    assert d[48, 64] < d[rows.min() + 1:rows.min() + 2, 64] + 1e-3


def test_render_map_objects_composites_nearest():
    from dsp_slam_rgbd_tpu.mapping import map_state as ms

    st = ms.empty(max_kf=2, max_feat=8, max_pts=8, max_obj=4,
                  code_len=CODE_LEN)
    # two spheres on the optical axis, one behind the other
    t1 = np.eye(4, dtype=np.float32)
    t1[:3, 3] = [0, 0, 6.0]
    t2 = np.eye(4, dtype=np.float32)
    t2[:3, 3] = [0, 0, 12.0]
    st = st._replace(
        obj_pose=st.obj_pose.at[0].set(jnp.asarray(t1)).at[1].set(
            jnp.asarray(t2)),
        obj_scale=st.obj_scale.at[0].set(1.0).at[1].set(1.0),
        obj_code=st.obj_code.at[:2, 0].set(0.5),
        obj_valid=st.obj_valid.at[:2].set(True),
    )
    depth = render_map_objects(PARAMS, SPEC, st, K, jnp.eye(4), (96, 128),
                               n_samples=48)
    # the nearer sphere wins on the shared axis
    assert abs(depth[48, 64] - (6.0 - 0.6)) < 0.08
