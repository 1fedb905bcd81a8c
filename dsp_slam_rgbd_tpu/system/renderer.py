"""Device-side object depth renderer.

The TPU replacement for the reference's offscreen GLSL pinhole renderer
(`include/Renderer.hpp:24-80`, driven by `ObjectDrawer.cc:53-132`): instead
of rasterizing an extracted mesh, render the fitted SDF directly — camera
rays x decoded SDF -> per-pixel expected depth via the same ray
termination-probability model the render loss uses (`recon/losses.py`), so
rendered images double as a render-loss diagnostic: what the loss "sees"
IS what gets drawn.

Everything is one jitted program: ray grid -> chord sampling -> SDF value
sweep -> occupancy -> termination probabilities -> expected depth + hit
mask.  Host code only saves PNGs.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from dsp_slam_rgbd_tpu.models import deepsdf
from dsp_slam_rgbd_tpu.ops import lie
from dsp_slam_rgbd_tpu.recon import losses


@partial(jax.jit, static_argnames=("spec", "hw", "n_samples", "stride"))
def render_object_depth(params, spec, code, t_cam_obj, cam_K, hw,
                        n_samples: int = 32, stride: int = 1,
                        th: float = 0.02):
    """Render one object's depth image.

    t_cam_obj: (4,4) Sim(3) object->camera (scale in the rotation block).
    cam_K: (3,3) intrinsics.  hw: (H, W) output size; `stride` renders
    every stride-th pixel (cheap previews).

    Returns (depth (H', W'), hit (H', W')): expected depth along each
    pixel ray under the termination-probability model, and whether the ray
    intersects the decoded surface (accumulated opacity > 0.5).
    """
    H, W = hw
    u = jnp.arange(0, W, stride, dtype=jnp.float32) + 0.5
    v = jnp.arange(0, H, stride, dtype=jnp.float32) + 0.5
    uu, vv = jnp.meshgrid(u, v)
    fx, fy = cam_K[0, 0], cam_K[1, 1]
    cx, cy = cam_K[0, 2], cam_K[1, 2]
    rays = jnp.stack([(uu - cx) / fx, (vv - cy) / fy,
                      jnp.ones_like(uu)], -1).reshape(-1, 3)  # (R, 3) z=1

    t_obj_cam = lie.inv_sim3(jnp.asarray(t_cam_obj, jnp.float32))
    depths, hit = losses.chord_sample_depths(t_obj_cam, rays, n_samples)
    R, M = depths.shape
    pts_obj = lie.transform_points(
        t_obj_cam, (rays[:, None, :] * depths[:, :, None]).reshape(-1, 3)
    )
    sdf = deepsdf.sdf(params, spec, code, pts_obj).reshape(R, M)
    inside = jnp.linalg.norm(pts_obj.reshape(R, M, 3), axis=-1) < 1.0
    occ = jnp.where(inside & hit[:, None], losses.sdf_to_occupancy(sdf, th),
                    0.0)
    acc = jnp.cumprod(1.0 - occ, axis=-1)
    acc_prev = jnp.concatenate([jnp.ones((R, 1)), acc[:, :-1]], axis=-1)
    p = occ * acc_prev                        # termination probabilities
    w = jnp.sum(p, axis=-1)                   # accumulated opacity
    d = jnp.sum(depths * p, axis=-1) / jnp.maximum(w, 1e-9)
    hit_px = hit & (w > 0.5)
    H2 = (H + stride - 1) // stride
    W2 = (W + stride - 1) // stride
    return (jnp.where(hit_px, d, 0.0).reshape(H2, W2),
            hit_px.reshape(H2, W2))


def render_map_objects(params, spec, state, cam_K, t_cw, hw,
                       n_samples: int = 32, stride: int = 1):
    """Composite depth render of all valid map objects from camera pose
    t_cw (the ObjectDrawer::DrawObjects role: per-object pose + code from
    the map, nearest surface wins)."""
    H2 = (hw[0] + stride - 1) // stride
    W2 = (hw[1] + stride - 1) // stride
    depth = np.zeros((H2, W2), np.float32)
    for o in np.nonzero(np.asarray(state.obj_valid))[0]:
        t_co = np.array(jnp.asarray(t_cw) @ state.obj_pose[int(o)])
        t_co[:3, :3] *= float(state.obj_scale[int(o)])
        d, h = render_object_depth(params, spec, state.obj_code[int(o)],
                                   jnp.asarray(t_co), jnp.asarray(cam_K),
                                   hw, n_samples=n_samples, stride=stride)
        d = np.asarray(d)
        h = np.asarray(h)
        closer = h & ((depth == 0) | (d < depth))
        depth[closer] = d[closer]
    return depth
