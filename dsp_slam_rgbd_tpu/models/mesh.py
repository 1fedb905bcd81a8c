"""Mesh extraction from SDF voxel grids.

Covers the reference `MeshExtractor` (`reconstruct/optimizer.py:216-233`) and
`create_voxel_grid`/`convert_sdf_voxels_to_mesh` (`reconstruct/utils.py:97-140`):
decode the SDF on a regular grid over [-1, 1]³ on device, then triangulate the
zero isosurface on host.

The triangulation is **marching tetrahedra** (6 tets per cube) rather than
skimage's marching cubes: table-free, watertight, and vectorized in numpy.
Vertex positions are exact linear-interpolated zero crossings, so the surface
matches marching cubes up to triangulation of ambiguous cells.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Canonical 6-tetrahedra decomposition of a unit cube around the main
# diagonal 0-7 (corner k = (x=(k>>0)&1, y=(k>>1)&1, z=(k>>2)&1)): one tet per
# edge-path 0→a→b→7.  This decomposition is face-consistent across adjacent
# cubes (every shared cube face gets the same diagonal from both sides), so
# the extracted surface is watertight.
_TETS = np.array(
    [
        [0, 1, 3, 7],
        [0, 1, 5, 7],
        [0, 2, 3, 7],
        [0, 2, 6, 7],
        [0, 4, 5, 7],
        [0, 4, 6, 7],
    ],
    dtype=np.int32,
)

_CORNER_OFFSETS = np.array(
    [[(k >> 0) & 1, (k >> 1) & 1, (k >> 2) & 1] for k in range(8)], dtype=np.int32
)


def create_voxel_grid(vol_dim: int = 64, extent: float = 1.0) -> jnp.ndarray:
    """(vol_dim³, 3) grid points spanning [-extent, extent]³ (x fastest is
    irrelevant — we use index order (i, j, k) -> (x, y, z) row-major like the
    reference's meshgrid flatten, `utils.py:97-116`)."""
    lin = jnp.linspace(-extent, extent, vol_dim, dtype=jnp.float32)
    x, y, z = jnp.meshgrid(lin, lin, lin, indexing="ij")
    return jnp.stack([x.ravel(), y.ravel(), z.ravel()], axis=-1)


def sdf_bbox(params, spec, code, vol_dim: int = 24, extent: float = 1.1):
    """Device-side bbox of the decoded shape's interior (sdf < 0).

    The in-loop replacement for the reference's mesh-vertex min/max used by
    `MapObject::RemoveOutliersModel` (`MapObject.cc:285-296`): instead of
    running marching cubes per reconstruction, decode the SDF on a coarse
    grid and take the bounding box of the negative cells — one batched MLP
    forward, no host sync beyond the final 2×3 floats.

    Returns (bbox_min (3,), bbox_max (3,)) in normalized object
    coordinates; falls back to ±1 when nothing is inside.
    """
    from dsp_slam_rgbd_tpu.models import deepsdf

    grid = create_voxel_grid(vol_dim, extent)
    vals = deepsdf.sdf(params, spec, jnp.asarray(code), grid)
    inside = vals < 0.0
    big = jnp.where(inside[:, None], grid, jnp.inf)
    small = jnp.where(inside[:, None], grid, -jnp.inf)
    bb_min = jnp.min(big, axis=0)
    bb_max = jnp.max(small, axis=0)
    ok = jnp.isfinite(bb_min) & jnp.isfinite(bb_max)
    return (jnp.where(ok, bb_min, -1.0), jnp.where(ok, bb_max, 1.0))


def marching_tetrahedra(sdf_grid: np.ndarray, extent: float = 1.0):
    """Triangulate the zero isosurface of a (D, D, D) SDF grid.

    Returns (vertices (V, 3) float32 in the grid's world coords,
    faces (F, 3) int32).  Inside is sdf < 0 (SDF convention).
    """
    sdf = np.asarray(sdf_grid, dtype=np.float32)
    D = sdf.shape[0]
    assert sdf.shape == (D, D, D)
    spacing = 2.0 * extent / (D - 1)

    # all cube base indices
    idx = np.stack(
        np.meshgrid(np.arange(D - 1), np.arange(D - 1), np.arange(D - 1),
                    indexing="ij"),
        axis=-1,
    ).reshape(-1, 3)  # (C, 3)

    # corner sdf values per cube: (C, 8)
    corners = idx[:, None, :] + _CORNER_OFFSETS[None, :, :]  # (C, 8, 3)
    vals = sdf[corners[..., 0], corners[..., 1], corners[..., 2]]  # (C, 8)

    # quick reject: cubes with no sign change
    active = (vals.min(axis=1) < 0.0) & (vals.max(axis=1) >= 0.0)
    if not np.any(active):
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)
    idx = idx[active]
    vals = vals[active]
    corners = corners[active]

    verts_out = []
    faces_out = []
    n_verts = 0

    # corner world positions (Ca, 8, 3)
    pos = corners.astype(np.float32) * spacing - extent

    for tet in _TETS:
        tv = vals[:, tet]  # (Ca, 4)
        tp = pos[:, tet]  # (Ca, 4, 3)
        inside = tv < 0.0  # (Ca, 4)
        case = (
            inside[:, 0].astype(np.int32)
            | (inside[:, 1] << 1)
            | (inside[:, 2] << 2)
            | (inside[:, 3] << 3)
        )

        def interp(sel, a, b):
            """Zero-crossing on edge (a, b) for selected tets."""
            va, vb = tv[sel, a], tv[sel, b]
            t = va / np.where(np.abs(va - vb) < 1e-12, 1e-12, va - vb)
            t = np.clip(t, 0.0, 1.0)[:, None]
            return tp[sel, a] * (1 - t) + tp[sel, b] * t

        def orient(tris, sel):
            """Flip triangles whose normal points toward the inside region.

            dir_out = centroid(outside corners) − centroid(inside corners);
            robust against tet orientation sign differences among the 6 tets.
            """
            w_in = inside[sel].astype(np.float32)  # (S, 4)
            w_out = 1.0 - w_in
            c_in = (tp[sel] * w_in[..., None]).sum(1) / w_in.sum(1, keepdims=True)
            c_out = (tp[sel] * w_out[..., None]).sum(1) / w_out.sum(1, keepdims=True)
            d = c_out - c_in  # (S, 3)
            nrm = np.cross(tris[:, :, 1] - tris[:, :, 0],
                           tris[:, :, 2] - tris[:, :, 0])  # (S, T, 3)
            flip = (nrm * d[:, None, :]).sum(-1) < 0  # (S, T)
            tris = tris.copy()
            tmp = tris[flip][:, [0, 2, 1]]
            tris[flip] = tmp
            return tris

        # one-corner-inside (or one-outside) -> 1 triangle per tet
        single = {1: 0, 2: 1, 4: 2, 8: 3}
        for case_id, ci in single.items():
            others = [k for k in range(4) if k != ci]
            for cid in (case_id, 15 ^ case_id):
                sel = np.nonzero(case == cid)[0]
                if sel.size == 0:
                    continue
                p = [interp(sel, ci, e) for e in others]
                tris = np.stack(p, axis=1)[:, None, :, :]  # (S, 1, 3, 3)
                tris = orient(tris, sel)
                verts_out.append(tris.reshape(-1, 3))
                f = np.arange(sel.size * 3, dtype=np.int32).reshape(-1, 3) + n_verts
                faces_out.append(f)
                n_verts += sel.size * 3

        # two-inside -> quad (2 triangles) per tet
        double = {3: ((0, 1), (2, 3)), 5: ((0, 2), (1, 3)), 9: ((0, 3), (1, 2))}
        for case_id, ((a, b), (c, d)) in double.items():
            for cid in (case_id, 15 ^ case_id):
                sel = np.nonzero(case == cid)[0]
                if sel.size == 0:
                    continue
                if cid != case_id:
                    a_, b_, c_, d_ = c, d, a, b  # complement: swap in/out pairs
                else:
                    a_, b_, c_, d_ = a, b, c, d
                # inside pair (a_, b_), outside (c_, d_): quad across edges
                pac = interp(sel, a_, c_)
                pad = interp(sel, a_, d_)
                pbd = interp(sel, b_, d_)
                pbc = interp(sel, b_, c_)
                t1 = np.stack([pac, pad, pbd], axis=1)
                t2 = np.stack([pac, pbd, pbc], axis=1)
                tris = np.stack([t1, t2], axis=1)  # (S, 2, 3, 3)
                tris = orient(tris, sel)
                verts_out.append(tris.reshape(-1, 3))
                f = np.arange(sel.size * 6, dtype=np.int32).reshape(-1, 3) + n_verts
                faces_out.append(f)
                n_verts += sel.size * 6

    if not verts_out:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)
    vertices = np.concatenate(verts_out, axis=0).astype(np.float32)
    faces = np.concatenate(faces_out, axis=0).astype(np.int32)
    vertices, faces = _weld(vertices, faces)
    return vertices, faces


def _weld(vertices: np.ndarray, faces: np.ndarray, decimals: int = 6):
    """Merge duplicate vertices (tet faces share edges across cells)."""
    key = np.round(vertices, decimals)
    uniq, inverse = np.unique(key, axis=0, return_inverse=True)
    faces = inverse[faces].astype(np.int32)
    # drop degenerate faces
    ok = (
        (faces[:, 0] != faces[:, 1])
        & (faces[:, 1] != faces[:, 2])
        & (faces[:, 0] != faces[:, 2])
    )
    return uniq.astype(np.float32), faces[ok]


class MeshExtractor:
    """Device-side grid decode + host triangulation.

    API-compatible with the reference `MeshExtractor.extract_mesh_from_code`
    (`optimizer.py:224-233`): returns dict with `vertices`, `faces`.
    """

    def __init__(self, params, spec, code_len: int = 64, voxels_dim: int = 64,
                 compute_dtype=jnp.float32):
        import jax

        from dsp_slam_rgbd_tpu.models import deepsdf

        self.code_len = code_len
        self.voxels_dim = voxels_dim
        self.voxel_points = create_voxel_grid(voxels_dim)
        self._decode = jax.jit(
            lambda code: deepsdf.sdf(params, spec, code, self.voxel_points,
                                     compute_dtype)
        )

    def extract_mesh_from_code(self, code):
        code = jnp.asarray(code[: self.code_len], dtype=jnp.float32)
        sdf_vals = np.asarray(self._decode(code)).reshape(
            self.voxels_dim, self.voxels_dim, self.voxels_dim
        )
        vertices, faces = marching_tetrahedra(sdf_vals)
        return {"vertices": vertices, "faces": faces}


def write_ply(path: str, vertices: np.ndarray, faces: np.ndarray,
              color=(128, 128, 128)):
    """ASCII PLY writer (reference `utils.py:143-163` role)."""
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(vertices)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write(f"element face {len(faces)}\n")
        f.write("property list uchar int vertex_indices\nend_header\n")
        r, g, b = color
        for v in vertices:
            f.write(f"{v[0]:.6f} {v[1]:.6f} {v[2]:.6f} {r} {g} {b}\n")
        for face in faces:
            f.write(f"3 {face[0]} {face[1]} {face[2]}\n")
