import numpy as np

from dsp_slam_rgbd_tpu.models import mesh


def sphere_sdf_grid(D=32, r=0.6):
    lin = np.linspace(-1, 1, D, dtype=np.float32)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    return np.sqrt(x * x + y * y + z * z) - r


def test_voxel_grid():
    pts = np.asarray(mesh.create_voxel_grid(8))
    assert pts.shape == (512, 3)
    assert pts.min() == -1.0 and pts.max() == 1.0


def test_marching_tetrahedra_sphere():
    r = 0.6
    verts, faces = mesh.marching_tetrahedra(sphere_sdf_grid(48, r))
    assert len(verts) > 100 and len(faces) > 100
    radii = np.linalg.norm(verts, axis=1)
    # vertices lie on the sphere within a grid cell
    assert np.abs(radii - r).max() < 2.0 / 47
    # faces index valid vertices
    assert faces.max() < len(verts) and faces.min() >= 0
    # (near-)closed surface: edges shared by exactly two faces; the small
    # remainder comes from degenerate triangles dropped when a zero crossing
    # lands exactly on a grid corner
    edges = np.concatenate(
        [faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]], axis=0
    )
    edges = np.sort(edges, axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).mean() > 0.98
    # outward orientation: face normals point away from center
    tri = verts[faces]
    n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    c = tri.mean(axis=1)
    frac_outward = (np.sum(n * c, axis=1) > 0).mean()
    assert frac_outward > 0.95


def test_empty_grid():
    grid = np.ones((16, 16, 16), np.float32)
    verts, faces = mesh.marching_tetrahedra(grid)
    assert len(verts) == 0 and len(faces) == 0


def test_write_ply(tmp_path):
    verts, faces = mesh.marching_tetrahedra(sphere_sdf_grid(16))
    p = tmp_path / "m.ply"
    mesh.write_ply(str(p), verts, faces)
    head = p.read_text().splitlines()
    assert head[0] == "ply"
    assert f"element vertex {len(verts)}" in head
