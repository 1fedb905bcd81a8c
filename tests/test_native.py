"""Native C++ runtime tests (builds the shared lib on first run)."""
import numpy as np
import pytest

native = pytest.importorskip("dsp_slam_rgbd_tpu.native.runtime")


def test_read_velodyne(tmp_path):
    rng = np.random.default_rng(0)
    pts = rng.standard_normal((500, 4)).astype(np.float32)
    path = tmp_path / "000000.bin"
    pts.tofile(path)
    out = native.read_velodyne(str(path))
    assert out.shape == (500, 3)
    np.testing.assert_allclose(out, pts[:, :3])


def test_voxel_downsample():
    # two clusters of coincident points -> 2 survivors at voxel 1.0
    pts = np.asarray([[0.1, 0.1, 0.1]] * 50 + [[5.0, 5.0, 5.0]] * 50,
                     np.float32)
    out = native.voxel_downsample(pts, 1.0)
    assert len(out) == 2


def test_box_crop():
    rng = np.random.default_rng(1)
    pts = rng.uniform(-5, 5, (1000, 3)).astype(np.float32)
    R = np.eye(3, dtype=np.float32)
    t = np.zeros(3, np.float32)
    half = np.asarray([1.0, 1.0, 1.0], np.float32)
    out = native.box_crop(pts, R, t, half)
    inside = np.all(np.abs(pts) <= 1.0, axis=1)
    assert len(out) == inside.sum()
    # rotated crop
    th = np.pi / 4
    R2 = np.asarray([[np.cos(th), -np.sin(th), 0],
                     [np.sin(th), np.cos(th), 0], [0, 0, 1]], np.float32)
    out2 = native.box_crop(pts, R2, t, half)
    local = pts @ R2  # R^T p rows
    inside2 = np.all(np.abs(local) <= 1.0, axis=1)
    assert len(out2) == inside2.sum()


def test_prefetcher(tmp_path):
    paths = []
    for i in range(5):
        p = tmp_path / f"f{i}.bin"
        p.write_bytes(bytes([i]) * (100 + i))
        paths.append(str(p))
    pf = native.Prefetcher(paths)
    for i in range(5):
        data = pf.get(i)
        assert data == bytes([i]) * (100 + i)
    # random access also works
    assert pf.get(1) == bytes([1]) * 101
    pf.close()
