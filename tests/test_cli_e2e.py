"""CLI end-to-end: write a synthetic stereo sequence to disk, run
tools/run_slam.py as a subprocess, verify its output artifacts."""
import os
import subprocess
import sys

import numpy as np
import pytest

from test_system_e2e import BASELINE, STEP, make_texture, render


@pytest.fixture(scope="module")
def seq_dir(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("seq")
    (root / "image_2").mkdir()
    (root / "image_3").mkdir()
    texture = make_texture(np.random.default_rng(0))
    for i in range(10):
        x = i * STEP
        for sub, cam_x in (("image_2", x), ("image_3", x + BASELINE)):
            img = np.clip(render(texture, cam_x), 0, 255).astype(np.uint8)
            Image.fromarray(img).save(root / sub / f"{i:06d}.png")
    return root


def test_run_slam_cli(seq_dir, tmp_path):
    # matching intrinsics for the synthetic world, as a reference-style yaml
    yaml = tmp_path / "cam.yaml"
    yaml.write_text(
        "Camera.fx: 200.0\nCamera.fy: 200.0\nCamera.cx: 112.0\n"
        "Camera.cy: 80.0\nCamera.bf: 100.0\nCamera.fps: 10.0\n"
        "ThDepth: 60.0\nORBextractor.nFeatures: 400\n"
        "ORBextractor.nLevels: 3\n"
    )
    out_dir = tmp_path / "out"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = env.get("XLA_FLAGS", "") + \
        " --xla_force_host_platform_device_count=1"
    # force CPU despite the axon plugin (see conftest note)
    sitecustom = tmp_path / "sitecustomize.py"
    sitecustom.write_text(
        "import jax\njax.config.update('jax_platforms', 'cpu')\n"
    )
    env["PYTHONPATH"] = f"{tmp_path}:{os.path.dirname(os.path.dirname(os.path.abspath(__file__)))}"

    proc = subprocess.run(
        [sys.executable, "tools/run_slam.py", str(seq_dir), str(out_dir),
         "--sensor", "stereo", "--yaml", str(yaml), "--max-frames", "10"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=500,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "median tracking time" in proc.stdout

    traj = out_dir / "CameraTrajectory.txt"
    assert traj.exists()
    rows = np.loadtxt(traj, ndmin=2)
    assert rows.shape[0] >= 8 and rows.shape[1] == 12
    # trajectory moves in +x by roughly the commanded path length
    assert 0.7 < rows[-1, 3] < 1.6
    assert (out_dir / "MapPoints.txt").exists()
    assert (out_dir / "Cameras.txt").exists()
    assert (out_dir / "CameraTrajectory_TUM.txt").exists()


def test_run_slam_cli_rgbd(tmp_path):
    """run_slam.py on a Redwood-style rgb/ + depth/ sequence (the fork's
    RGB-D entry point, reference `System::TrackRGBD` `src/System.cc:212`):
    the CLI auto-detects the layout (`sequence.get_sequence`), tracks via
    depth-synthesized stereo coordinates, and writes the same artifact
    set."""
    from PIL import Image

    from test_rgbd_e2e import depth_map

    root = tmp_path / "seq"
    (root / "rgb").mkdir(parents=True)
    (root / "depth").mkdir()
    texture = make_texture(np.random.default_rng(0))
    for i in range(10):
        x = i * STEP
        img = np.clip(render(texture, x), 0, 255).astype(np.uint8)
        Image.fromarray(img).save(root / "rgb" / f"{i:06d}.png")
        # 16-bit millimetre depth (RgbdSequence's default 1/1000 scale)
        dep_mm = (depth_map(x) * 1000.0).astype(np.uint16)
        Image.fromarray(dep_mm).save(root / "depth" / f"{i:06d}.png")

    yaml = tmp_path / "cam.yaml"
    yaml.write_text(
        "Camera.fx: 200.0\nCamera.fy: 200.0\nCamera.cx: 112.0\n"
        "Camera.cy: 80.0\nCamera.bf: 100.0\nCamera.fps: 10.0\n"
        "ThDepth: 60.0\nORBextractor.nFeatures: 400\n"
        "ORBextractor.nLevels: 3\n"
    )
    out_dir = tmp_path / "out"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = env.get("XLA_FLAGS", "") + \
        " --xla_force_host_platform_device_count=1"
    sitecustom = tmp_path / "sitecustomize.py"
    sitecustom.write_text(
        "import jax\njax.config.update('jax_platforms', 'cpu')\n"
    )
    env["PYTHONPATH"] = (
        f"{tmp_path}:"
        f"{os.path.dirname(os.path.dirname(os.path.abspath(__file__)))}")

    proc = subprocess.run(
        [sys.executable, "tools/run_slam.py", str(root), str(out_dir),
         "--sensor", "rgbd", "--yaml", str(yaml), "--max-frames", "10"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=500,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    traj = out_dir / "CameraTrajectory.txt"
    assert traj.exists()
    rows = np.loadtxt(traj, ndmin=2)
    assert rows.shape[0] >= 8 and rows.shape[1] == 12
    assert 0.7 < rows[-1, 3] < 1.6  # moved ~the commanded +x path
    assert (out_dir / "MapPoints.txt").exists()
