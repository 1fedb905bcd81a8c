"""Reference-format bridges, proven without real data.

The two on-disk formats a reference user brings along are (a) trained
DeepSDF experiment dirs (weight-normed torch checkpoints + specs.json —
`/root/reference/deep_sdf/workspace.py:202-223`) and (b) offline `.lbl`
detection labels (torch-saved per-frame boxes —
`/root/reference/reconstruct/kitti_sequence.py:106-107,163-165`).  No real
KITTI data or trained checkpoints exist in this environment, so these tests
SYNTHESIZE both formats with torch itself and assert byte-level round-trip
parity through our loaders."""
import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from dsp_slam_rgbd_tpu.models import deepsdf


def _make_weightnormed_state(spec, rng, prefix="module."):
    """A torch model_state_dict exactly as the reference trainer saves it:
    per-layer weight-norm factors `lin{i}.weight_g` (out, 1) and
    `lin{i}.weight_v` (out, in) plus `lin{i}.bias`, under the DataParallel
    `module.` prefix."""
    state = {}
    for i, (in_dim, out_dim) in enumerate(spec.layer_dims()):
        v = rng.standard_normal((out_dim, in_dim)).astype(np.float32)
        g = (rng.random((out_dim, 1)) + 0.5).astype(np.float32)
        b = (rng.standard_normal(out_dim) * 0.1).astype(np.float32)
        state[f"{prefix}lin{i}.weight_g"] = torch.tensor(g)
        state[f"{prefix}lin{i}.weight_v"] = torch.tensor(v)
        state[f"{prefix}lin{i}.bias"] = torch.tensor(b)
    return state


def _torch_forward(state, spec, inputs, prefix="module."):
    """Execute the weight-normed decoder in torch with the reference's
    forward semantics (`deep_sdf_decoder.py:85-110`): concat(x, input) at
    latent_in layers, ReLU between layers, final tanh."""
    x = torch.tensor(np.asarray(inputs, np.float32))
    inp = x
    n = len(spec.layer_dims())
    for i in range(n):
        if i in spec.latent_in:
            x = torch.cat([x, inp], dim=1)
        g = state[f"{prefix}lin{i}.weight_g"]
        v = state[f"{prefix}lin{i}.weight_v"]
        W = g * v / v.norm(dim=1, keepdim=True)
        x = x @ W.T + state[f"{prefix}lin{i}.bias"]
        if i < n - 1:
            x = torch.relu(x)
    return torch.tanh(x)[:, 0].numpy()


def test_torch_checkpoint_roundtrip(tmp_path):
    """Synthesized weight-normed experiment dir → load_torch_checkpoint →
    forward parity vs torch executing the SAME weights."""
    spec = deepsdf.DecoderSpec(latent_size=8, dims=(32,) * 8, latent_in=(4,))
    rng = np.random.default_rng(0)
    state = _make_weightnormed_state(spec, rng)

    exp = tmp_path / "exp"
    (exp / "ModelParameters").mkdir(parents=True)
    json.dump(
        {"CodeLength": spec.latent_size,
         "NetworkSpecs": {"dims": list(spec.dims),
                          "latent_in": list(spec.latent_in)}},
        open(exp / "specs.json", "w"))
    torch.save({"epoch": 7, "model_state_dict": state},
               exp / "ModelParameters" / "latest.pth")

    params, spec2 = deepsdf.load_torch_checkpoint(str(exp))
    assert spec2.dims == spec.dims and spec2.latent_in == spec.latent_in

    code = rng.standard_normal(spec.latent_size).astype(np.float32) * 0.3
    xyz = rng.uniform(-0.9, 0.9, (64, 3)).astype(np.float32)
    ours = np.asarray(deepsdf.sdf(params, spec2, jnp.asarray(code),
                                  jnp.asarray(xyz)))
    inputs = np.concatenate([np.tile(code, (64, 1)), xyz], axis=1)
    ref = _torch_forward(state, spec, inputs)
    np.testing.assert_allclose(ours, ref, atol=2e-5)

    # and through the native npz format
    npz = tmp_path / "decoder.npz"
    deepsdf.save_npz(str(npz), params, spec2)
    params3, spec3 = deepsdf.load_npz(str(npz))
    ours3 = np.asarray(deepsdf.sdf(params3, spec3, jnp.asarray(code),
                                   jnp.asarray(xyz)))
    np.testing.assert_allclose(ours3, ref, atol=2e-5)


def test_lbl_labels_roundtrip(tmp_path):
    """Synthesized torch `.lbl` files → convert_reference_labels →
    npz fixtures our sequence loader reads, with the box→pose convention
    intact (scale = l/2 in the rotation block; bottom-center lifted by
    h/2)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tools"))
    import convert_reference_labels as conv

    from dsp_slam_rgbd_tpu.system.sequence import (load_label_file,
                                                   save_label_file)

    rng = np.random.default_rng(1)
    boxes = np.asarray([
        # x, y, z, l, h, w, yaw (camera frame)
        [2.0, 1.5, 14.0, 4.0, 1.6, 1.8, 0.3],
        [-3.0, 1.4, 22.0, 3.8, 1.5, 1.7, -1.2],
    ], np.float32)
    lbl_dir = tmp_path / "lbl"
    lbl_dir.mkdir()
    torch.save({"boxes": torch.tensor(boxes)}, lbl_dir / "000000.lbl")

    dets = conv.boxes_to_detections(
        np.asarray(torch.load(lbl_dir / "000000.lbl",
                              weights_only=False)["boxes"]))
    assert len(dets) == 2
    for det, b in zip(dets, boxes):
        x, y, z, l, h, w, yaw = b
        # make_detection factored the scale out: det.scale == l/2
        np.testing.assert_allclose(det.scale, l / 2.0, rtol=1e-5)
        np.testing.assert_allclose(det.t_co[:3, 3], [x, y - h / 2.0, z],
                                   rtol=1e-5)
        R = np.asarray(det.t_co)[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        np.testing.assert_allclose(
            R @ np.asarray([0, 0, 1.0]),
            [np.sin(yaw), 0.0, np.cos(yaw)], atol=1e-5)

    # write-read cycle through the npz fixture format
    out = tmp_path / "000000.npz"
    save_label_file(str(out), dets)
    back = load_label_file(str(out))
    assert len(back) == 2
    for a, b in zip(back, dets):
        np.testing.assert_allclose(a.t_co, b.t_co, rtol=1e-6)
        np.testing.assert_allclose(a.scale, b.scale, rtol=1e-6)
