import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dsp_slam_rgbd_tpu.models import deepsdf

REF = "/root/reference"


def small_spec():
    return deepsdf.DecoderSpec(latent_size=8, dims=(32, 32, 32, 32), latent_in=(2,))


def test_layer_dims_default():
    spec = deepsdf.DecoderSpec()
    dims = spec.layer_dims()
    assert len(dims) == 9
    assert dims[0] == (67, 512)
    assert dims[3] == (512, 512 - 67)  # layer before latent_in shrinks
    assert dims[4] == (512, 512)       # concat restores 512 input
    assert dims[-1] == (512, 1)


def test_forward_shapes_and_range():
    spec = small_spec()
    params = deepsdf.init_params(spec, jax.random.PRNGKey(0))
    code = jnp.zeros(8)
    xyz = jnp.asarray(np.random.default_rng(0).standard_normal((100, 3)),
                      dtype=jnp.float32)
    vals = deepsdf.sdf(params, spec, code, xyz)
    assert vals.shape == (100,)
    assert jnp.all(jnp.abs(vals) <= 1.0)  # tanh output


def test_jacobian_matches_jacfwd():
    spec = small_spec()
    params = deepsdf.init_params(spec, jax.random.PRNGKey(1))
    rng = np.random.default_rng(1)
    code = jnp.asarray(rng.standard_normal(8) * 0.1, dtype=jnp.float32)
    xyz = jnp.asarray(rng.standard_normal((16, 3)) * 0.5, dtype=jnp.float32)

    val, jac = deepsdf.sdf_and_input_jacobian(params, spec, code, xyz)
    assert val.shape == (16,)
    assert jac.shape == (16, 11)

    # oracle: per-point jacfwd
    def f_point(inp):
        return deepsdf.apply(params, spec, inp[None, :])[0]

    n = xyz.shape[0]
    inputs = jnp.concatenate([jnp.broadcast_to(code, (n, 8)), xyz], axis=-1)
    jac_ref = jax.vmap(jax.jacfwd(f_point))(inputs)
    np.testing.assert_allclose(np.asarray(jac), np.asarray(jac_ref), atol=1e-5)
    val_ref = jax.vmap(f_point)(inputs)
    np.testing.assert_allclose(np.asarray(val), np.asarray(val_ref), atol=1e-6)


def _make_torch_checkpoint(tmp_path, spec):
    """Synthesize a reference-format DeepSDF experiment dir."""
    import json

    import torch

    exp = tmp_path / "exp"
    (exp / "ModelParameters").mkdir(parents=True)
    json.dump(
        {
            "CodeLength": spec.latent_size,
            "NetworkArch": "deep_sdf_decoder",
            "NetworkSpecs": {
                "dims": list(spec.dims),
                "latent_in": list(spec.latent_in),
                "dropout": None,
                "dropout_prob": 0.0,
                "norm_layers": list(range(len(spec.dims) + 1)),
                "weight_norm": True,
                "xyz_in_all": False,
                "use_tanh": False,
                "latent_dropout": False,
            },
        },
        open(exp / "specs.json", "w"),
    )
    torch.manual_seed(0)
    state = {}
    for i, (in_dim, out_dim) in enumerate(spec.layer_dims()):
        v = torch.randn(out_dim, in_dim) * 0.2
        g = torch.rand(out_dim, 1) + 0.5
        state[f"module.lin{i}.weight_g"] = g
        state[f"module.lin{i}.weight_v"] = v
        state[f"module.lin{i}.bias"] = torch.randn(out_dim) * 0.01
    torch.save({"model_state_dict": state},
               exp / "ModelParameters" / "latest.pth")
    return str(exp)


def test_torch_checkpoint_import_and_parity(tmp_path):
    torch = pytest.importorskip("torch")
    spec = small_spec()
    exp_dir = _make_torch_checkpoint(tmp_path, spec)
    params, loaded_spec = deepsdf.load_torch_checkpoint(exp_dir)
    assert loaded_spec.latent_size == spec.latent_size
    assert loaded_spec.latent_in == spec.latent_in

    rng = np.random.default_rng(2)
    code = rng.standard_normal(spec.latent_size).astype(np.float32) * 0.2
    xyz = rng.standard_normal((64, 3)).astype(np.float32) * 0.5
    ours = deepsdf.sdf(params, loaded_spec, jnp.asarray(code), jnp.asarray(xyz))

    # oracle: the reference's own torch Decoder run on the same checkpoint
    if os.path.isdir(REF):
        sys.path.insert(0, REF)
        try:
            from deep_sdf.deep_sdf_decoder import Decoder

            dec = Decoder(
                spec.latent_size,
                dims=list(spec.dims),
                latent_in=list(spec.latent_in),
                weight_norm=True,
                norm_layers=list(range(len(spec.dims) + 1)),
            )
            dec = torch.nn.DataParallel(dec)
            sd = torch.load(
                os.path.join(exp_dir, "ModelParameters", "latest.pth"),
                weights_only=False,
            )["model_state_dict"]
            dec.load_state_dict(sd)
            dec = dec.module.eval()
            with torch.no_grad():
                inp = torch.from_numpy(
                    np.concatenate([np.tile(code, (64, 1)), xyz], axis=-1)
                )
                ref_vals = dec(inp).numpy()[:, 0]
            np.testing.assert_allclose(np.asarray(ours), ref_vals, atol=2e-5)
        finally:
            sys.path.remove(REF)

    # npz roundtrip
    deepsdf.save_npz(str(tmp_path / "dec.npz"), params, loaded_spec)
    params2, spec2 = deepsdf.load_npz(str(tmp_path / "dec.npz"))
    ours2 = deepsdf.sdf(params2, spec2, jnp.asarray(code), jnp.asarray(xyz))
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ours2), atol=1e-7)
