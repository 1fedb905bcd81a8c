"""DeepSDF decoder in pure JAX.

Re-implements the capability of the reference decoder
(`deep_sdf/deep_sdf_decoder.py:75-110`: an 8-layer weight-normed MLP over
[code, xyz] with latent re-injection at `latent_in` and a final tanh) as a
functional pytree model.  Differences by design:

  * weight-norm is folded into plain (W, b) at load time — inference only;
  * apply() is a stack of batched matmuls sized for the MXU; compute dtype
    is configurable (f32 default; bf16 for speed with f32 accumulation);
  * the value+input-Jacobian query (`get_batch_sdf_jacobian`,
    reference `loss_utils.py:82-113`) is one forward + one reverse sweep of
    batched matmuls — no per-point autograd graphs.

Params layout: {"layers": [(W_i, b_i), ...], "spec": DecoderSpec}.
W_i is stored (in_dim, out_dim) so apply is x @ W + b.
"""
from __future__ import annotations

import json
import os
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np


class DecoderSpec(NamedTuple):
    latent_size: int = 64
    dims: tuple = (512,) * 8
    latent_in: tuple = (4,)
    use_tanh_out: bool = True  # reference always applies final `th` tanh

    @property
    def in_dim(self) -> int:
        return self.latent_size + 3

    def layer_dims(self) -> list[tuple[int, int]]:
        """(in, out) per linear layer, replicating the reference arch rules
        (`deep_sdf_decoder.py:29-56`): at layer L in latent_in the *input* of
        layer L is concat(x, input), so the preceding layer's out_dim shrinks
        by in_dim."""
        dims = [self.in_dim] + list(self.dims) + [1]
        n = len(dims) - 1
        out = []
        for layer in range(n):
            out_dim = dims[layer + 1]
            if (layer + 1) in self.latent_in:
                out_dim -= self.in_dim
            # in_dim is dims[layer] even at latent_in layers: the concat with
            # the raw input happens before the matmul and the previous layer's
            # out_dim was shrunk to make room.
            out.append((dims[layer], out_dim))
        return out


class AnalyticSdfSpec(NamedTuple):
    """A closed-form SDF standing in for the MLP decoder.

    `fn(params, inputs)` maps (N, latent+3) -> (N,) SDF values.  Must be a
    module-level function (hashable) so the spec can be a jit static arg.
    Used by tests (synthetic quadrics à la SURVEY.md §4) and available for
    geometric-primitive objects at runtime.
    """
    latent_size: int
    fn: object

    @property
    def in_dim(self) -> int:
        return self.latent_size + 3


def init_params(spec: DecoderSpec, key: jax.Array, dtype=jnp.float32):
    layers = []
    for in_dim, out_dim in spec.layer_dims():
        key, k1, k2 = jax.random.split(key, 3)
        W = jax.random.normal(k1, (in_dim, out_dim), dtype) * jnp.sqrt(2.0 / in_dim)
        b = jnp.zeros((out_dim,), dtype)
        layers.append((W, b))
    return {"layers": layers}


def apply(params, spec: DecoderSpec, inputs: jnp.ndarray,
          compute_dtype=jnp.float32,
          precision=jax.lax.Precision.HIGH) -> jnp.ndarray:
    """Forward pass: inputs (N, latent+3) -> sdf (N,).

    Mirrors reference forward semantics (`deep_sdf_decoder.py:85-110`):
    ReLU between layers, concat(x, input) at latent_in layers, final tanh.

    Matmuls run at 3-pass bf16 (Precision.HIGH, ≈f32 accuracy) — the decoder
    dominates the FLOPs and the global "highest" default (6-pass, reserved
    for GN normal equations) would halve its throughput for no accuracy win.
    """
    if isinstance(spec, AnalyticSdfSpec):
        return spec.fn(params, inputs)
    x = inputs.astype(compute_dtype)
    inp = x
    n_layers = len(params["layers"])
    for i, (W, b) in enumerate(params["layers"]):
        if i in spec.latent_in:
            x = jnp.concatenate([x, inp], axis=-1)
        x = jnp.dot(x, W.astype(compute_dtype),
                    precision=precision,
                    preferred_element_type=jnp.float32) + b.astype(jnp.float32)
        if i < n_layers - 1:
            x = jax.nn.relu(x)
        x = x.astype(compute_dtype)
    x = x.astype(jnp.float32)
    if spec.use_tanh_out:
        x = jnp.tanh(x)
    return x[..., 0]


def sdf(params, spec: DecoderSpec, code: jnp.ndarray, xyz: jnp.ndarray,
        compute_dtype=jnp.float32,
        precision=jax.lax.Precision.HIGH) -> jnp.ndarray:
    """Query SDF at (N, 3) points with a single (latent,) code -> (N,)."""
    n = xyz.shape[0]
    inputs = jnp.concatenate(
        [jnp.broadcast_to(code, (n, code.shape[-1])), xyz], axis=-1
    )
    return apply(params, spec, inputs, compute_dtype, precision)


def sdf_and_input_jacobian(params, spec: DecoderSpec, code: jnp.ndarray,
                           xyz: jnp.ndarray, compute_dtype=jnp.float32):
    """Fused value + per-point input Jacobian.

    Returns (sdf (N,), d_sdf/d[code,xyz] (N, latent+3)).  Each output row
    depends only on its own input row, so grad-of-sum gives the row-wise
    Jacobian in one reverse sweep (the TPU replacement for the reference's
    `y.backward(w)` trick, `loss_utils.py:82-113`).
    """
    n = xyz.shape[0]
    inputs = jnp.concatenate(
        [jnp.broadcast_to(code, (n, code.shape[-1])), xyz], axis=-1
    )
    val, vjp_fn = jax.vjp(
        lambda ins: apply(params, spec, ins, compute_dtype), inputs
    )
    (jac,) = vjp_fn(jnp.ones_like(val))
    return val, jac


# ---------------------------------------------------------------------------
# Torch checkpoint import (reference `deep_sdf/workspace.py:202-223` format)
# ---------------------------------------------------------------------------

def load_torch_checkpoint(experiment_dir: str, checkpoint: str = "latest"):
    """Load a reference-format DeepSDF experiment dir into (params, spec).

    Expects `specs.json` + `ModelParameters/<checkpoint>.pth` with
    weight-normed linear layers (`lin{i}.weight_g` / `lin{i}.weight_v`),
    optionally under a DataParallel `module.` prefix.  Weight norm is folded:
    W = g * v / ||v||_row.
    """
    import torch

    specs = json.load(open(os.path.join(experiment_dir, "specs.json")))
    ns = specs["NetworkSpecs"]
    spec = DecoderSpec(
        latent_size=specs["CodeLength"],
        dims=tuple(ns["dims"]),
        latent_in=tuple(ns.get("latent_in", ())),
        use_tanh_out=True,
    )
    state = torch.load(
        os.path.join(experiment_dir, "ModelParameters", checkpoint + ".pth"),
        map_location="cpu", weights_only=False,
    )["model_state_dict"]
    state = {k.removeprefix("module."): v for k, v in state.items()}

    layers = []
    for i in range(len(spec.layer_dims())):
        pre = f"lin{i}."
        if pre + "weight_g" in state:
            g = state[pre + "weight_g"].numpy()  # (out, 1)
            v = state[pre + "weight_v"].numpy()  # (out, in)
            W = g * v / np.linalg.norm(v, axis=1, keepdims=True)
        else:
            W = state[pre + "weight"].numpy()
        b = state[pre + "bias"].numpy()
        layers.append((jnp.asarray(W.T), jnp.asarray(b)))
    return {"layers": layers}, spec


def save_npz(path: str, params, spec: DecoderSpec):
    """Native checkpoint format: flat npz of layer weights + spec."""
    flat = {}
    for i, (W, b) in enumerate(params["layers"]):
        flat[f"W{i}"] = np.asarray(W)
        flat[f"b{i}"] = np.asarray(b)
    flat["latent_size"] = np.asarray(spec.latent_size)
    flat["dims"] = np.asarray(spec.dims)
    flat["latent_in"] = np.asarray(spec.latent_in)
    np.savez(path, **flat)


def load_npz(path: str):
    z = np.load(path)
    spec = DecoderSpec(
        latent_size=int(z["latent_size"]),
        dims=tuple(int(d) for d in z["dims"]),
        latent_in=tuple(int(i) for i in z["latent_in"]),
    )
    layers = []
    i = 0
    while f"W{i}" in z:
        # weights may be stored fp16 (fixture compression); compute in f32
        layers.append((
            jnp.asarray(z[f"W{i}"], dtype=jnp.float32),
            jnp.asarray(z[f"b{i}"], dtype=jnp.float32),
        ))
        i += 1
    return {"layers": layers}, spec
