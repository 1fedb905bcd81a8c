"""Pallas TPU kernel: fused DeepSDF forward + input-Jacobian.

The hot op of the whole system (SURVEY.md §7 step 3): SDF value and
d(sdf)/d(code, xyz) for a batch of query points.  The stock XLA path
(`models.deepsdf.sdf_and_input_jacobian`) runs 18 matmuls with HBM-resident
intermediates; this kernel keeps the activation stack and the running
gradient in VMEM for a whole point tile, so the backward sweep never touches
HBM.

Layout trick: all layers are padded to a uniform 512x512 so the kernel is a
static 9-step loop.
  * layer 0 input: [code, xyz] in columns 0..66, zeros elsewhere
    (zero-padded weight rows make the padding inert);
  * layer 3's 445 output columns are padded with zero columns, and before
    layer 4 the kernel writes the raw input into columns 445..511 —
    exactly the reference decoder's latent re-injection concat
    (`deep_sdf_decoder.py:87-88`);
  * layer 8's single output lives in column 0 of a padded 512-wide result.

STATUS: compiles and validates on TPU hardware (Mosaic toolchain working
as of 2026-08-18; the earlier SIGILL was environmental and is gone).
Measured on 1x v5e at N=8192 points: f32-HIGH XLA path 1.36 ms, bf16 XLA
path 0.88 ms; this kernel's value-add is the bf16 mode, which keeps the
weight stack + activations + running gradient in VMEM for the whole
forward+backward sweep.  The f32 mode exists for apples-to-apples parity
checks and is NOT faster than XLA (XLA is already at the f32 matmul
roofline for this shape).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

D = 512
IN_DIM = 67     # 64 code + 3 xyz
SPLIT = 445     # layer-3 real output width (D − IN_DIM)
N_LAYERS = 9
TILE = 256


def pack_params(params, spec) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pad the decoder layers into (9, 512, 512) W and (9, 512) b.

    Requires the standard cars/chairs_64 architecture: latent 64, 8x512
    dims, latent_in=(4,).
    """
    assert spec.latent_size + 3 == IN_DIM, "kernel assumes 64-d codes"
    assert tuple(spec.latent_in) == (4,)
    assert len(params["layers"]) == N_LAYERS
    W = np.zeros((N_LAYERS, D, D), np.float32)
    b = np.zeros((N_LAYERS, D), np.float32)
    for i, (Wi, bi) in enumerate(params["layers"]):
        wi = np.asarray(Wi)
        W[i, : wi.shape[0], : wi.shape[1]] = wi
        b[i, : wi.shape[1]] = np.asarray(bi)
    return jnp.asarray(W), jnp.asarray(b)


def _make_kernel(compute_dtype):
    """Kernel factory: compute_dtype selects MXU mode.

    bf16 -> 1-pass MXU with f32 accumulation (the production mode; same
    precision class as the validated ReconConfig.tpu_fast()+bf16 XLA path);
    f32 -> HIGHEST (6-pass) — strictly MORE accurate than the XLA HIGH
    path (Mosaic only supports DEFAULT/HIGHEST), so f32-mode results differ
    slightly from the stock path; used for parity checks, not bit-matching.
    """
    bf16 = compute_dtype == jnp.bfloat16
    # Mosaic supports only DEFAULT / HIGHEST dot precision; f32 mode uses
    # HIGHEST (6-pass) — strictly more accurate than the XLA HIGH path
    precision = (jax.lax.Precision.DEFAULT if bf16
                 else jax.lax.Precision.HIGHEST)

    def _kernel(x_ref, w_ref, b_ref, sdf_ref, grad_ref, relu_ref):
        """One tile: x (TILE, 512) padded inputs -> sdf (TILE, 1) +
        input-gradient (TILE, 512) (columns 0..66 meaningful).

        relu_ref: (8, TILE, D) bf16 scratch holding the ReLU masks — the
        only forward residue the backward sweep needs.
        """
        inj_cols = jax.lax.broadcasted_iota(jnp.int32, (TILE, D), 1) >= SPLIT
        x = x_ref[:]  # (T, D)
        h = x
        for i in range(N_LAYERS):
            if i == 4:
                # latent re-injection: columns SPLIT.. get the raw input's
                # first IN_DIM entries (static rotate-by-SPLIT via concat)
                shifted = jnp.concatenate(
                    [x[:, D - SPLIT:], x[:, : D - SPLIT]], axis=1
                )  # cols 0..66 -> 445..511
                h = jnp.where(inj_cols, shifted, h)
            pre = (
                jnp.dot(h.astype(compute_dtype), w_ref[i],
                        precision=precision,
                        preferred_element_type=jnp.float32)
                + b_ref[i][None, :]
            )
            if i < N_LAYERS - 1:
                h = jnp.maximum(pre, 0.0)
                relu_ref[i] = (pre > 0.0).astype(jnp.bfloat16)
            else:
                h = pre
        raw = h[:, 0:1]  # (T, 1) pre-tanh
        sdf = jnp.tanh(raw)
        sdf_ref[:] = sdf

        # backward: d sdf / d input; g @ Wᵀ via dot_general (no transpose)
        def dot_t(g, w):
            return jax.lax.dot_general(
                g.astype(compute_dtype), w, (((1,), (1,)), ((), ())),
                precision=precision,
                preferred_element_type=jnp.float32,
            )

        col0 = jax.lax.broadcasted_iota(jnp.int32, (TILE, D), 1) == 0
        g = jnp.where(col0, 1.0 - sdf * sdf, 0.0)  # (T,1) bcast into col 0
        extra = jnp.zeros((TILE, D), jnp.float32)  # grad via re-injection
        for i in range(N_LAYERS - 1, -1, -1):
            if i < N_LAYERS - 1:
                g = g * relu_ref[i].astype(jnp.float32)
            gin = dot_t(g, w_ref[i])
            if i == 4:
                # split: columns >= SPLIT belong to the raw input
                inj = jnp.where(inj_cols, gin, 0.0)
                rolled_back = jnp.concatenate(
                    [inj[:, SPLIT:], inj[:, :SPLIT]], axis=1
                )  # cols 445..511 -> 0..66
                extra = extra + rolled_back
                gin = jnp.where(inj_cols, 0.0, gin)
            g = gin
        grad_ref[:] = g + extra

    return _kernel


@partial(jax.jit, static_argnames=("interpret", "compute_dtype"))
def sdf_and_input_jacobian_fused(w_stack, b_stack, code, xyz,
                                 interpret: bool = False,
                                 compute_dtype=jnp.float32):
    """Fused query: code (64,), xyz (N, 3) -> (sdf (N,), jac (N, 67)).

    N is padded to a TILE multiple internally.  compute_dtype=bf16 is the
    production mode (pass w_stack pre-cast to bf16 to also halve VMEM).
    """
    n = xyz.shape[0]
    n_pad = -(-n // TILE) * TILE
    x = jnp.zeros((n_pad, D), jnp.float32)
    x = x.at[:n, :64].set(jnp.broadcast_to(code, (n, 64)))
    x = x.at[:n, 64:67].set(xyz)
    w_stack = w_stack.astype(compute_dtype)

    grid = n_pad // TILE
    sdf, grad = pl.pallas_call(
        _make_kernel(compute_dtype),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((TILE, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_LAYERS, D, D), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_LAYERS, D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, D), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((N_LAYERS - 1, TILE, D), jnp.bfloat16)],
        interpret=interpret,
    )(x, w_stack, b_stack)
    return sdf[:n, 0], grad[:n, :IN_DIM]


def _make_value_kernel(compute_dtype):
    """Forward-only variant: the render term's dense value pass is the
    FLOPs-dominant op of a reconstruction iteration (R x M chord samples,
    see recon/losses.py), and needs no Jacobian."""
    bf16 = compute_dtype == jnp.bfloat16
    precision = (jax.lax.Precision.DEFAULT if bf16
                 else jax.lax.Precision.HIGHEST)

    def _kernel(x_ref, w_ref, b_ref, sdf_ref):
        inj_cols = jax.lax.broadcasted_iota(
            jnp.int32, (VTILE, D), 1) >= SPLIT
        x = x_ref[:]
        h = x
        for i in range(N_LAYERS):
            if i == 4:
                shifted = jnp.concatenate(
                    [x[:, D - SPLIT:], x[:, : D - SPLIT]], axis=1
                )
                h = jnp.where(inj_cols, shifted, h)
            h = (
                jnp.dot(h.astype(compute_dtype), w_ref[i],
                        precision=precision,
                        preferred_element_type=jnp.float32)
                + b_ref[i][None, :]
            )
            if i < N_LAYERS - 1:
                h = jnp.maximum(h, 0.0)
        sdf_ref[:] = jnp.tanh(h[:, 0:1])

    return _kernel


VTILE = 512


@partial(jax.jit, static_argnames=("interpret", "compute_dtype"))
def sdf_value_fused(w_stack, b_stack, code, xyz, interpret: bool = False,
                    compute_dtype=jnp.float32):
    """Value-only query: code (64,), xyz (N, 3) -> sdf (N,)."""
    n = xyz.shape[0]
    n_pad = -(-n // VTILE) * VTILE
    x = jnp.zeros((n_pad, D), jnp.float32)
    x = x.at[:n, :64].set(jnp.broadcast_to(code, (n, 64)))
    x = x.at[:n, 64:67].set(xyz)
    w_stack = w_stack.astype(compute_dtype)

    sdf = pl.pallas_call(
        _make_value_kernel(compute_dtype),
        grid=(n_pad // VTILE,),
        in_specs=[
            pl.BlockSpec((VTILE, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_LAYERS, D, D), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_LAYERS, D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((VTILE, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
        interpret=interpret,
    )(x, w_stack, b_stack)
    return sdf[:n, 0]
