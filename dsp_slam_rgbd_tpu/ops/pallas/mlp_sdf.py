"""Pallas TPU kernel: fused DeepSDF forward + input-Jacobian.

The hot op of the whole system (SURVEY.md §7 step 3): SDF value and
d(sdf)/d(code, xyz) for a batch of query points.  The stock XLA path
(`models.deepsdf.sdf_and_input_jacobian`) runs 18 matmuls with HBM-resident
intermediates; this kernel keeps the activation stack and the running
gradient in VMEM for a whole point tile, so the forward+backward sweep
never round-trips HBM between layers.

Layout:
  * input rows are (N, 128): [code 64 | xyz 3 | zeros] — the first layer is
    its own (128, 512) matmul, so input HBM traffic is 4x less than a
    uniform 512-wide padding (that padding was measured to cost more than
    the fusion saved at batched shapes);
  * layers 1..8 are a static loop over a uniform (8, 512, 512) stack;
    layer 3's 445 real output columns are padded with zero columns, and
    before layer 4 the raw 67-d input is concatenated into columns
    445..511 — exactly the reference decoder's latent re-injection
    (`deep_sdf_decoder.py:87-88`);
  * layer 8's single output lives in column 0 of a padded 512-wide result;
  * the input-gradient output is (N, 128) (columns 0..66 meaningful).

vmap over (code, xyz) — the batched multi-object reconstruction — does NOT
add a grid dimension: a custom_vmap rule flattens the object batch into
extra point rows with per-point codes, one kernel launch over B·N rows
(per-object launches under-fill tiles and re-stream the weight stack).

STATUS: compiles and validates on TPU hardware; wired into the production
GN reconstruction behind `ReconConfig.use_pallas`.  Measured on 1x v5e
(2026-08-19, batched B=8 KITTI-budget reconstruction, per-GN-iteration
slope with the ~36 ms tunnel dispatch floor subtracted):
  XLA tpu_fast bf16   7.8 ms/iter
  Pallas bf16         8.6 ms/iter   (0.91x)
XLA already fuses this 9x512 MLP to the MXU roofline at these shapes and
a large share of the iteration is VPU elementwise work (occupancy ramp,
cumprod/cumsum rendering, masks) the kernel cannot absorb — so the stock
XLA path stays the default and `use_pallas` is an opt-in for future
hardware/toolchains.  bf16 (1-pass MXU, f32 accumulation) is the kernel's
production mode — the same precision class as the validated
ReconConfig.tpu_fast() XLA path; f32 mode uses HIGHEST (6-pass, Mosaic has
no HIGH) and exists for parity checks, not speed.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

D = 512
IN_DIM = 67     # 64 code + 3 xyz
IN_PAD = 128    # input rows padded to one lane register
SPLIT = 445     # layer-3 real output width (D − IN_DIM)
N_LAYERS = 9
TILE = 256      # jacobian kernel tile
VTILE = 512     # value kernel tile


def compatible(spec) -> bool:
    """True when the decoder arch matches the kernel's static layout
    (cars/chairs_64: 64-d latent, 8x512 hidden, latent_in=(4,))."""
    return (
        getattr(spec, "latent_size", None) == 64
        and tuple(getattr(spec, "latent_in", ())) == (4,)
        and getattr(spec, "dims", None) is not None
        and tuple(spec.dims) == (512,) * 8
    )


def pack_params(params, spec):
    """Pack the decoder into (w0 (128, 512), w (8, 512, 512), b (9, 512)).

    Requires the standard cars/chairs_64 architecture: latent 64, 8x512
    dims, latent_in=(4,).
    """
    assert spec.latent_size + 3 == IN_DIM, "kernel assumes 64-d codes"
    assert tuple(spec.latent_in) == (4,)
    assert len(params["layers"]) == N_LAYERS
    w0 = np.zeros((IN_PAD, D), np.float32)
    W = np.zeros((N_LAYERS - 1, D, D), np.float32)
    b = np.zeros((N_LAYERS, D), np.float32)
    for i, (Wi, bi) in enumerate(params["layers"]):
        wi = np.asarray(Wi)
        if i == 0:
            w0[: wi.shape[0], : wi.shape[1]] = wi
        else:
            W[i - 1, : wi.shape[0], : wi.shape[1]] = wi
        b[i, : wi.shape[1]] = np.asarray(bi)
    return jnp.asarray(w0), jnp.asarray(W), jnp.asarray(b)


def pack_params_jnp(params, spec):
    """jit-traceable variant of `pack_params` (jnp scatters), so the packing
    can live inside a jitted reconstruction (runs once per call, ~9 MB of
    copies — noise next to one GN iteration)."""
    w0 = jnp.zeros((IN_PAD, D), jnp.float32)
    W = jnp.zeros((N_LAYERS - 1, D, D), jnp.float32)
    b = jnp.zeros((N_LAYERS, D), jnp.float32)
    for i, (Wi, bi) in enumerate(params["layers"]):
        r, c = Wi.shape
        if i == 0:
            w0 = w0.at[:r, :c].set(Wi.astype(jnp.float32))
        else:
            W = W.at[i - 1, :r, :c].set(Wi.astype(jnp.float32))
        b = b.at[i, :c].set(bi.astype(jnp.float32))
    return w0, W, b


def _pack_inputs(code, xyz, tile):
    """(N, IN_PAD) padded input rows from code ((64,) shared or (N, 64)
    per-point) and xyz (N, 3)."""
    n = xyz.shape[0]
    n_pad = -(-n // tile) * tile
    x = jnp.zeros((n_pad, IN_PAD), jnp.float32)
    code = jnp.asarray(code)
    rows = code[None, :] if code.ndim == 1 else code
    x = x.at[:n, :64].set(jnp.broadcast_to(rows, (n, 64)))
    x = x.at[:n, 64:67].set(xyz)
    return x, n, n_pad


def _precision_for(compute_dtype):
    # Mosaic supports only DEFAULT / HIGHEST dot precision; f32 mode uses
    # HIGHEST (6-pass) — strictly more accurate than the XLA HIGH path
    return (jax.lax.Precision.DEFAULT if compute_dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)


def _forward(x, w0_ref, w_ref, b_ref, compute_dtype, relu_ref=None):
    """Shared forward sweep: x (T, IN_PAD) -> h8 (T, D) pre-tanh.

    When relu_ref is given, stores the per-layer ReLU masks (the only
    forward residue the backward sweep needs)."""
    precision = _precision_for(compute_dtype)

    def mm(a, w):
        return jnp.dot(a.astype(compute_dtype), w, precision=precision,
                       preferred_element_type=jnp.float32)

    h = None
    for i in range(N_LAYERS):
        if i == 0:
            pre = mm(x, w0_ref[...]) + b_ref[0][None, :]
        else:
            if i == 4:
                # latent re-injection: cols 445..511 <- raw input's 67 dims
                h = jnp.concatenate([h[:, :SPLIT], x[:, :IN_DIM]], axis=1)
            pre = mm(h, w_ref[i - 1]) + b_ref[i][None, :]
        if i < N_LAYERS - 1:
            h = jnp.maximum(pre, 0.0)
            if relu_ref is not None:
                relu_ref[i] = (pre > 0.0).astype(jnp.bfloat16)
        else:
            h = pre
    return h


def _make_kernel(compute_dtype):
    """Fused forward + input-gradient kernel factory."""
    precision = _precision_for(compute_dtype)

    def _kernel(x_ref, w0_ref, w_ref, b_ref, sdf_ref, grad_ref, relu_ref):
        x = x_ref[:]  # (T, IN_PAD)
        h = _forward(x, w0_ref, w_ref, b_ref, compute_dtype, relu_ref)
        sdf = jnp.tanh(h[:, 0:1])
        sdf_ref[:] = sdf

        # backward: d sdf / d input; g @ Wᵀ via dot_general (no transpose)
        def dot_t(g, w):
            return jax.lax.dot_general(
                g.astype(compute_dtype), w, (((1,), (1,)), ((), ())),
                precision=precision,
                preferred_element_type=jnp.float32,
            )

        col0 = jax.lax.broadcasted_iota(jnp.int32, (TILE, D), 1) == 0
        g = jnp.where(col0, 1.0 - sdf * sdf, 0.0)  # (T, 1) bcast into col 0
        extra = jnp.zeros((TILE, IN_PAD), jnp.float32)  # re-injection grad
        for i in range(N_LAYERS - 1, 0, -1):
            if i < N_LAYERS - 1:
                g = g * relu_ref[i].astype(jnp.float32)
            gin = dot_t(g, w_ref[i - 1])  # (T, D)
            if i == 4:
                # columns >= SPLIT belong to the raw input
                inj = gin[:, SPLIT:]  # (T, IN_DIM)
                extra = extra + jnp.concatenate(
                    [inj, jnp.zeros((TILE, IN_PAD - IN_DIM), jnp.float32)],
                    axis=1,
                )
                zero_tail = jnp.zeros((TILE, D - SPLIT), jnp.float32)
                gin = jnp.concatenate([gin[:, :SPLIT], zero_tail], axis=1)
            g = gin
        g = g * relu_ref[0].astype(jnp.float32)
        g0 = dot_t(g, w0_ref[...])  # (T, IN_PAD)
        grad_ref[:] = g0 + extra

    return _kernel


def _jacobian_call(wb, code, xyz, interpret, compute_dtype):
    w0, W, b = wb
    x, n, n_pad = _pack_inputs(code, xyz, TILE)
    w0 = w0.astype(compute_dtype)
    W = W.astype(compute_dtype)

    grid = n_pad // TILE
    sdf, grad = pl.pallas_call(
        _make_kernel(compute_dtype),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((TILE, IN_PAD), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((IN_PAD, D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_LAYERS - 1, D, D), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_LAYERS, D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, IN_PAD), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, IN_PAD), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((N_LAYERS - 1, TILE, D), jnp.bfloat16)],
        interpret=interpret,
    )(x, w0, W, b)
    return sdf[:n, 0], grad[:n, :IN_DIM]


def _make_value_kernel(compute_dtype):
    """Forward-only variant: the render term's dense value pass is the
    FLOPs-dominant op of a reconstruction iteration (R x M chord samples,
    see recon/losses.py), and needs no Jacobian."""

    def _kernel(x_ref, w0_ref, w_ref, b_ref, sdf_ref):
        h = _forward(x_ref[:], w0_ref, w_ref, b_ref, compute_dtype)
        sdf_ref[:] = jnp.tanh(h[:, 0:1])

    return _kernel


def _value_call(wb, code, xyz, interpret, compute_dtype):
    w0, W, b = wb
    x, n, n_pad = _pack_inputs(code, xyz, VTILE)
    w0 = w0.astype(compute_dtype)
    W = W.astype(compute_dtype)

    sdf = pl.pallas_call(
        _make_value_kernel(compute_dtype),
        grid=(n_pad // VTILE,),
        in_specs=[
            pl.BlockSpec((VTILE, IN_PAD), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((IN_PAD, D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_LAYERS - 1, D, D), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_LAYERS, D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((VTILE, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
        interpret=interpret,
    )(x, w0, W, b)
    return sdf[:n, 0]


# -- vmap-aware public wrappers ---------------------------------------------

_VMAP_CACHE: dict = {}


def _flatten_batched(axis_size, code, code_b, xyz, xyz_b):
    """(B?, N, …) inputs -> flat (B·N, …) rows with b-major ordering."""
    B = axis_size
    if xyz_b:
        N = xyz.shape[1]
        xyz_flat = xyz.reshape(B * N, 3)
    else:
        N = xyz.shape[0]
        xyz_flat = jnp.broadcast_to(xyz, (B,) + xyz.shape).reshape(B * N, 3)
    if code_b:
        if code.ndim == 3:
            # vmapped per-point codes (B, N, 64) -> (B·N, 64) row-aligned
            # with xyz_flat (no repeat — each row already has its code)
            assert code.shape[1] == N, (
                f"per-point code batch {code.shape} does not match "
                f"xyz rows {N}")
            codes = code.reshape(B * N, code.shape[2])
        else:                                       # one code per element
            codes = jnp.repeat(code, N, axis=0)     # (B·N, 64)
    elif code.ndim == 2 and xyz_b:
        # unbatched per-point codes shared across the batch: tile rows
        codes = jnp.tile(code, (B, 1))
    else:
        codes = code                                # shared (64,) code
    return codes, xyz_flat, N


def _get_jacobian_fn(compute_dtype, interpret):
    key = ("jac", compute_dtype, interpret)
    if key not in _VMAP_CACHE:
        @jax.custom_batching.custom_vmap
        def f(w0, W, b, code, xyz):
            return _jacobian_call((w0, W, b), code, xyz, interpret,
                                  compute_dtype)

        @f.def_vmap
        def _rule(axis_size, in_batched, w0, W, b, code, xyz):
            w0_b, w_b, b_b, code_b, xyz_b = in_batched
            assert not (w0_b or w_b or b_b), "weights must be unbatched"
            codes, xyz_flat, N = _flatten_batched(axis_size, code, code_b,
                                                  xyz, xyz_b)
            sdf, jac = f(w0, W, b, codes, xyz_flat)
            return ((sdf.reshape(axis_size, N),
                     jac.reshape(axis_size, N, IN_DIM)), (True, True))

        _VMAP_CACHE[key] = f
    return _VMAP_CACHE[key]


def sdf_and_input_jacobian_fused(wb, code, xyz, interpret: bool = False,
                                 compute_dtype=jnp.float32):
    """Fused query: code ((64,) shared or (N, 64) per-point), xyz (N, 3)
    -> (sdf (N,), jac (N, 67)).

    wb: packed (w0, W, b) from pack_params/pack_params_jnp.  N is padded to
    a TILE multiple internally.  compute_dtype=bf16 is the production mode.
    vmap over (code, xyz) flattens into one kernel launch (see module doc).
    """
    return _get_jacobian_fn(compute_dtype, interpret)(*wb, code, xyz)


def _get_value_fn(compute_dtype, interpret):
    key = ("val", compute_dtype, interpret)
    if key not in _VMAP_CACHE:
        @jax.custom_batching.custom_vmap
        def f(w0, W, b, code, xyz):
            return _value_call((w0, W, b), code, xyz, interpret,
                               compute_dtype)

        @f.def_vmap
        def _rule(axis_size, in_batched, w0, W, b, code, xyz):
            w0_b, w_b, b_b, code_b, xyz_b = in_batched
            assert not (w0_b or w_b or b_b), "weights must be unbatched"
            codes, xyz_flat, N = _flatten_batched(axis_size, code, code_b,
                                                  xyz, xyz_b)
            sdf = f(w0, W, b, codes, xyz_flat)
            return sdf.reshape(axis_size, N), True

        _VMAP_CACHE[key] = f
    return _VMAP_CACHE[key]


def sdf_value_fused(wb, code, xyz, interpret: bool = False,
                    compute_dtype=jnp.float32):
    """Value-only query: code ((64,) shared or (N, 64) per-point),
    xyz (N, 3) -> sdf (N,).  wb: packed (w0, W, b).  vmap over (code, xyz)
    flattens the batch into one kernel launch (see module doc)."""
    return _get_value_fn(compute_dtype, interpret)(*wb, code, xyz)
