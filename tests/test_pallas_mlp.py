"""Pallas fused decoder kernel vs the XLA reference path (interpret mode on
CPU; the compiled path runs on real TPU in bench)."""
import jax
import jax.numpy as jnp
import numpy as np

from dsp_slam_rgbd_tpu.models import deepsdf
from dsp_slam_rgbd_tpu.ops.pallas import mlp_sdf


def test_fused_kernel_matches_xla():
    spec = deepsdf.DecoderSpec()  # cars_64 arch
    params = deepsdf.init_params(spec, jax.random.PRNGKey(0))
    wb = mlp_sdf.pack_params(params, spec)

    rng = np.random.default_rng(0)
    code = jnp.asarray(rng.standard_normal(64) * 0.2, dtype=jnp.float32)
    xyz = jnp.asarray(rng.standard_normal((300, 3)) * 0.5, dtype=jnp.float32)

    sdf_ref, jac_ref = deepsdf.sdf_and_input_jacobian(params, spec, code, xyz)
    sdf_k, jac_k = mlp_sdf.sdf_and_input_jacobian_fused(
        wb, code, xyz, interpret=True
    )
    np.testing.assert_allclose(np.asarray(sdf_k), np.asarray(sdf_ref),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(jac_k), np.asarray(jac_ref),
                               atol=2e-4)


def test_value_kernel_matches_xla():
    spec = deepsdf.DecoderSpec()
    params = deepsdf.init_params(spec, jax.random.PRNGKey(0))
    wb = mlp_sdf.pack_params(params, spec)

    rng = np.random.default_rng(1)
    code = jnp.asarray(rng.standard_normal(64) * 0.2, dtype=jnp.float32)
    xyz = jnp.asarray(rng.standard_normal((700, 3)) * 0.5, dtype=jnp.float32)

    sdf_ref = deepsdf.sdf(params, spec, code, xyz)
    sdf_k = mlp_sdf.sdf_value_fused(wb, code, xyz, interpret=True)
    np.testing.assert_allclose(np.asarray(sdf_k), np.asarray(sdf_ref),
                               atol=2e-5)


def test_bf16_mode_close_to_f32():
    # the production bf16 MXU mode: same precision class as the validated
    # ReconConfig.tpu_fast() XLA path (tests/test_trained_decoder_recon.py)
    spec = deepsdf.DecoderSpec()
    params = deepsdf.init_params(spec, jax.random.PRNGKey(0))
    wb = mlp_sdf.pack_params(params, spec)

    rng = np.random.default_rng(2)
    code = jnp.asarray(rng.standard_normal(64) * 0.2, dtype=jnp.float32)
    xyz = jnp.asarray(rng.standard_normal((256, 3)) * 0.5, dtype=jnp.float32)

    sdf_f32, jac_f32 = mlp_sdf.sdf_and_input_jacobian_fused(
        wb, code, xyz, interpret=True
    )
    sdf_bf16, jac_bf16 = mlp_sdf.sdf_and_input_jacobian_fused(
        wb, code, xyz, interpret=True, compute_dtype=jnp.bfloat16
    )
    np.testing.assert_allclose(np.asarray(sdf_bf16), np.asarray(sdf_f32),
                               atol=3e-2)
    # the Jacobian is the GN-critical output: the bf16 backward sweep
    # re-casts the running gradient at each of the 9 layers (ADVICE r1).
    # On a random-init decoder (worst case: no structure, heavy
    # cancellation) the per-row norm error is ~14%, but the GN step
    # direction is what matters — assert per-row cosine alignment plus a
    # bounded Frobenius error.  (Trained-decoder GN convergence under bf16
    # is separately asserted end-to-end by test_trained_decoder_recon.py.)
    jf, jb = np.asarray(jac_f32), np.asarray(jac_bf16)
    frob_rel = np.linalg.norm(jb - jf) / np.linalg.norm(jf)
    assert frob_rel <= 0.25, f"bf16 Jacobian Frobenius rel err {frob_rel:.3f}"
    cos = np.sum(jb * jf, axis=1) / (
        np.linalg.norm(jb, axis=1) * np.linalg.norm(jf, axis=1) + 1e-12
    )
    assert cos.min() >= 0.90, f"bf16 Jacobian row cosine min {cos.min():.3f}"


def test_pack_params_shapes():
    spec = deepsdf.DecoderSpec()
    params = deepsdf.init_params(spec, jax.random.PRNGKey(1))
    w0, W, b = mlp_sdf.pack_params(params, spec)
    assert w0.shape == (128, 512)
    assert W.shape == (8, 512, 512)
    assert b.shape == (9, 512)
    # padding rows/cols are zero
    assert float(jnp.abs(w0[67:, :]).max()) == 0.0
    assert float(jnp.abs(W[2, :, 445:]).max()) == 0.0  # layer 3 output pad


def test_reconstruct_object_pallas_path_matches_xla():
    """ReconConfig.use_pallas routes the GN reconstruction through the
    fused kernels; one iteration matches the stock XLA path (f32 kernel is
    HIGHEST-precision, XLA HIGH — small tolerance)."""
    from dsp_slam_rgbd_tpu.recon.optimizer import (ReconConfig,
                                                   reconstruct_object)

    spec = deepsdf.DecoderSpec()
    params = deepsdf.init_params(spec, jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)

    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = [0.0, 0.0, 6.0]
    pts = (rng.standard_normal((64, 3)) * 0.4 + [0, 0, 6.0]).astype(
        np.float32)
    rays = (rng.standard_normal((32, 3)) * 0.03 + [0, 0, 1.0]).astype(
        np.float32)
    rays /= np.linalg.norm(rays, axis=1, keepdims=True)
    depth = np.full(32, 6.0, np.float32)
    args = (jnp.asarray(T), jnp.asarray(pts), jnp.ones(64, bool),
            jnp.asarray(rays), jnp.ones(32, bool), jnp.asarray(depth),
            jnp.ones(32, bool))

    base = dict(num_iterations=1, num_depth_samples=12,
                max_grad_points=256, max_valid_samples=512)
    cfg_x = ReconConfig(**base)
    cfg_p = ReconConfig(use_pallas=True, pallas_interpret=True, **base)
    rx = reconstruct_object(params, spec, cfg_x, *args)
    rp = reconstruct_object(params, spec, cfg_p, *args)
    np.testing.assert_allclose(np.asarray(rp.t_cam_obj),
                               np.asarray(rx.t_cam_obj), atol=2e-3)
    np.testing.assert_allclose(np.asarray(rp.code), np.asarray(rx.code),
                               atol=2e-3)
    assert bool(rp.is_good) == bool(rx.is_good)


def test_vmap_per_point_codes_matches_xla():
    """vmapped per-point codes (B, N, 64) must flatten row-aligned, not
    repeat (B, N*64) rows (advisor r2 finding on _flatten_batched)."""
    spec = deepsdf.DecoderSpec()
    params = deepsdf.init_params(spec, jax.random.PRNGKey(0))
    wb = mlp_sdf.pack_params(params, spec)
    B, N = 2, 8
    codes = 0.3 * jax.random.normal(jax.random.PRNGKey(3), (B, N, 64))
    xyz = 0.5 * jax.random.normal(jax.random.PRNGKey(4), (B, N, 3))

    sdf_k = jax.vmap(
        lambda c, x: mlp_sdf.sdf_value_fused(wb, c, x, interpret=True)
    )(codes, xyz)
    sdf_ref = jax.vmap(
        jax.vmap(lambda c, x: deepsdf.sdf(params, spec, c, x[None])[0])
    )(codes, xyz)
    np.testing.assert_allclose(np.asarray(sdf_k), np.asarray(sdf_ref),
                               atol=2e-5)

    jac_k = jax.vmap(
        lambda c, x: mlp_sdf.sdf_and_input_jacobian_fused(
            wb, c, x, interpret=True)[1]
    )(codes, xyz)
    jac_ref = jax.vmap(
        lambda c, x: deepsdf.sdf_and_input_jacobian(params, spec, c, x)[1]
    )(codes, xyz)
    np.testing.assert_allclose(np.asarray(jac_k), np.asarray(jac_ref),
                               atol=5e-4)


def test_use_pallas_rejects_incompatible_decoder():
    """A decoder whose arch doesn't match the kernel layout must raise, not
    silently zero-pad (advisor r2 medium finding)."""
    import pytest
    from dsp_slam_rgbd_tpu.recon.optimizer import ReconConfig, \
        reconstruct_object

    spec = deepsdf.DecoderSpec(dims=(128,) * 8)  # wrong hidden width
    params = deepsdf.init_params(spec, jax.random.PRNGKey(0))
    cfg = ReconConfig(use_pallas=True, pallas_interpret=True, code_len=64,
                      num_iterations=1, num_depth_samples=8)
    t = np.eye(4, dtype=np.float32)
    pts = np.zeros((4, 3), np.float32)
    rays = np.zeros((4, 3), np.float32)
    with pytest.raises(ValueError, match="use_pallas"):
        reconstruct_object(params, spec, cfg, t, pts,
                           np.ones(4, bool), rays, np.ones(4, bool),
                           np.ones(4, np.float32), np.ones(4, bool))
