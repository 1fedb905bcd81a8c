"""Train a real cars_64-architecture DeepSDF decoder on an analytic shape
family, for use as a deterministic test/bench fixture.

The reference ships pre-trained DeepSDF weights (`deep_sdf/workspace.py`);
none exist in this environment, and precision/convergence experiments on
*random* weights are meaningless (GN diverges chaotically).  This script
trains the full 8x512 latent-64 decoder (`models/deepsdf.py`) to represent a
family of ellipsoids parameterised by the first 3 latent dims:

    axes a_i = 0.30 + 0.12 * tanh(c_i),  i = 0..2      (c ~ N(0, 1))
    sdf(p; a) ~= k0 * (k0 - 1) / k1      (standard ellipsoid approximation,
                 k0 = |p / a|, k1 = |p / a^2|)

so code optimisation in tests exercises a real, smooth latent space.
Remaining 61 dims are trained to be inert (targets independent of them).

Output: tests/fixtures/ellipsoid_decoder_64.npz (fp16-stored weights).
Run on TPU: ~1-2 min.  Deterministic given the seed.
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

FIXTURE = os.path.join(
    os.path.dirname(__file__), "..", "tests", "fixtures",
    "ellipsoid_decoder_64.npz",
)


def ellipsoid_sdf(p, axes):
    """Approximate SDF of an axis-aligned ellipsoid (numpy/jnp agnostic)."""
    import jax.numpy as jnp

    k0 = jnp.linalg.norm(p / axes, axis=-1)
    k1 = jnp.linalg.norm(p / (axes * axes), axis=-1)
    return k0 * (k0 - 1.0) / jnp.maximum(k1, 1e-9)


def code_to_axes(code):
    import jax.numpy as jnp

    return 0.30 + 0.12 * jnp.tanh(code[..., :3])


def main(steps: int = 4000, batch_codes: int = 32, pts_per_code: int = 512,
         lr: float = 5e-4, seed: int = 0):
    import jax
    import jax.numpy as jnp
    import optax

    from dsp_slam_rgbd_tpu.models import deepsdf

    spec = deepsdf.DecoderSpec()
    params = deepsdf.init_params(spec, jax.random.PRNGKey(seed))
    # start the net near sdf=0 so the clamped-regression loss has gradient
    # everywhere (He-init outputs have std~1, past the +-0.1 clamp band)
    W_last, b_last = params["layers"][-1]
    params["layers"][-1] = (W_last * 0.01, b_last)
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    clamp = 0.1  # DeepSDF-style clamped regression

    def loss_fn(params, codes, pts):
        # codes (B, 64), pts (B, P, 3)
        axes = code_to_axes(codes)                       # (B, 3)
        target = ellipsoid_sdf(pts, axes[:, None, :])    # (B, P)
        target = jnp.clip(target, -clamp, clamp)

        B, P, _ = pts.shape
        inp = jnp.concatenate(
            [jnp.broadcast_to(codes[:, None, :], (B, P, 64)), pts], axis=-1
        ).reshape(B * P, 67)
        pred = deepsdf.apply(params, spec, inp).reshape(B, P)
        return jnp.mean(jnp.abs(pred - target))

    @jax.jit
    def step(params, opt_state, key):
        kc, kp, ks = jax.random.split(key, 3)
        codes = jax.random.normal(kc, (batch_codes, 64))
        # mix of uniform volume samples and near-surface samples
        pts_u = jax.random.uniform(
            kp, (batch_codes, pts_per_code // 2, 3), minval=-1.1, maxval=1.1
        )
        # near-surface: scale unit directions to the ellipsoid + noise
        dirs = jax.random.normal(ks, (batch_codes, pts_per_code // 2, 3))
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        axes = code_to_axes(codes)
        noise = jax.random.normal(kc, (batch_codes, pts_per_code // 2, 1))
        pts_s = dirs * axes[:, None, :] * (1.0 + 0.08 * noise)
        pts = jnp.concatenate([pts_u, pts_s], axis=1)
        l, g = jax.value_and_grad(loss_fn)(params, codes, pts)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, updates), opt_state, l

    key = jax.random.PRNGKey(seed + 1)
    for i in range(steps):
        key, sub = jax.random.split(key)
        params, opt_state, l = step(params, opt_state, sub)
        if i % 500 == 0 or i == steps - 1:
            print(f"step {i}: loss {float(l):.5f}", flush=True)

    os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
    flat = {
        "latent_size": np.asarray(spec.latent_size),
        "dims": np.asarray(spec.dims),
        "latent_in": np.asarray(spec.latent_in),
    }
    for i, (W, b) in enumerate(params["layers"]):
        flat[f"W{i}"] = np.asarray(W, np.float16)
        flat[f"b{i}"] = np.asarray(b, np.float32)
    np.savez_compressed(FIXTURE, **flat)
    print("saved", os.path.abspath(FIXTURE))


if __name__ == "__main__":
    main()
