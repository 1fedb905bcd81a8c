"""Robust-norm reweighting (Huber) for masked batched residuals.

Replicates the reference semantics of `reconstruct/loss_utils.py:246-275`
(huber_norm_weights / get_robust_res) but in masked fixed-shape form: every
residual slot carries a validity mask and invalid slots contribute exactly
zero to losses and normal equations.
"""
from __future__ import annotations

import jax.numpy as jnp


def huber_weights(res_norm: jnp.ndarray, b: float) -> jnp.ndarray:
    """w(x) with x = |residual|: sqrt(ρ(x))/x for the Huber ρ.

    ρ(x) = x² for x ≤ b, 2bx − b² otherwise (reference
    `loss_utils.py:246-257`).  w → 1 as x → 0.
    """
    x = jnp.maximum(res_norm, 1e-12)
    rho = jnp.where(res_norm <= b, x * x, 2.0 * b * x - b * b)
    return jnp.sqrt(rho) / x


def robust_residuals(res: jnp.ndarray, b: float, mask: jnp.ndarray | None = None):
    """Return (robust_res, mean_loss, weights) à la `get_robust_res`.

    `res` has shape (N,) or (N, 1); `mask` (N,) bool selects live residuals.
    mean_loss averages robust_res² over live slots (matches the reference's
    torch.mean over the gathered subset).
    """
    res = res.reshape(-1)
    w = huber_weights(jnp.abs(res), b)
    rr = w * res
    if mask is None:
        loss = jnp.mean(rr * rr)
    else:
        mask = mask.reshape(-1)
        n = jnp.maximum(jnp.sum(mask), 1)
        rr = jnp.where(mask, rr, 0.0)
        loss = jnp.sum(rr * rr) / n
    return rr, loss, w


def tukey_weights(res_norm: jnp.ndarray, c: float) -> jnp.ndarray:
    """Tukey biweight IRLS weights (hard rejection beyond c)."""
    r = res_norm / c
    w = jnp.where(r < 1.0, (1.0 - r * r) ** 2, 0.0)
    return w
