"""Generic masked Gauss-Newton building blocks.

The reference assembles normal equations on CPU per problem
(`reconstruct/optimizer.py:163-188`, g2o internals for BA).  Here the whole
GN machinery is expressed as masked batched einsums so one `vmap`/`pjit`
covers many problems at once and everything stays in HBM.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def normal_equations(J: jnp.ndarray, r: jnp.ndarray, mask: jnp.ndarray | None = None,
                     mean: bool = True):
    """Build (H, b) = (Σ JᵀJ, −Σ Jᵀ r) over the leading batch axis.

    J: (N, D) per-residual Jacobians, r: (N,) residuals, mask: (N,) live
    slots.  With `mean=True` both are divided by the live count (matching the
    reference's `/ J.shape[0]` normalization, `optimizer.py:164-169`).
    """
    if mask is not None:
        J = jnp.where(mask[..., None], J, 0.0)
        r = jnp.where(mask, r, 0.0)
        n = jnp.maximum(jnp.sum(mask), 1).astype(J.dtype)
    else:
        n = jnp.asarray(J.shape[0], dtype=J.dtype)
    H = jnp.einsum("ni,nj->ij", J, J)
    b = -jnp.einsum("ni,n->i", J, r)
    if mean:
        H = H / n
        b = b / n
    return H, b


def solve_spd(H: jnp.ndarray, b: jnp.ndarray, damping: float = 0.0) -> jnp.ndarray:
    """Solve H dx = b for SPD H via Cholesky (with optional LM damping)."""
    if damping:
        H = H + damping * jnp.eye(H.shape[-1], dtype=H.dtype)
    L = jnp.linalg.cholesky(H)
    dx = jax.scipy.linalg.cho_solve((L, True), b)
    # fall back to lstsq-ish pinv behavior if Cholesky failed (NaN guard)
    bad = jnp.any(jnp.isnan(dx))
    dx_safe = jnp.linalg.solve(H + 1e-6 * jnp.eye(H.shape[-1], dtype=H.dtype), b)
    return jnp.where(bad, dx_safe, dx)


def schur_solve(Hcc, Hcp, Hpp, bc, bp, point_mask=None, damp_p: float = 1e-9):
    """Schur-complement solve for BA-structured systems.

    Block system  [Hcc  Hcp] [dc]   [bc]
                  [Hcpᵀ Hpp] [dp] = [bp]
    with Hpp block-diagonal per point: Hpp (P, 3, 3), Hcp (C·D, P, 3)
    flattened camera dim.  Returns (dc, dp).

    This is the TPU-native replacement for g2o's marginalized point vertices
    (`Optimizer.cc:79-120`): the point blocks invert in a batched 3×3 solve,
    the reduced camera system solves densely (cameras are few).
    """
    eye3 = jnp.eye(3, dtype=Hpp.dtype)
    Hpp_d = Hpp + damp_p * eye3
    if point_mask is not None:
        # dead points: identity block, zero rhs -> zero update, no coupling
        Hpp_d = jnp.where(point_mask[:, None, None], Hpp_d, eye3)
        Hcp = jnp.where(point_mask[None, :, None], Hcp, 0.0)
        bp = jnp.where(point_mask[:, None], bp, 0.0)
    Hpp_inv = jnp.linalg.inv(Hpp_d)  # (P, 3, 3)
    # S = Hcc − Hcp Hpp⁻¹ Hcpᵀ ;  rhs = bc − Hcp Hpp⁻¹ bp
    HcpHinv = jnp.einsum("cpk,pkl->cpl", Hcp, Hpp_inv)  # (C·D, P, 3)
    S = Hcc - jnp.einsum("cpl,dpl->cd", HcpHinv, Hcp)
    rhs = bc - jnp.einsum("cpl,pl->c", HcpHinv, bp)
    dc = solve_spd(S, rhs, damping=1e-9)
    dp = jnp.einsum("pkl,pl->pk", Hpp_inv, bp - jnp.einsum("cpk,c->pk", Hcp, dc))
    return dc, dp
