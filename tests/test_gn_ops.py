import jax.numpy as jnp
import numpy as np

from dsp_slam_rgbd_tpu.ops import gn


def test_normal_equations_masked():
    rng = np.random.default_rng(0)
    J = jnp.asarray(rng.standard_normal((20, 4)), dtype=jnp.float32)
    r = jnp.asarray(rng.standard_normal(20), dtype=jnp.float32)
    mask = jnp.asarray([True] * 12 + [False] * 8)
    H, b = gn.normal_equations(J, r, mask, mean=True)
    Jm = np.asarray(J)[:12]
    rm = np.asarray(r)[:12]
    np.testing.assert_allclose(np.asarray(H), Jm.T @ Jm / 12, atol=1e-5)
    np.testing.assert_allclose(np.asarray(b), -Jm.T @ rm / 12, atol=1e-5)


def test_solve_spd():
    rng = np.random.default_rng(1)
    A = rng.standard_normal((6, 6)).astype(np.float32)
    H = jnp.asarray(A @ A.T + 6 * np.eye(6, dtype=np.float32))
    x_true = jnp.asarray(rng.standard_normal(6), dtype=jnp.float32)
    b = H @ x_true
    x = gn.solve_spd(H, b)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_true), atol=1e-4)


def test_schur_solve_matches_dense():
    """Schur-complement solve equals the dense block solve."""
    rng = np.random.default_rng(2)
    C, P = 2, 5  # camera dim 6 -> flatten C*6=12; here use generic dims
    D = 6
    nc = C * D
    Hcp = jnp.asarray(rng.standard_normal((nc, P, 3)) * 0.3,
                      dtype=jnp.float32)
    # SPD diagonal blocks
    Hcc_half = rng.standard_normal((nc, nc)).astype(np.float32)
    Hcc = jnp.asarray(Hcc_half @ Hcc_half.T + 10 * np.eye(nc, dtype=np.float32))
    Hpp = []
    for p in range(P):
        a = rng.standard_normal((3, 3)).astype(np.float32)
        Hpp.append(a @ a.T + 5 * np.eye(3, dtype=np.float32))
    Hpp = jnp.asarray(np.stack(Hpp))
    bc = jnp.asarray(rng.standard_normal(nc), dtype=jnp.float32)
    bp = jnp.asarray(rng.standard_normal((P, 3)), dtype=jnp.float32)

    dc, dp = gn.schur_solve(Hcc, Hcp, Hpp, bc, bp)

    # dense oracle
    n = nc + 3 * P
    A = np.zeros((n, n), np.float32)
    A[:nc, :nc] = np.asarray(Hcc)
    for p in range(P):
        A[nc + 3 * p: nc + 3 * p + 3, nc + 3 * p: nc + 3 * p + 3] = \
            np.asarray(Hpp[p])
        A[:nc, nc + 3 * p: nc + 3 * p + 3] = np.asarray(Hcp[:, p, :])
        A[nc + 3 * p: nc + 3 * p + 3, :nc] = np.asarray(Hcp[:, p, :]).T
    rhs = np.concatenate([np.asarray(bc), np.asarray(bp).reshape(-1)])
    sol = np.linalg.solve(A, rhs)
    np.testing.assert_allclose(np.asarray(dc), sol[:nc], atol=2e-3)
    np.testing.assert_allclose(np.asarray(dp).reshape(-1), sol[nc:],
                               atol=2e-3)
