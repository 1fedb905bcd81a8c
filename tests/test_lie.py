import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dsp_slam_rgbd_tpu.ops import lie

jax.config.update("jax_enable_x64", False)


def random_tangent(rng, dim, scale=1.0):
    return jnp.asarray(rng.standard_normal(dim) * scale, dtype=jnp.float32)


@pytest.mark.parametrize("scale", [1e-9, 1e-6, 0.1, 1.0])
def test_exp_log_so3_roundtrip(scale):
    rng = np.random.default_rng(0)
    for _ in range(5):
        w = random_tangent(rng, 3, scale)
        # keep θ < π so the log map is single-valued
        w = w / jnp.maximum(jnp.linalg.norm(w) / 3.0, 1.0)
        R = lie.exp_so3(w)
        # orthonormality
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        w2 = lie.log_so3(R)
        np.testing.assert_allclose(w, w2, atol=1e-4 * max(scale, 1e-3))


def test_exp_log_so3_large_angle():
    """θ > π: log is wrapped, but exp(log(R)) must still equal R."""
    rng = np.random.default_rng(0)
    for _ in range(5):
        w = random_tangent(rng, 3, 2.5)
        R = lie.exp_so3(w)
        R2 = lie.exp_so3(lie.log_so3(R))
        np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-3)


@pytest.mark.parametrize("scale", [1e-8, 1e-4, 0.5, 2.0])
def test_exp_log_se3_roundtrip(scale):
    rng = np.random.default_rng(1)
    for _ in range(5):
        x = random_tangent(rng, 6, scale)
        # keep rotation θ < π (log map single-valued); translation unrestricted
        x = x.at[3:6].multiply(1.0 / float(jnp.maximum(jnp.linalg.norm(x[3:6]) / 3.0, 1.0)))
        T = lie.exp_se3(x)
        x2 = lie.log_se3(T)
        np.testing.assert_allclose(x, x2, atol=5e-4 * max(scale, 1e-2))


def test_exp_se3_matches_matrix_exponential():
    from scipy.linalg import expm  # scipy is available via jax dependency

    rng = np.random.default_rng(2)
    for _ in range(5):
        x = rng.standard_normal(6).astype(np.float64) * 0.7
        xi = np.zeros((4, 4))
        xi[:3, :3] = np.array(lie.hat(jnp.asarray(x[3:6], dtype=jnp.float64)))
        xi[:3, 3] = x[:3]
        T_ref = expm(xi)
        T = lie.exp_se3(jnp.asarray(x, dtype=jnp.float32))
        np.testing.assert_allclose(np.asarray(T), T_ref, atol=1e-4)


@pytest.mark.parametrize("scale,s", [(1e-8, 0.0), (0.5, 0.0), (0.5, 0.3),
                                     (1e-8, 0.3), (1.5, -0.4)])
def test_exp_log_sim3_roundtrip(scale, s):
    rng = np.random.default_rng(3)
    for _ in range(5):
        x = np.concatenate([rng.standard_normal(6) * scale, [s]])
        wn = np.linalg.norm(x[3:6])
        if wn > 3.0:
            x[3:6] *= 3.0 / wn
        x = jnp.asarray(x, dtype=jnp.float32)
        T = lie.exp_sim3(x)
        # scale factor check
        np.testing.assert_allclose(float(lie.sim3_scale(T)), np.exp(s), rtol=1e-4)
        x2 = lie.log_sim3(T)
        np.testing.assert_allclose(x, x2, atol=2e-3)


def test_exp_sim3_matches_matrix_exponential():
    from scipy.linalg import expm

    rng = np.random.default_rng(4)
    for _ in range(5):
        x = rng.standard_normal(7).astype(np.float64) * 0.6
        xi = np.zeros((4, 4))
        W = np.array(lie.hat(jnp.asarray(x[3:6], dtype=jnp.float64)))
        xi[:3, :3] = W + x[6] * np.eye(3)
        xi[:3, 3] = x[:3]
        T_ref = expm(xi)
        T = lie.exp_sim3(jnp.asarray(x, dtype=jnp.float32))
        np.testing.assert_allclose(np.asarray(T), T_ref, atol=2e-4)


def test_inverse():
    rng = np.random.default_rng(5)
    x = random_tangent(rng, 6, 1.0)
    T = lie.exp_se3(x)
    np.testing.assert_allclose(lie.inv_se3(T) @ T, np.eye(4), atol=1e-5)
    xs = jnp.concatenate([x, jnp.asarray([0.4], dtype=jnp.float32)])
    S = lie.exp_sim3(xs)
    np.testing.assert_allclose(lie.inv_sim3(S) @ S, np.eye(4), atol=1e-5)


def test_points_to_pose_jacobian_se3_finite_diff():
    rng = np.random.default_rng(6)
    pts = jnp.asarray(rng.standard_normal((10, 3)), dtype=jnp.float32)
    J = lie.points_to_pose_jacobian_se3(pts)  # (10, 3, 6)
    eps = 1e-4
    for k in range(6):
        dx = np.zeros(6, dtype=np.float32)
        dx[k] = eps
        Tp = lie.exp_se3(jnp.asarray(dx))
        moved = lie.transform_points(Tp, pts)
        fd = (moved - pts) / eps
        np.testing.assert_allclose(np.asarray(J[:, :, k]), np.asarray(fd), atol=1e-2)


def test_points_to_pose_jacobian_sim3_finite_diff():
    rng = np.random.default_rng(7)
    pts = jnp.asarray(rng.standard_normal((10, 3)), dtype=jnp.float32)
    J = lie.points_to_pose_jacobian_sim3(pts)  # (10, 3, 7)
    eps = 1e-4
    for k in range(7):
        dx = np.zeros(7, dtype=np.float32)
        dx[k] = eps
        Tp = lie.exp_sim3(jnp.asarray(dx))
        moved = lie.transform_points(Tp, pts)
        fd = (moved - pts) / eps
        np.testing.assert_allclose(np.asarray(J[:, :, k]), np.asarray(fd), atol=1e-2)


def test_quat_roundtrip():
    rng = np.random.default_rng(8)
    for _ in range(10):
        w = random_tangent(rng, 3, 1.5)
        R = lie.exp_so3(w)
        q = lie.rot_to_quat(R)
        R2 = lie.quat_to_rot(q)
        np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-5)


def test_adjoint():
    rng = np.random.default_rng(9)
    T = lie.exp_se3(random_tangent(rng, 6, 0.8))
    x = random_tangent(rng, 6, 0.2)
    Ad = lie.adjoint_se3(T)
    lhs = lie.exp_se3(Ad @ x)
    rhs = T @ lie.exp_se3(x) @ lie.inv_se3(T)
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-4)


def test_batched_vmap():
    rng = np.random.default_rng(10)
    xs = jnp.asarray(rng.standard_normal((32, 6)), dtype=jnp.float32)
    Ts = jax.vmap(lie.exp_se3)(xs)
    assert Ts.shape == (32, 4, 4)
    back = jax.vmap(lie.log_se3)(Ts)
    np.testing.assert_allclose(np.asarray(xs), np.asarray(back), atol=1e-3)


def test_orthonormalize_so3():
    """Newton symmetric orthogonalization: projects defective rotations
    back onto SO(3) (quadratic convergence for small defects) and is the
    identity on exact rotations.  This primitive guards the pose chains
    T_t·inv(T_{t-1}) whose transpose-inverse amplifies any defect
    exponentially (measured 2x/frame on the long-run fixture)."""
    rng = np.random.default_rng(0)
    for _ in range(5):
        w = rng.standard_normal(3)
        R = np.asarray(lie.exp_so3(jnp.asarray(w, jnp.float32)))
        # identity on exact rotations
        R2 = np.asarray(lie.orthonormalize_so3(jnp.asarray(R)))
        assert np.abs(R2 - R).max() < 1e-6
        # projects a 1e-2-defective rotation to orthonormality
        D = R + rng.standard_normal((3, 3)) * 1e-2
        D3 = np.asarray(lie.orthonormalize_so3(jnp.asarray(D, jnp.float32)))
        assert np.abs(D3 @ D3.T - np.eye(3)).max() < 1e-5
        assert np.abs(D3 - D).max() < 0.05  # stays close to the input
    # batched SE(3) form
    Ts = np.tile(np.eye(4, dtype=np.float32), (4, 1, 1))
    Ts[:, :3, :3] += rng.standard_normal((4, 3, 3)) * 5e-3
    Ts[:, :3, 3] = rng.standard_normal((4, 3))
    out = np.asarray(lie.orthonormalize_se3(jnp.asarray(Ts)))
    for T in out:
        assert np.abs(T[:3, :3] @ T[:3, :3].T - np.eye(3)).max() < 1e-5
    np.testing.assert_allclose(out[:, :3, 3], Ts[:, :3, 3])
