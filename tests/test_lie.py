"""Unit tests for deblur4dgs_tpu.ops.lie vs closed forms / numpy references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deblur4dgs_tpu.ops import lie

jax.config.update("jax_enable_x64", False)


def rand_rotvec(rng, shape, scale=2.0):
    return jnp.asarray(rng.uniform(-scale, scale, shape).astype(np.float32))


@pytest.fixture
def rng():
    return np.random.default_rng(0)


class TestQuat:
    def test_mul_matches_rmat(self, rng):
        q1 = lie.quat_normalize(rand_rotvec(rng, (16, 4)))
        q2 = lie.quat_normalize(rand_rotvec(rng, (16, 4)))
        R12 = lie.quat_to_rmat(lie.quat_mul(q1, q2))
        R1R2 = lie.quat_to_rmat(q1) @ lie.quat_to_rmat(q2)
        np.testing.assert_allclose(R12, R1R2, atol=1e-5)

    def test_rmat_roundtrip(self, rng):
        q = lie.quat_normalize(rand_rotvec(rng, (64, 4)))
        q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
        q2 = lie.rmat_to_quat(lie.quat_to_rmat(q))
        np.testing.assert_allclose(q, q2, atol=1e-5)

    def test_rmat_to_quat_near_identity_and_pi(self):
        # identity
        q = lie.rmat_to_quat(jnp.eye(3))
        np.testing.assert_allclose(q, [1, 0, 0, 0], atol=1e-6)
        # 180-degree rotation about z: trace = -1, qw ~ 0 branch
        R = jnp.diag(jnp.array([-1.0, -1.0, 1.0]))
        q = lie.rmat_to_quat(R)
        np.testing.assert_allclose(
            lie.quat_to_rmat(q), R, atol=1e-5
        )

    def test_exp_log_roundtrip(self, rng):
        w = rand_rotvec(rng, (32, 3), scale=1.5)
        w2 = lie.quat_log(lie.quat_exp(w))
        np.testing.assert_allclose(w, w2, atol=1e-5)

    def test_exp_small_angle(self):
        w = jnp.array([[1e-9, 0.0, 0.0], [0.0, 0.0, 0.0]])
        q = lie.quat_exp(w)
        assert jnp.all(jnp.isfinite(q))
        np.testing.assert_allclose(q[1], [1, 0, 0, 0], atol=1e-7)
        # gradient must not be NaN at 0
        g = jax.grad(lambda w: lie.quat_exp(w).sum())(jnp.zeros(3))
        assert jnp.all(jnp.isfinite(g))

    def test_log_grad_finite_near_identity(self):
        g = jax.grad(
            lambda q: lie.quat_log(lie.quat_normalize(q)).sum()
        )(jnp.array([1.0, 1e-8, 0.0, 0.0]))
        assert jnp.all(jnp.isfinite(g))


class TestSO3:
    def test_exp_matches_quat_path(self, rng):
        w = rand_rotvec(rng, (32, 3))
        R1 = lie.so3_exp(w)
        R2 = lie.quat_to_rmat(lie.quat_exp(w))
        np.testing.assert_allclose(R1, R2, atol=1e-5)

    def test_log_roundtrip(self, rng):
        w = rand_rotvec(rng, (32, 3), scale=1.2)
        np.testing.assert_allclose(lie.so3_log(lie.so3_exp(w)), w, atol=1e-4)

    def test_log_near_pi(self):
        # The reference's (R-R^T) formulation collapses here; ours must not.
        for ang in [np.pi - 1e-4, np.pi - 1e-2, 3.0]:
            w = jnp.array([0.0, ang, 0.0])
            np.testing.assert_allclose(
                lie.so3_log(lie.so3_exp(w)), w, atol=1e-4
            )

    def test_orthonormal(self, rng):
        R = lie.so3_exp(rand_rotvec(rng, (8, 3)))
        eye = jnp.broadcast_to(jnp.eye(3), R.shape)
        np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), eye, atol=1e-5)
        np.testing.assert_allclose(jnp.linalg.det(R), 1.0, atol=1e-5)


class TestSE3:
    def test_exp_log_roundtrip(self, rng):
        wu = jnp.concatenate(
            [rand_rotvec(rng, (32, 3), 1.2), rand_rotvec(rng, (32, 3), 3.0)],
            axis=-1,
        )
        np.testing.assert_allclose(lie.se3_log(lie.se3_exp(wu)), wu, atol=1e-4)

    def test_exp_zero_is_identity(self):
        Rt = lie.se3_exp(jnp.zeros(6))
        np.testing.assert_allclose(Rt[:, :3], jnp.eye(3), atol=1e-7)
        np.testing.assert_allclose(Rt[:, 3], 0.0, atol=1e-7)

    def test_compose_inverse(self, rng):
        a = lie.se3_exp(rand_rotvec(rng, (8, 6), 1.0))
        ident = lie.pose_compose(a, lie.pose_inverse(a))
        np.testing.assert_allclose(ident[..., :3], jnp.broadcast_to(jnp.eye(3), (8, 3, 3)), atol=1e-5)
        np.testing.assert_allclose(ident[..., 3], 0.0, atol=1e-5)

    def test_pose_apply(self, rng):
        a = lie.se3_exp(rand_rotvec(rng, (6,), 1.0))
        pts = rand_rotvec(rng, (10, 3), 2.0)
        expected = pts @ a[:3, :3].T + a[:3, 3]
        np.testing.assert_allclose(lie.pose_apply(a, pts), expected, atol=1e-5)


class TestCont6d:
    def test_roundtrip(self, rng):
        R = lie.so3_exp(rand_rotvec(rng, (32, 3)))
        R2 = lie.cont_6d_to_rmat(lie.rmat_to_cont_6d(R))
        np.testing.assert_allclose(R, R2, atol=1e-5)

    def test_gram_schmidt_projects(self, rng):
        c = rand_rotvec(rng, (16, 6), 2.0)
        R = lie.cont_6d_to_rmat(c)
        eye = jnp.broadcast_to(jnp.eye(3), R.shape)
        np.testing.assert_allclose(jnp.swapaxes(R, -1, -2) @ R, eye, atol=1e-5)
        np.testing.assert_allclose(jnp.linalg.det(R), 1.0, atol=1e-5)


class TestInterpolation:
    def test_lerp_endpoints(self, rng):
        p0 = lie.se3_exp(rand_rotvec(rng, (6,), 1.0))
        p1 = lie.se3_exp(rand_rotvec(rng, (6,), 1.0))
        out = lie.se3_lerp(p0, p1, jnp.array([0.0, 1.0]))
        np.testing.assert_allclose(out[0], p0, atol=1e-5)
        np.testing.assert_allclose(out[1], p1, atol=1e-5)

    def test_lerp_midpoint_translation_linear(self, rng):
        p0 = lie.se3_exp(rand_rotvec(rng, (6,), 0.5))
        p1 = lie.se3_exp(rand_rotvec(rng, (6,), 0.5))
        mid = lie.se3_lerp(p0, p1, jnp.array([0.5]))[0]
        np.testing.assert_allclose(
            mid[:, 3], 0.5 * (p0[:, 3] + p1[:, 3]), atol=1e-5
        )
        # midpoint rotation: q0 * exp(0.5 log(q0^-1 q1))
        q0 = lie.rmat_to_quat(p0[:, :3])
        q1 = lie.rmat_to_quat(p1[:, :3])
        qm = lie.quat_mul(
            q0, lie.quat_exp(0.5 * lie.quat_log(lie.quat_mul(lie.quat_conj(q0), q1)))
        )
        np.testing.assert_allclose(mid[:, :3], lie.quat_to_rmat(qm), atol=1e-5)

    def test_lerp_identical_poses(self, rng):
        p = lie.se3_exp(rand_rotvec(rng, (6,), 1.0))
        out = lie.se3_lerp(p, p, jnp.linspace(0, 1, 5))
        for i in range(5):
            np.testing.assert_allclose(out[i], p, atol=1e-5)

    def test_lerp_batched(self, rng):
        p0 = lie.se3_exp(rand_rotvec(rng, (7, 6), 0.7))
        p1 = lie.se3_exp(rand_rotvec(rng, (7, 6), 0.7))
        out = lie.se3_lerp(p0, p1, jnp.broadcast_to(jnp.linspace(0, 1, 3), (7, 3)))
        assert out.shape == (7, 3, 3, 4)
        np.testing.assert_allclose(out[:, 0], p0, atol=1e-5)
        np.testing.assert_allclose(out[:, -1], p1, atol=1e-5)

    def test_cubic_bspline_shape_and_smooth(self, rng):
        poses = lie.se3_exp(rand_rotvec(rng, (4, 6), 0.3))
        u = jnp.linspace(0.0, 1.0, 9)
        out = lie.se3_cubic_bspline(poses, u)
        assert out.shape == (9, 3, 4)
        # valid rotations
        R = out[..., :3]
        eye = jnp.broadcast_to(jnp.eye(3), R.shape)
        np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), eye, atol=1e-4)

    def test_cubic_bspline_identical_knots(self, rng):
        p = lie.se3_exp(rand_rotvec(rng, (6,), 0.8))
        poses = jnp.broadcast_to(p, (4, 3, 4))
        out = lie.se3_cubic_bspline(poses, jnp.linspace(0, 1, 5))
        for i in range(5):
            np.testing.assert_allclose(out[i], p, atol=1e-4)


class TestProcrustes:
    def test_recovers_known_se3(self, rng):
        src = rand_rotvec(rng, (100, 3), 2.0)
        wu = rand_rotvec(rng, (6,), 0.8)
        gt = lie.se3_exp(wu)
        dst = lie.pose_apply(gt, src)
        (q, t, s), err = lie.solve_procrustes(src, dst, enforce_se3=True)
        np.testing.assert_allclose(s, 1.0, atol=1e-5)
        np.testing.assert_allclose(lie.quat_to_rmat(q), gt[:, :3], atol=1e-4)
        np.testing.assert_allclose(t, gt[:, 3], atol=1e-4)
        assert err < 1e-4

    def test_weighted_ignores_outliers(self, rng):
        src = rand_rotvec(rng, (50, 3), 2.0)
        gt = lie.se3_exp(rand_rotvec(rng, (6,), 0.5))
        dst = lie.pose_apply(gt, src)
        dst = dst.at[:5].add(10.0)  # corrupt 5 points
        w = jnp.ones(50).at[:5].set(0.0)
        (q, t, s), err = lie.solve_procrustes(src, dst, weights=w)
        np.testing.assert_allclose(lie.quat_to_rmat(q), gt[:, :3], atol=1e-4)
        assert err < 1e-4

    def test_similarity_scale(self, rng):
        src = rand_rotvec(rng, (60, 3), 2.0)
        gt = lie.se3_exp(rand_rotvec(rng, (6,), 0.5))
        dst = 2.5 * lie.pose_apply(gt, src)
        (q, t, s), err = lie.solve_procrustes(src, dst, enforce_se3=False)
        np.testing.assert_allclose(s, 2.5, rtol=1e-3)


class TestTaylor:
    def test_matches_exact_away_from_zero(self):
        x = jnp.linspace(0.01, 3.0, 50)
        np.testing.assert_allclose(lie.taylor_A(x), np.sin(x) / x, atol=1e-6)
        np.testing.assert_allclose(
            lie.taylor_B(x), (1 - np.cos(x)) / x**2, atol=1e-6
        )
        np.testing.assert_allclose(
            lie.taylor_C(x), (x - np.sin(x)) / x**3, atol=1e-5
        )

    def test_finite_at_zero_with_grads(self):
        for f in (lie.taylor_A, lie.taylor_B, lie.taylor_C):
            assert jnp.isfinite(f(jnp.array(0.0)))
            assert jnp.isfinite(jax.grad(f)(0.0))
