"""Unit tests for SO3/SE3/Sim3 Lie groups against closed-form identities
and a scipy rotation oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation as Rsc

from dvm_slam_tpu.geometry import lie


def rand_quat(rng, n=()):
    q = rng.randn(*(n + (4,))).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return jnp.asarray(np.where(q[..., 0:1] < 0, -q, q))


def rand_se3(rng, n=()):
    return lie.se3(rand_quat(rng, n), jnp.asarray(rng.randn(*(n + (3,))).astype(np.float32)))


def rand_sim3(rng, n=()):
    s = jnp.asarray(np.exp(rng.randn(*(n + (1,))) * 0.3).astype(np.float32))
    return jnp.concatenate([rand_se3(rng, n), s], axis=-1)


class TestQuat:
    def test_mul_matches_matrix_product(self, rng):
        a, b = rand_quat(rng, (32,)), rand_quat(rng, (32,))
        Rab = lie.quat_to_matrix(lie.quat_mul(a, b))
        expect = lie.quat_to_matrix(a) @ lie.quat_to_matrix(b)
        np.testing.assert_allclose(Rab, expect, atol=1e-5)

    def test_rotate_matches_matrix(self, rng):
        q = rand_quat(rng, (32,))
        p = jnp.asarray(rng.randn(32, 3).astype(np.float32))
        np.testing.assert_allclose(
            lie.quat_rotate(q, p),
            jnp.einsum("nij,nj->ni", lie.quat_to_matrix(q), p),
            atol=1e-5,
        )

    def test_matrix_roundtrip(self, rng):
        q = rand_quat(rng, (64,))
        q2 = lie.quat_from_matrix(lie.quat_to_matrix(q))
        np.testing.assert_allclose(np.abs(np.sum(np.asarray(q) * np.asarray(q2), -1)), 1.0, atol=1e-5)

    def test_matrix_vs_scipy(self, rng):
        q = np.asarray(rand_quat(rng, (16,)))
        # scipy uses xyzw
        R_sc = Rsc.from_quat(np.roll(q, -1, axis=-1)).as_matrix()
        np.testing.assert_allclose(lie.quat_to_matrix(jnp.asarray(q)), R_sc, atol=1e-5)


class TestSO3:
    def test_exp_log_roundtrip(self, rng):
        phi = jnp.asarray(rng.randn(64, 3).astype(np.float32))
        np.testing.assert_allclose(lie.so3_log(lie.so3_exp(phi)), phi, atol=1e-4)

    def test_exp_small_angle(self):
        phi = jnp.asarray([[1e-9, 0, 0], [0.0, 0, 0]])
        q = lie.so3_exp(phi)
        assert np.all(np.isfinite(q))
        np.testing.assert_allclose(q[1], [1, 0, 0, 0], atol=1e-7)
        np.testing.assert_allclose(lie.so3_log(q)[0], phi[0], atol=1e-12)

    def test_exp_vs_scipy(self, rng):
        phi = rng.randn(16, 3).astype(np.float32)
        R = lie.quat_to_matrix(lie.so3_exp(jnp.asarray(phi)))
        np.testing.assert_allclose(R, Rsc.from_rotvec(phi).as_matrix(), atol=1e-5)

    def test_grad_finite_at_zero(self):
        g = jax.grad(lambda p: jnp.sum(lie.so3_exp(p)))(jnp.zeros(3))
        assert np.all(np.isfinite(g))


class TestSE3:
    def test_mul_inv(self, rng):
        T = rand_se3(rng, (16,))
        I = lie.se3_mul(T, lie.se3_inv(T))
        np.testing.assert_allclose(np.abs(I[..., 0]), 1.0, atol=1e-5)
        np.testing.assert_allclose(I[..., 1:], 0.0, atol=1e-5)

    def test_exp_log_roundtrip(self, rng):
        xi = jnp.asarray(rng.randn(64, 6).astype(np.float32))
        np.testing.assert_allclose(lie.se3_log(lie.se3_exp(xi)), xi, atol=1e-3)

    def test_apply_matches_matrix(self, rng):
        T = rand_se3(rng, (16,))
        p = jnp.asarray(rng.randn(16, 3).astype(np.float32))
        M = lie.se3_matrix(T)
        ph = jnp.concatenate([p, jnp.ones((16, 1))], -1)
        np.testing.assert_allclose(
            lie.se3_apply(T, p), jnp.einsum("nij,nj->ni", M, ph)[..., :3], atol=1e-5
        )

    def test_from_matrix_roundtrip(self, rng):
        T = rand_se3(rng, (16,))
        T2 = lie.se3_from_matrix(lie.se3_matrix(T))
        np.testing.assert_allclose(lie.se3_apply(T, jnp.ones(3)), lie.se3_apply(T2, jnp.ones(3)), atol=1e-5)

    def test_compose_action(self, rng):
        a, b = rand_se3(rng, (8,)), rand_se3(rng, (8,))
        p = jnp.asarray(rng.randn(8, 3).astype(np.float32))
        np.testing.assert_allclose(
            lie.se3_apply(lie.se3_mul(a, b), p),
            lie.se3_apply(a, lie.se3_apply(b, p)),
            atol=1e-5,
        )

    def test_retract_at_zero_is_identity(self, rng):
        T = rand_se3(rng, (4,))
        T2 = lie.se3_retract(T, jnp.zeros((4, 6)))
        np.testing.assert_allclose(T, T2, atol=1e-6)


class TestSim3:
    def test_mul_inv(self, rng):
        S = rand_sim3(rng, (16,))
        I = lie.sim3_mul(S, lie.sim3_inv(S))
        np.testing.assert_allclose(np.abs(I[..., 0]), 1.0, atol=1e-5)
        np.testing.assert_allclose(I[..., 1:7], 0.0, atol=1e-4)
        np.testing.assert_allclose(I[..., 7], 1.0, atol=1e-5)

    def test_exp_log_roundtrip(self, rng):
        xi = jnp.asarray((rng.randn(64, 7) * 0.8).astype(np.float32))
        np.testing.assert_allclose(lie.sim3_log(lie.sim3_exp(xi)), xi, atol=2e-3)

    def test_exp_zero(self):
        S = lie.sim3_exp(jnp.zeros(7))
        np.testing.assert_allclose(S, lie.sim3_identity(), atol=1e-6)

    def test_compose_action(self, rng):
        a, b = rand_sim3(rng, (8,)), rand_sim3(rng, (8,))
        p = jnp.asarray(rng.randn(8, 3).astype(np.float32))
        np.testing.assert_allclose(
            lie.sim3_apply(lie.sim3_mul(a, b), p),
            lie.sim3_apply(a, lie.sim3_apply(b, p)),
            atol=1e-4,
        )

    def test_apply_scale(self, rng):
        S = lie.sim3_identity().at[7].set(2.0)
        p = jnp.ones((1, 3))
        np.testing.assert_allclose(lie.sim3_apply(S, p), 2.0 * p, atol=1e-6)

    def test_se3_embedding(self, rng):
        T = rand_se3(rng, (8,))
        S = lie.sim3_from_se3(T)
        p = jnp.asarray(rng.randn(8, 3).astype(np.float32))
        np.testing.assert_allclose(lie.sim3_apply(S, p), lie.se3_apply(T, p), atol=1e-5)
