"""Unit tests for fpyv_tpu.ops.rotations against float64 NumPy references."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fpyv_tpu.ops import rotations as rot
from tools.oracle.sim import euler_to_R, R_to_euler, rotate_body_by_rates


def random_eulers(n=64, seed=0):
    rng = np.random.default_rng(seed)
    e = rng.uniform(-np.pi, np.pi, size=(n, 3))
    e[:, 1] *= 0.49  # keep pitch off gimbal lock for round-trip tests
    return e


class TestEulerRotmat:
    def test_matches_reference_composition(self):
        for e in random_eulers():
            R_ref = euler_to_R(*e)
            R_jax = np.asarray(rot.euler_to_rotmat(jnp.asarray(e)))
            np.testing.assert_allclose(R_jax, R_ref, atol=1e-12)

    def test_batched(self):
        e = random_eulers(32)
        R = np.asarray(rot.euler_to_rotmat(jnp.asarray(e)))
        for i in range(len(e)):
            np.testing.assert_allclose(R[i], euler_to_R(*e[i]), atol=1e-12)

    def test_round_trip(self):
        e = random_eulers(64, seed=1)
        R = rot.euler_to_rotmat(jnp.asarray(e))
        back = np.asarray(rot.rotmat_to_euler(R))
        np.testing.assert_allclose(back, e, atol=1e-9)

    def test_rotmat_to_euler_matches_oracle(self):
        for e in random_eulers(16, seed=2):
            R = euler_to_R(*e)
            np.testing.assert_allclose(
                np.asarray(rot.rotmat_to_euler(jnp.asarray(R))), R_to_euler(R), atol=1e-12
            )

    def test_single_axis(self):
        a = 0.37
        np.testing.assert_allclose(
            np.asarray(rot.rotmat_x(jnp.float64(a))), euler_to_R(a, 0, 0), atol=1e-15
        )
        np.testing.assert_allclose(
            np.asarray(rot.rotmat_y(jnp.float64(a))), euler_to_R(0, a, 0), atol=1e-15
        )
        np.testing.assert_allclose(
            np.asarray(rot.rotmat_z(jnp.float64(a))), euler_to_R(0, 0, a), atol=1e-15
        )


class TestQuaternions:
    def test_euler_to_quat_matches_matrix(self):
        e = jnp.asarray(random_eulers(64, seed=3))
        R_direct = rot.euler_to_rotmat(e)
        R_via_q = rot.quat_to_rotmat(rot.euler_to_quat(e))
        np.testing.assert_allclose(np.asarray(R_via_q), np.asarray(R_direct), atol=1e-12)

    def test_rotmat_quat_round_trip(self):
        e = jnp.asarray(random_eulers(64, seed=4))
        R = rot.euler_to_rotmat(e)
        q = rot.rotmat_to_quat(R)
        np.testing.assert_allclose(
            np.asarray(rot.quat_to_rotmat(q)), np.asarray(R), atol=1e-10
        )

    def test_rotmat_to_quat_matches_reference_trace_formula(self):
        # The reference (helper_functions.py:65-80) computes via trace only;
        # valid when trace > -1. Compare on that domain.
        for e in random_eulers(32, seed=5):
            R = euler_to_R(*e)
            if np.trace(R) <= -0.5:
                continue
            qw = np.sqrt(1 + np.trace(R)) / 2
            q_ref = np.array([
                qw,
                (R[2, 1] - R[1, 2]) / (4 * qw),
                (R[0, 2] - R[2, 0]) / (4 * qw),
                (R[1, 0] - R[0, 1]) / (4 * qw),
            ])
            q = np.asarray(rot.rotmat_to_quat(jnp.asarray(R)))
            np.testing.assert_allclose(q, q_ref, atol=1e-9)

    def test_quat_rotate_matches_matrix(self):
        rng = np.random.default_rng(6)
        e = jnp.asarray(random_eulers(32, seed=6))
        v = jnp.asarray(rng.normal(size=(32, 3)))
        q = rot.euler_to_quat(e)
        R = rot.euler_to_rotmat(e)
        np.testing.assert_allclose(
            np.asarray(rot.quat_rotate(q, v)),
            np.einsum("nij,nj->ni", np.asarray(R), np.asarray(v)),
            atol=1e-12,
        )
        np.testing.assert_allclose(
            np.asarray(rot.quat_inverse_rotate(q, v)),
            np.einsum("nji,nj->ni", np.asarray(R), np.asarray(v)),
            atol=1e-12,
        )

    def test_quat_mul_associates_with_rotation(self):
        e1 = jnp.asarray(random_eulers(16, seed=7))
        e2 = jnp.asarray(random_eulers(16, seed=8))
        q12 = rot.quat_mul(rot.euler_to_quat(e1), rot.euler_to_quat(e2))
        R12 = jnp.matmul(rot.euler_to_rotmat(e1), rot.euler_to_rotmat(e2))
        np.testing.assert_allclose(
            np.asarray(rot.quat_to_rotmat(q12)), np.asarray(R12), atol=1e-12
        )


class TestBodyRates:
    def test_rotate_body_by_rates_matches_oracle(self):
        rng = np.random.default_rng(9)
        for _ in range(16):
            e = rng.uniform(-1, 1, 3)
            R = euler_to_R(*e)
            rates = rng.uniform(-200, 200, 3)
            ref = rotate_body_by_rates(R, rates, 1 / 60)
            got = np.asarray(
                rot.rotate_body_by_rates(jnp.asarray(R), jnp.asarray(rates), 1 / 60)
            )
            np.testing.assert_allclose(got, ref, atol=1e-12)

    def test_quat_twin_matches_rotmat_path(self):
        rng = np.random.default_rng(10)
        e = jnp.asarray(rng.uniform(-1, 1, (32, 3)))
        rates = jnp.asarray(rng.uniform(-200, 200, (32, 3)))
        R = rot.euler_to_rotmat(e)
        q = rot.euler_to_quat(e)
        R_next = rot.rotate_body_by_rates(R, rates, 1 / 60)
        q_next = rot.quat_rotate_by_rates(q, rates, 1 / 60)
        np.testing.assert_allclose(
            np.asarray(rot.quat_to_rotmat(q_next)), np.asarray(R_next), atol=1e-12
        )


class TestAxisAngle:
    def test_round_trip(self):
        rng = np.random.default_rng(11)
        axis = rng.normal(size=(32, 3))
        axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
        angle = rng.uniform(0.01, np.pi - 0.01, 32)
        R = rot.axis_angle_to_rotmat(jnp.asarray(axis), jnp.asarray(angle))
        ax2, an2 = rot.rotmat_to_axis_angle(R)
        np.testing.assert_allclose(np.asarray(an2), angle, atol=1e-9)
        np.testing.assert_allclose(np.asarray(ax2), axis, atol=1e-7)

    def test_identity_edge(self):
        ax, an = rot.rotmat_to_axis_angle(jnp.eye(3))
        assert float(an) < 1e-6
        np.testing.assert_allclose(np.asarray(ax), [1.0, 0.0, 0.0])


def test_circular_path_matches_reference():
    # helper_functions.py:151-153
    center, radius, res = np.array([1.0, 2.0, 3.0]), 25.0, 16
    theta = np.linspace(0, 2 * np.pi, res + 1)[:-1]
    ref = np.stack([np.cos(theta) * radius, np.sin(theta) * radius,
                    np.zeros_like(theta)], axis=-1) + center
    got = np.asarray(rot.generate_circular_path(center, radius, res))
    np.testing.assert_allclose(got, ref, atol=1e-12)
