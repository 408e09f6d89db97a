"""Sensor model tests: gyro noise, barometer, UWB, IMU obs."""

import numpy as np
import jax
import jax.numpy as jnp

from fpyv_tpu.sensors import (
    BaroParams,
    altitude_from_pressure,
    baro_measure,
    gyro_noise_rotation,
    is_peak_altitude,
    perturb_attitude,
    pressure_from_altitude,
    quadratic_fit_reference,
    uwb_range,
)


class TestBaro:
    def test_reference_formula_value(self):
        # height_pressure_calculator.py main: p0=1000, p=1000-1e-3, T=20, h0=0
        p = BaroParams(init_pressure=1000.0, init_height=0.0, temperature_c=20.0)
        h = float(altitude_from_pressure(jnp.float64(1000.0 - 1e-3), p))
        # ln(1000/999.999)·(8.31432·293.15)/(9.80665·0.0289644) ≈ 8.585e-3 m
        ref = np.log(1000.0 / (1000.0 - 1e-3)) * (8.31432 * 293.15) / (
            9.80665 * 0.0289644)
        np.testing.assert_allclose(h, ref, rtol=1e-12)

    def test_round_trip(self):
        p = BaroParams()
        h = jnp.linspace(0.0, 500.0, 11, dtype=jnp.float64)
        back = altitude_from_pressure(pressure_from_altitude(h, p), p)
        np.testing.assert_allclose(np.asarray(back), np.asarray(h), atol=1e-9)

    def test_noisy_measurement_statistics(self):
        p = BaroParams(noise_std=5.0)
        h = jnp.full((20000,), 50.0, jnp.float64)
        m = baro_measure(h, jax.random.key(0), p)
        m = np.asarray(m)
        assert abs(m.mean() - 50.0) < 0.1
        assert m.std() > 0.01

    def test_quadratic_fit_reference_exact_parabola(self):
        # reference's own self-test: y = -x² + 2x + 2 (baro_max_altitude:60-62)
        x = jnp.asarray(np.linspace(0, 3, 100))
        y = -x**2 + 2 * x + 2
        a, b, c, r2 = quadratic_fit_reference(x, y)
        # the reference's ad-hoc normal equations do NOT recover (-1, 2, 2);
        # just verify the computation is deterministic and r² formula holds
        pred = a * x**2 + b * x + c
        rss = float(jnp.sum((y - pred) ** 2))
        tss = float(jnp.sum((y - jnp.mean(y)) ** 2))
        np.testing.assert_allclose(float(r2), 1 - rss / tss, rtol=1e-10)

    def test_peak_detection(self):
        x = jnp.asarray(np.linspace(0, 3, 100))
        rising = x * 2.0
        assert not bool(is_peak_altitude(x, rising))
        updown = -((x - 1.5) ** 2) + 3.0
        assert bool(is_peak_altitude(x, updown))


class TestGyro:
    def test_noise_rotation_is_rotation(self):
        R = gyro_noise_rotation(jax.random.key(0), 5.0, (64,), jnp.float64)
        RtR = np.einsum("nij,nik->njk", np.asarray(R), np.asarray(R))
        np.testing.assert_allclose(RtR, np.broadcast_to(np.eye(3), (64, 3, 3)),
                                   atol=1e-12)

    def test_perturb_statistics(self):
        R0 = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float64), (512, 3, 3))
        Rp = perturb_attitude(jax.random.key(1), R0, sigma_deg=5.0)
        # mean rotation angle should be on the order of the noise level
        tr = np.trace(np.asarray(Rp), axis1=-2, axis2=-1)
        ang = np.degrees(np.arccos(np.clip((tr - 1) / 2, -1, 1)))
        assert 1.0 < ang.mean() < 20.0

    def test_mod_quirk_changes_large_noise(self):
        """σ=200° noise: with the quirk angles wrap at 2π degrees (~6.28°)."""
        k = jax.random.key(2)
        Rq = gyro_noise_rotation(k, 200.0, (256,), jnp.float64, mod_quirk=True)
        Rn = gyro_noise_rotation(k, 200.0, (256,), jnp.float64, mod_quirk=False)
        assert not np.allclose(np.asarray(Rq), np.asarray(Rn))
        # quirk path: all effective euler angles within [0, 2π) degrees
        tr = np.trace(np.asarray(Rq), axis1=-2, axis2=-1)
        ang = np.degrees(np.arccos(np.clip((tr - 1) / 2, -1, 1)))
        assert ang.max() < 15.0  # 3 axes × ≤2π° each


class TestUwb:
    def test_clamp(self):
        pos = jnp.zeros((4, 3), jnp.float64)
        tgt = jnp.asarray([[5.0, 0, 0], [20.0, 0, 0], [1.0, 0, 0], [13.5, 0, 0]])
        r = uwb_range(pos, tgt, target_radius=0.5, max_range=13.0)
        np.testing.assert_allclose(np.asarray(r), [4.5, 13.0, 0.5, 13.0])

    def test_matches_reference_call_shape(self):
        # components.py:287: min(SDF distance, UWB_sensor_max_range)
        r = uwb_range(jnp.zeros(3), jnp.asarray([30.0, 0, 0]),
                      target_radius=1.0, max_range=13.0)
        assert float(r) == 13.0
