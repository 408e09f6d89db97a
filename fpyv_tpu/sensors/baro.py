"""Barometric altimeter: pressure <-> altitude, noise, peak detection.

Reference parity:

- altitude from pressure (tests/height_pressure_calculator.py:4-9):
  ``h = ln(p0/p) · RT/(gM) + h0`` with g=9.80665, M=0.0289644 kg/mol,
  R=8.31432 J/(mol·K), T in Kelvin.
- ``pressure_from_altitude`` is its exact inverse (used to *simulate* the
  sensor from true height).
- ``quadratic_fit_reference`` ports the computation of
  tests/baro_max_altitude_test01.py:5-32 (``second_order_fit``): its
  "iterative" loop is a fixed point after one pass (a, b, c depend only on
  the data), so the port is the single-pass closed form — same outputs.
- ``is_peak_altitude`` ports the detector (:34-57): peak is declared after
  3 consecutive non-increasing samples that also fall below the quadratic
  fit's prediction.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

G0 = 9.80665  # m/s^2 (height_pressure_calculator.py:5)
M_AIR = 0.0289644  # kg/mol
R_GAS = 8.31432  # J/(mol K)


@dataclass(frozen=True)
class BaroParams:
    init_pressure: float = 101325.0  # Pa
    init_height: float = 0.0  # m
    temperature_c: float = 20.0
    noise_std: float = 0.0  # Pa

    @property
    def scale_height(self) -> float:
        T = self.temperature_c + 273.15
        return R_GAS * T / (G0 * M_AIR)


def altitude_from_pressure(pressure, params: BaroParams = BaroParams()):
    """h = ln(p0/p)·RT/(gM) + h0 (height_pressure_calculator.py:4-9)."""
    return (
        jnp.log(params.init_pressure / pressure) * params.scale_height
        + params.init_height
    )


def pressure_from_altitude(height, params: BaroParams = BaroParams()):
    """Exact inverse of :func:`altitude_from_pressure`."""
    return params.init_pressure * jnp.exp(
        -(height - params.init_height) / params.scale_height
    )


def baro_measure(height, key: Optional[jnp.ndarray] = None,
                 params: BaroParams = BaroParams()):
    """Simulate a barometric altitude reading from true height: true height ->
    pressure -> (+ Gaussian pressure noise) -> estimated altitude."""
    p = pressure_from_altitude(height, params)
    if key is not None and params.noise_std > 0.0:
        p = p + params.noise_std * jax.random.normal(key, jnp.shape(p), p.dtype)
    return altitude_from_pressure(p, params)


def quadratic_fit_reference(x, y):
    """Port of second_order_fit (baro_max_altitude_test01.py:5-32).

    The reference's normal equations are ad-hoc (a and b share a denominator
    and numerator forms that do not solve ordinary least squares) and its
    iteration is a no-op after the first pass; this reproduces exactly that
    first pass. Returns (a, b, c, r_squared). For a *correct* quadratic fit
    use fpyv_tpu.ops.poly.quadratic_fit.
    """
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    xm = jnp.mean(x, axis=-1, keepdims=True)
    denom = jnp.sum((x - xm) ** 2, axis=-1)
    a = jnp.sum((x - xm) ** 2 * y, axis=-1) / denom
    b = jnp.sum((x - xm) * y, axis=-1) / denom
    ym = jnp.mean(y, axis=-1)
    c = ym - a * xm[..., 0] - b * xm[..., 0] ** 2
    pred = a[..., None] * x**2 + b[..., None] * x + c[..., None]
    rss = jnp.sum((y - pred) ** 2, axis=-1)
    tss = jnp.sum((y - ym[..., None]) ** 2, axis=-1)
    r_squared = 1.0 - rss / tss
    return a, b, c, r_squared


def is_peak_altitude(time, measurements, patience: int = 3,
                     use_reference_fit: bool = True):
    """Peak-altitude detector (baro_max_altitude_test01.py:34-57), scan-native.

    Walks the measurement series keeping a running max and a counter of
    consecutive non-new-max samples; returns True if at any index the counter
    reaches `patience` while the sample is below the quadratic-fit prediction.
    """
    time = jnp.asarray(time)
    measurements = jnp.asarray(measurements)
    if use_reference_fit:
        a, b, c, _ = quadratic_fit_reference(time, measurements)
    else:
        from fpyv_tpu.ops.poly import quadratic_fit

        coef = quadratic_fit(time, measurements)
        a, b, c = coef[0], coef[1], coef[2]
    expected = a * time**2 + b * time + c

    def body(carry, inp):
        max_alt, counter, found = carry
        m, exp = inp
        new_max = m > max_alt
        max_alt = jnp.where(new_max, m, max_alt)
        counter = jnp.where(new_max, 0, counter + 1)
        found = found | ((counter >= patience) & (m < exp))
        return (max_alt, counter, found), None

    init = (measurements[..., 0], jnp.zeros_like(measurements[..., 0], jnp.int32),
            jnp.zeros(measurements.shape[:-1], bool))
    (_, _, found), _ = jax.lax.scan(
        body, init, (jnp.moveaxis(measurements, -1, 0), jnp.moveaxis(expected, -1, 0))
    )
    return found
