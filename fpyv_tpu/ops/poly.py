"""Polynomial evaluation/fitting for the motor thrust curve.

The reference fits degree-3 polynomials to the T-Motor bench data on the host
(np.polyfit inside ``model_xy``, src/utils/flight_time_calculator.py:43-52)
and evaluates them every step. We keep the *fit* on the host in float64
(done once at config time, coefficients baked as static params) and make the
*eval* a Horner chain in jnp — fully fusable into the physics step.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def polyval(coeffs, x):
    """Horner evaluation. ``coeffs`` highest-degree-first (np.polyfit order).

    coeffs: (..., D+1) static or traced array; x: any shape broadcastable.
    """
    x = jnp.asarray(x)
    coeffs = jnp.asarray(coeffs, dtype=x.dtype)  # don't promote f32 states to f64
    acc = jnp.full_like(x, coeffs[..., 0])
    for i in range(1, coeffs.shape[-1]):
        acc = acc * x + coeffs[..., i]
    return acc


def fit_poly_through_origin(x, y, degree: int = 3, origin: bool = True) -> np.ndarray:
    """Host-side float64 least-squares fit, reference-exact.

    Parity: src/utils/flight_time_calculator.py:43-52 (``model_xy``) — a plain
    ``np.polyfit`` of degree `degree` with the point (0, 0) *prepended* to the
    data when ``origin=True`` (the origin is a sample, not a constraint).
    Returns coefficients highest-degree-first (np.polyfit order).
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    if origin:
        x = np.append(0.0, x)
        y = np.append(0.0, y)
    return np.polyfit(x, y, degree)


def quadratic_fit(x, y):
    """Least-squares quadratic fit y = a x^2 + b x + c, in jnp (device-side).

    This is the *correct* quadratic fit used by the baro peak-altitude
    detector (:mod:`fpyv_tpu.sensors.baro`). The reference's
    ``second_order_fit`` (tests/baro_max_altitude_test01.py:5-32) uses ad-hoc
    normal equations whose iteration is a fixed point after one pass; we also
    ship a parity port of that exact computation in the sensors module.
    """
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    X = jnp.stack([x * x, x, jnp.ones_like(x)], axis=-1)
    coef, *_ = jnp.linalg.lstsq(X, y[..., None])
    return coef[..., 0]
