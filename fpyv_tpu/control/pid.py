"""Vectorized scalar PID with leaky integral and low-pass-filtered derivative.

Reference parity (src/utils/components.py:15-54):

- error = current - target (note the sign: the reference's PID drives
  *current toward target* through a negative path downstream)
- leaky integral: ``I <- clip(0.99 I + e dt, ±integral_clip)``
- derivative: ``clip((1 - is_first)(e - e_prev)/dt, -1, 1)`` then low-passed
  ``d <- (1-α) d_prev + α d`` (derivative_transition_rate)
- output: ``clip(kP e + kI I + kD d, min_output, max_output)``

The reference keeps unbounded history lists for plotting (components.py:45-51);
here metrics are the caller's concern (return values), state is fixed-size —
one (…,)-shaped array per field, batchable to any number of controllers.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
from flax import struct


@dataclass(frozen=True)
class PidParams:
    kP: float
    kI: float
    kD: float
    dt: float
    integral_clip: float = 1.0
    min_output: float = 0.3
    max_output: float = 1.0
    derivative_transition_rate: float = 0.5
    integral_leak: float = 0.99  # components.py:46


@struct.dataclass
class PidState:
    error: jnp.ndarray  # (...,)
    integral: jnp.ndarray
    prev_derivative: jnp.ndarray
    previous_error: jnp.ndarray
    is_first: jnp.ndarray  # (...,) bool


def pid_init(batch_shape=(), dtype=jnp.float32) -> PidState:
    z = jnp.zeros(batch_shape, dtype)
    return PidState(
        error=z, integral=z, prev_derivative=z, previous_error=z,
        is_first=jnp.ones(batch_shape, bool),
    )


def pid_step(params: PidParams, state: PidState, current, target):
    """Returns (new_state, output). Parity: components.py:43-54."""
    error = current - target
    integral = jnp.clip(
        params.integral_leak * state.integral + error * params.dt,
        -params.integral_clip, params.integral_clip,
    )
    raw_d = jnp.clip(
        jnp.where(state.is_first, 0.0, (error - state.previous_error) / params.dt),
        -1.0, 1.0,
    )
    a = params.derivative_transition_rate
    derivative = (1.0 - a) * state.prev_derivative + a * raw_d
    out = jnp.clip(
        params.kP * error + params.kI * integral + params.kD * derivative,
        params.min_output, params.max_output,
    )
    new_state = PidState(
        error=error,
        integral=integral,
        prev_derivative=derivative,
        previous_error=error,
        is_first=jnp.zeros_like(state.is_first),
    )
    return new_state, out
