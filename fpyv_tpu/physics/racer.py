"""Torque-based racer quad: the reference's second vehicle model.

Parity with tests/racer_drone_test.py:68-103 (``Racer``), the alternative
dynamics the reference explored alongside the main Drone — rate control via
torque PIDs and moment of inertia instead of direct rate low-passing:

- radius r = (prop_inch/2)·2.54/100, mass 0.5 kg, inertia I = m·r²·ones(3)
  (:70,82-83)
- per-axis PID on angular velocity vs the commanded rates; PID form
  (:11-32): error = desired − actual (NOTE: opposite sign of the main
  Drone's PID), leaky-free integral, raw derivative, gains dotted with
  [p, i, d]
- ω ← ω + τ·dt/I  (:98)
- attitude ← R @ E_intrinsic_XYZ(ω)  (:99) — scipy's ``from_euler("XYZ", ω)``
  on the RAW angular velocity (not ω·dt — a reference quirk, preserved):
  R_step = Rx(ω₀) @ Ry(ω₁) @ Rz(ω₂)
- force = action₃ · R[:,2]; v ← 0.9·v + a·dt (the 0.9 velocity damping
  quirk, :102); p ← p + v·dt (:103)

All state is a flax pytree batching over leading dims.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax.numpy as jnp
from flax import struct

from fpyv_tpu.ops import rotations as rot


@dataclass(frozen=True)
class RacerParams:
    prop_size_inch: float = 5.0
    mass: float = 0.5  # racer_drone_test.py:82
    dt: float = 1e-3  # :8
    velocity_damping: float = 0.9  # :102
    pid_roll: Tuple[float, float, float] = (2.0, 0.0, 0.0)  # :113
    pid_pitch: Tuple[float, float, float] = (2.0, 0.0, 0.0)
    pid_yaw: Tuple[float, float, float] = (0.1, 0.0, 0.0)

    @property
    def radius(self) -> float:
        return (self.prop_size_inch / 2.0) * 2.54 / 100.0

    @property
    def inertia(self) -> float:
        return self.mass * self.radius**2


@struct.dataclass
class RacerState:
    pos: jnp.ndarray  # (..., 3)
    vel: jnp.ndarray  # (..., 3)
    R: jnp.ndarray  # (..., 3, 3)
    omega: jnp.ndarray  # (..., 3) angular velocity
    i_error: jnp.ndarray  # (..., 3) PID integral
    last_error: jnp.ndarray  # (..., 3)
    is_first: jnp.ndarray  # (...,) bool


def racer_reset(batch_shape=(), dtype=jnp.float32) -> RacerState:
    """racer_drone_test.py:85-93."""
    z3 = jnp.zeros(batch_shape + (3,), dtype)
    return RacerState(
        pos=z3, vel=z3,
        R=jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch_shape + (3, 3)),
        omega=z3, i_error=z3, last_error=z3,
        is_first=jnp.ones(batch_shape, bool),
    )


def _intrinsic_xyz(angles: jnp.ndarray) -> jnp.ndarray:
    """scipy ``from_euler("XYZ", a)``: Rx(a0) @ Ry(a1) @ Rz(a2)."""
    Rx = rot.rotmat_x(angles[..., 0])
    Ry = rot.rotmat_y(angles[..., 1])
    Rz = rot.rotmat_z(angles[..., 2])
    return rot.mat3_mul(rot.mat3_mul(Rx, Ry), Rz)


def racer_step(params: RacerParams, state: RacerState,
               action: jnp.ndarray) -> RacerState:
    """action (..., 4): [roll_rate, pitch_rate, yaw_rate, thrust]."""
    dt = params.dt
    gains = jnp.asarray(
        [params.pid_roll, params.pid_pitch, params.pid_yaw],
        state.omega.dtype,
    )  # (3, 3): rows per axis, cols [kP, kI, kD]

    # per-axis torque PID (racer_drone_test.py:22-32,96)
    error = action[..., :3] - state.omega
    i_error = state.i_error + error * dt
    d_error = jnp.where(
        state.is_first[..., None], 0.0, (error - state.last_error) / dt)
    torque = (
        gains[:, 0] * error + gains[:, 1] * i_error + gains[:, 2] * d_error
    )

    omega = state.omega + torque * dt / params.inertia  # :98
    R = rot.mat3_mul(state.R, _intrinsic_xyz(omega))  # :99 (raw ω as angles)
    force = action[..., 3:4] * R[..., :, 2]  # :100
    accel = force / params.mass
    vel = params.velocity_damping * state.vel + accel * dt  # :102
    pos = state.pos + vel * dt  # :103

    return RacerState(
        pos=pos, vel=vel, R=R, omega=omega,
        i_error=i_error, last_error=error,
        is_first=jnp.zeros_like(state.is_first),
    )
