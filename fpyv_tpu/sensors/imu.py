"""IMU-style observation: what the reference's Drone.step returns.

Parity (components.py:224-225,247-248): "IRL the drone doesn't know its
state: Only IMU measurements and orientation" — the observation is
``(Rᵀ, E(rates), R @ accel)`` with the deg/s-as-radians gyro quirk.

:func:`imu_vectors` is the shared noisy-measurement core (orientation,
noisy body rates, noisy body-frame acceleration) consumed both by
:func:`imu_observation` (the reference's tuple shape) and the sensor-obs
envs (fpyv_tpu.envs.sensor_acro) — one implementation of the sensor model.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from fpyv_tpu.ops import rotations as rot
from fpyv_tpu.physics.drone import DroneParams, DroneState, ImuObs, _att_to_rotmat


def imu_vectors(params: DroneParams, state: DroneState,
                key: Optional[jnp.ndarray] = None,
                accel_noise_std: float = 0.0,
                gyro_noise_std_deg: float = 0.0
                ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(R (..., 3, 3), noisy rates deg/s (..., 3), noisy body accel (..., 3))."""
    R = _att_to_rotmat(params, state.att)
    rates = state.rates
    accel_body = rot.mat3_vec(R, state.accel)
    if key is not None:
        ka, kg = jax.random.split(key)
        if accel_noise_std > 0.0:
            accel_body = accel_body + accel_noise_std * jax.random.normal(
                ka, accel_body.shape, accel_body.dtype)
        if gyro_noise_std_deg > 0.0:
            rates = rates + gyro_noise_std_deg * jax.random.normal(
                kg, rates.shape, rates.dtype)
    return R, rates, accel_body


def imu_observation(params: DroneParams, state: DroneState,
                    key: Optional[jnp.ndarray] = None,
                    accel_noise_std: float = 0.0,
                    gyro_noise_std_deg: float = 0.0) -> ImuObs:
    """The reference's step-return tuple, optionally with sensor noise."""
    R, rates, accel_body = imu_vectors(
        params, state, key, accel_noise_std, gyro_noise_std_deg)
    return ImuObs(
        world_from_body_T=jnp.swapaxes(R, -1, -2),
        gyro_matrix=rot.euler_to_rotmat(rates),  # deg/s-as-radians quirk
        accel_body=accel_body,
    )
