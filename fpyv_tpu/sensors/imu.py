"""IMU-style observation: what the reference's Drone.step returns.

Parity (components.py:224-225,247-248): "IRL the drone doesn't know its
state: Only IMU measurements and orientation" — the observation is
``(Rᵀ, E(rates), R @ accel)`` with the deg/s-as-radians gyro quirk.
This module builds that tuple from a DroneState (the step itself also
returns it; this is for wrappers that need it standalone) plus optional
accelerometer/gyro noise for the sensor-env configs.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from fpyv_tpu.ops import rotations as rot
from fpyv_tpu.physics.drone import DroneParams, DroneState, ImuObs, _att_to_rotmat


def imu_observation(params: DroneParams, state: DroneState,
                    key: Optional[jnp.ndarray] = None,
                    accel_noise_std: float = 0.0,
                    gyro_noise_std_deg: float = 0.0) -> ImuObs:
    R = _att_to_rotmat(params, state.att)
    rates = state.rates
    accel = state.accel
    if key is not None:
        ka, kg = jax.random.split(key)
        if accel_noise_std > 0.0:
            accel = accel + accel_noise_std * jax.random.normal(
                ka, accel.shape, accel.dtype)
        if gyro_noise_std_deg > 0.0:
            rates = rates + gyro_noise_std_deg * jax.random.normal(
                kg, rates.shape, rates.dtype)
    return ImuObs(
        world_from_body_T=jnp.swapaxes(R, -1, -2),
        gyro_matrix=rot.euler_to_rotmat(rates),  # deg/s-as-radians quirk
        accel_body=rot.mat3_vec(R, accel),
    )
