"""Gyro noise model: random small-rotation perturbation of the attitude.

Reference parity (tests/rotation_pid.py:163-171): per step,
``current <- E(deg2rad(N(0, σ)³ mod 2π)) @ current`` — Gaussian noise in
DEGREES, the reference's quirky ``mod 2π`` applied in degree space (values
beyond ~6.28° wrap), then converted to radians and composed as a world-side
rotation. σ defaults to the reference's noise_lvl = 5.0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fpyv_tpu.ops import rotations as rot


def gyro_noise_rotation(key, sigma_deg: float = 5.0, batch_shape=(),
                        dtype=jnp.float32, mod_quirk: bool = True):
    """Sample the per-step noise rotation matrix."""
    noise_deg = sigma_deg * jax.random.normal(key, batch_shape + (3,), dtype)
    if mod_quirk:  # rotation_pid.py:171 applies mod 2π to degree values
        noise_deg = jnp.mod(noise_deg, 2.0 * jnp.pi)
    return rot.euler_to_rotmat(jnp.deg2rad(noise_deg))


def perturb_attitude(key, R, sigma_deg: float = 5.0, mod_quirk: bool = True):
    """``E_noise @ R`` with E_noise from :func:`gyro_noise_rotation`."""
    batch_shape = R.shape[:-2]
    N = gyro_noise_rotation(key, sigma_deg, batch_shape, R.dtype, mod_quirk)
    return rot.mat3_mul(N, R)
