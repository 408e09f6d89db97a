"""UWB range sensor: true range clamped to the sensor's max range.

Reference parity (components.py:287):
``measured = min(target.calculate_distance(position), UWB_sensor_max_range)``
— note the reference clamps the *SDF* distance (range minus target radius).
Optional Gaussian noise extends the model for the sensor-env configs.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def uwb_range(position, target_center, target_radius=0.0, max_range: float = 13.0,
              key: Optional[jnp.ndarray] = None, noise_std: float = 0.0):
    """Batched UWB range measurement.

    position: (..., 3); target_center: (..., 3); target_radius: (...,) or scalar.
    """
    d = jnp.linalg.norm(target_center - position, axis=-1) - target_radius
    if key is not None and noise_std > 0.0:
        d = d + noise_std * jax.random.normal(key, d.shape, d.dtype)
    return jnp.minimum(d, max_range)
