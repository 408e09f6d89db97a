"""Sensor-model acro env: IMU + barometer + UWB observations.

BASELINE config #3: "sensor-model envs: gyro noise + baro altitude,
domain-randomized mass/drag/thrust". Wraps AcroEnv so the policy sees only
what a real FPV stack would (components.py:224-225: "IRL the drone doesn't
know its state: Only IMU measurements and orientation"):

- the IMU tuple (Rᵀ flattened, body acceleration) with optional accel noise,
- gyro rates with Gaussian noise (deg/s),
- barometric altitude simulated through the pressure model
  (fpyv_tpu.sensors.baro) with pressure noise,
- the UWB range to the chased target, clamped to the sensor max
  (components.py:287),
- the previous action (standard for partially observed control).

Domain randomization is inherited from AcroEnv(randomize=True).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from fpyv_tpu.envs.acro import AcroEnv, AcroState
from fpyv_tpu.physics.world import World
from fpyv_tpu.sensors.baro import BaroParams, baro_measure
from fpyv_tpu.sensors.uwb import uwb_range


@struct.dataclass
class SensorAcroState:
    acro: AcroState
    prev_action: jnp.ndarray  # (..., 4)
    key: jnp.ndarray


@dataclass(frozen=True)
class SensorAcroEnv:
    acro: AcroEnv = field(default_factory=lambda: AcroEnv(randomize=True))
    gyro_noise_std_deg: float = 1.0
    accel_noise_std: float = 0.3
    baro: BaroParams = field(default_factory=lambda: BaroParams(noise_std=5.0))
    uwb_max_range: float = 13.0
    uwb_noise_std: float = 0.05

    @property
    def obs_dim(self) -> int:
        # Rᵀ (9) + accel_body (3) + noisy rates (3) + baro alt (1)
        # + uwb range (1) + prev action (4)
        return 9 + 3 + 3 + 1 + 1 + 4

    def _obs(self, state: SensorAcroState, world: World, key):
        from fpyv_tpu.sensors.imu import imu_vectors

        d = state.acro.drone
        ki, kb, ku = jax.random.split(key, 3)
        R, rates, accel_body = imu_vectors(
            self.acro.params, d, key=ki,
            accel_noise_std=self.accel_noise_std,
            gyro_noise_std_deg=self.gyro_noise_std_deg)
        RT_flat = jnp.swapaxes(R, -1, -2).reshape(d.pos.shape[:-1] + (9,))
        alt = baro_measure(d.pos[..., 2], kb, self.baro)
        target = world.sphere_center[..., 0, :]
        rng = uwb_range(d.pos, target,
                        target_radius=world.sphere_radius[..., 0],
                        max_range=self.uwb_max_range, key=ku,
                        noise_std=self.uwb_noise_std)
        return jnp.concatenate(
            [RT_flat, accel_body / 30.0, rates / self.acro.params.max_rates,
             alt[..., None] / 20.0, rng[..., None] / self.uwb_max_range,
             state.prev_action],
            axis=-1,
        ).astype(self.acro.dtype)

    def reset(self, key, world: Optional[World] = None):
        world = self.acro.default_world() if world is None else world
        key, k1, k2 = jax.random.split(key, 3)
        acro_state, _ = self.acro.reset(k1, world)
        state = SensorAcroState(
            acro=acro_state,
            prev_action=jnp.zeros(acro_state.drone.pos.shape[:-1] + (4,),
                                  self.acro.dtype),
            key=key,
        )
        return state, self._obs(state, world, k2)

    def step(self, state: SensorAcroState, action,
             world: Optional[World] = None):
        world = self.acro.default_world() if world is None else world
        acro_state, _, reward, done, info = self.acro.step(
            state.acro, action, world)
        key, ko = jax.random.split(state.key)
        # zero the action memory across auto-reset boundaries: a new episode's
        # first obs must not carry the crashed episode's terminal action
        prev_action = jnp.where(done[..., None],
                                0.0, jnp.asarray(action, self.acro.dtype))
        next_state = SensorAcroState(
            acro=acro_state, prev_action=prev_action, key=key,
        )
        return next_state, self._obs(next_state, world, ko), reward, done, info
