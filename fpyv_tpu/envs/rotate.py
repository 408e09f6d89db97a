"""Attitude-alignment env: rotate the body to a goal orientation.

Reference parity (tests/rotation_pid.py:11-97 ``Rotate(gym.Env)``):

- obs: goal and current rotation matrices stacked on the last axis (3,3,2)
  (rotation_pid.py:52: goal first, current second)
- action: (3,) in [-1,1], scaled to body rates by ``max_rates`` (:45-46)
- dynamics: ``R_current <- rotate_body_by_rates(R_current, rates, dt)`` (:75)
- reward: ``-((R_goalᵀ R_current - I)²).sum()`` (:54-55,78)
- done: error < threshold (:76-77)
- reset: goal Euler ~ U(0, 2π)³ (the reference's no-joystick branch :62);
  current = (goal + N(0, difficulty)) mod 2π (:63)

Plus the gyro-noise sensor model from the reference's main loop
(rotation_pid.py:163-171), exposed as ``noise_lvl_deg`` (0 disables):
``current <- E(deg2rad(N(0, σ)³ mod 2π)) @ current`` — including the
reference's quirk of applying ``mod 2π`` to *degree*-valued noise.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from flax import struct

from fpyv_tpu.envs.base import tree_where
from fpyv_tpu.ops import rotations as rot


@struct.dataclass
class RotateState:
    goal: jnp.ndarray  # (..., 3, 3)
    current: jnp.ndarray  # (..., 3, 3)
    done: jnp.ndarray  # (...,)
    key: jnp.ndarray  # per-env PRNG key


@dataclass(frozen=True)
class RotateEnv:
    dt: float = 1e-2
    max_rates: float = 1000.0  # deg/s (rotation_pid.py:12)
    threshold: float = 1e-3
    difficulty: float = 1.0
    noise_lvl_deg: float = 0.0  # gyro noise σ (rotation_pid.py:163: 5.0)
    auto_reset: bool = True
    dtype: type = jnp.float32

    def _sample(self, key):
        kg, kc = jax.random.split(key)
        euler_goal = jax.random.uniform(
            kg, (3,), self.dtype, minval=0.0, maxval=2.0 * jnp.pi
        )
        euler_current = jnp.mod(
            euler_goal + self.difficulty * jax.random.normal(kc, (3,), self.dtype),
            2.0 * jnp.pi,
        )
        return rot.euler_to_rotmat(euler_goal), rot.euler_to_rotmat(euler_current)

    def reset(self, key):
        key, sub = jax.random.split(key)
        goal, current = self._sample(sub)
        state = RotateState(
            goal=goal, current=current, done=jnp.asarray(False), key=key
        )
        return state, self._obs(state)

    def _obs(self, state: RotateState):
        # (3,3,2): goal in channel 0, current in channel 1 (rotation_pid.py:52)
        return jnp.stack([state.goal, state.current], axis=-1)

    def _error(self, goal, current):
        rel = jnp.einsum("...ji,...jk->...ik", goal, current, precision="highest")  # R_gᵀ R_c
        eye = jnp.eye(3, dtype=rel.dtype)
        return jnp.sum((rel - eye) ** 2, axis=(-2, -1))

    def step(self, state: RotateState, action):
        key = state.key
        current = state.current
        if self.noise_lvl_deg > 0.0:
            key, kn = jax.random.split(key)
            noise_deg = self.noise_lvl_deg * jax.random.normal(kn, (3,), self.dtype)
            # reference quirk: mod 2π applied to degrees (rotation_pid.py:171)
            noise = jnp.deg2rad(jnp.mod(noise_deg, 2.0 * jnp.pi))
            current = rot.mat3_mul(rot.euler_to_rotmat(noise), current)

        rates = action * self.max_rates
        current = rot.rotate_body_by_rates(current, rates, self.dt)
        err = self._error(state.goal, current)
        reward = -err
        done = err < self.threshold

        next_state = state.replace(current=current, done=done, key=key)
        if self.auto_reset:
            key, sub = jax.random.split(key)
            goal_r, current_r = self._sample(sub)
            reset_state = RotateState(
                goal=goal_r, current=current_r, done=jnp.zeros_like(done), key=key
            )
            next_state = tree_where(done, reset_state, next_state)
        return next_state, self._obs(next_state), reward, done, {"error": err}
