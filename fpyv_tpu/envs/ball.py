"""Distance-only navigation env + proportional-navigation agent.

Reference parity (tests/find_by_distance.py:6-69):

- state: 2D ball position; goal sampled U(-1,1)²; the ONLY observation is
  the scalar distance to the goal (:24) — a UWB-style range sensor task.
- action: (2,) in [-1,1], applied as a position delta (:28).
- reward = -distance; done when distance < 0.1 (:30-31).
- ``ProportionalNavigation`` (:43-69): steer from consecutive range
  readings only.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from flax import struct

from fpyv_tpu.envs.base import tree_where


@struct.dataclass
class BallState:
    pos: jnp.ndarray  # (..., 2)
    goal: jnp.ndarray  # (..., 2)
    done: jnp.ndarray
    key: jnp.ndarray


@dataclass(frozen=True)
class BallEnv:
    threshold: float = 0.1
    auto_reset: bool = True
    dtype: type = jnp.float32

    def _sample(self, key):
        kp, kg = jax.random.split(key)
        pos = jax.random.uniform(kp, (2,), self.dtype, minval=-1.0, maxval=1.0)
        goal = jax.random.uniform(kg, (2,), self.dtype, minval=-1.0, maxval=1.0)
        return pos, goal

    def _obs(self, pos, goal):
        return jnp.linalg.norm(pos - goal, axis=-1)

    def reset(self, key):
        key, sub = jax.random.split(key)
        pos, goal = self._sample(sub)
        state = BallState(pos=pos, goal=goal, done=jnp.asarray(False), key=key)
        return state, self._obs(pos, goal)

    def step(self, state: BallState, action):
        pos = state.pos + action
        obs = self._obs(pos, state.goal)
        reward = -obs
        done = obs < self.threshold
        next_state = state.replace(pos=pos, done=done)
        if self.auto_reset:
            key, sub = jax.random.split(state.key)
            pos_r, goal_r = self._sample(sub)
            reset_state = BallState(
                pos=pos_r, goal=goal_r, done=jnp.zeros_like(done), key=key
            )
            next_state = tree_where(done, reset_state, next_state.replace(key=key))
        return next_state, self._obs(next_state.pos, next_state.goal), reward, done, {}


@struct.dataclass
class PropNavState:
    prev_obs: jnp.ndarray  # (...,) previous range reading
    has_prev: jnp.ndarray  # (...,) bool


@dataclass(frozen=True)
class ProportionalNavigation:
    """Range-only steering (tests/find_by_distance.py:43-69), vectorized.

    On the first step the reference samples a random action; after that:
    ``a = clip(|d| · sign(d - d_prev), -1, 1)`` broadcast to both axes.
    """

    def init(self, batch_shape=(), dtype=jnp.float32) -> PropNavState:
        return PropNavState(
            prev_obs=jnp.zeros(batch_shape, dtype),
            has_prev=jnp.zeros(batch_shape, bool),
        )

    def act(self, state: PropNavState, obs, key):
        velocity = obs - state.prev_obs
        course = jnp.abs(obs) * jnp.sign(velocity)
        steered = jnp.clip(course, -1.0, 1.0)[..., None] * jnp.ones(2, obs.dtype)
        random_a = jax.random.uniform(
            key, obs.shape + (2,), obs.dtype, minval=-1.0, maxval=1.0
        )
        action = jnp.where(state.has_prev[..., None], steered, random_a)
        return PropNavState(prev_obs=obs, has_prev=jnp.ones_like(state.has_prev)), action
