"""Gym-style adapter: classic reset()/step() API over the functional envs.

The reference exposes its envs through gym.Env (tests/rotation_pid.py:11,
find_by_distance.py:6, ma_com_simple_env.py:17). This adapter gives users
migrating from that API the same shape — numpy in/out, internal PRNG state,
vectorized under the hood — without requiring the gym package (a
`gym.Env`-registering subclass is provided when gym IS importable).

    env = GymAdapter(AcroEnv(), num_envs=16, seed=0)
    obs = env.reset()
    obs, reward, done, info = env.step(actions)  # numpy (16, ...) arrays
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np


class GymAdapter:
    """Stateful host-side wrapper over a functional env (reset/step pairs).

    Works with any env following the fpyv_tpu convention:
    ``reset(key, *args) -> (state, obs)``,
    ``step(state, action, *args) -> (state, obs, reward, done, info)``.
    Extra positional args (world, render bank, ...) are bound at
    construction. With num_envs > 1 everything is vmapped.
    """

    def __init__(self, env, num_envs: int = 1, seed: int = 0, env_args=()):
        self.env = env
        self.num_envs = num_envs
        self._args = env_args
        self._key = jax.random.key(seed)
        self._state = None

        if num_envs > 1:
            self._reset_fn = jax.jit(
                jax.vmap(lambda k: env.reset(k, *self._args)))
            self._step_fn = jax.jit(
                jax.vmap(lambda s, a: env.step(s, a, *self._args)))
        else:
            self._reset_fn = jax.jit(lambda k: env.reset(k, *self._args))
            self._step_fn = jax.jit(lambda s, a: env.step(s, a, *self._args))

    def reset(self) -> Any:
        self._key, sub = jax.random.split(self._key)
        keys = (jax.random.split(sub, self.num_envs)
                if self.num_envs > 1 else sub)
        self._state, obs = self._reset_fn(keys)
        return jax.tree.map(np.asarray, obs)

    def step(self, action):
        if self._state is None:
            raise RuntimeError("call reset() before step()")
        action = jax.tree.map(jnp.asarray, action)
        self._state, obs, reward, done, info = self._step_fn(
            self._state, action)
        to_np = lambda t: jax.tree.map(np.asarray, t)
        return to_np(obs), np.asarray(reward), np.asarray(done), to_np(info)

    def close(self) -> None:
        pass

    def seed(self, seed: Optional[int] = None) -> None:
        if seed is not None:
            self._key = jax.random.key(seed)
