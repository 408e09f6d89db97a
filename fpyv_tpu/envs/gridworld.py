"""Two-agent communication gridworld (Instructor/Apprentice).

Reference parity (tests/ma_com_simple_env.py:17-57 ``MaComSimpleInstructions``):

- an N×N board with a one-hot state and a one-hot goal;
- the **Instructor** observes ``state - goal`` (the board difference) and
  emits a continuous 2-vector message;
- the **Apprentice** observes only the Instructor's previous message and
  picks one of 5 discrete moves (stay / roll state ±1 along either axis —
  torus topology via np.roll, :44-53);
- reward = sum(state * goal); done when they overlap (:54-55).

TPU-native representation: the one-hot board is kept as an integer (row,
col) pair; rolls become modular index arithmetic; the board-difference
observation is materialized only when requested. This is the seed of the
multi-agent communication line (BASELINE config #5 scales it up to the
multi-agent race env in fpyv_tpu.envs.multi_race).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict

import jax
import jax.numpy as jnp
from flax import struct

from fpyv_tpu.envs.base import tree_where


@struct.dataclass
class GridState:
    agent_rc: jnp.ndarray  # (..., 2) int32 (row, col) of the one-hot state
    goal_rc: jnp.ndarray  # (..., 2) int32
    message: jnp.ndarray  # (..., 2) last Instructor message
    done: jnp.ndarray
    key: jnp.ndarray


@dataclass(frozen=True)
class MaComGridEnv:
    map_size: int = 3
    auto_reset: bool = True
    dtype: type = jnp.float32

    def _sample(self, key):
        ka, kg = jax.random.split(key)
        a = jax.random.randint(ka, (2,), 0, self.map_size)
        g = jax.random.randint(kg, (2,), 0, self.map_size)
        return a.astype(jnp.int32), g.astype(jnp.int32)

    def board(self, rc):
        """Materialize the one-hot board from (row, col)."""
        r = jax.nn.one_hot(rc[..., 0], self.map_size, dtype=self.dtype)
        c = jax.nn.one_hot(rc[..., 1], self.map_size, dtype=self.dtype)
        return r[..., :, None] * c[..., None, :]

    def _obs(self, state: GridState) -> Dict[str, jnp.ndarray]:
        # Instructor sees state - goal (ma_com_simple_env.py:12-14,38);
        # Apprentice sees the last message.
        return {
            "Instructor": self.board(state.agent_rc) - self.board(state.goal_rc),
            "Apprentice": state.message,
        }

    def reset(self, key):
        key, sub = jax.random.split(key)
        a, g = self._sample(sub)
        state = GridState(
            agent_rc=a, goal_rc=g,
            message=jnp.zeros(2, self.dtype),
            done=jnp.asarray(False), key=key,
        )
        return state, self._obs(state)

    def step(self, state: GridState, action: Dict[str, jnp.ndarray]):
        """action = {"Instructor": (2,) float message, "Apprentice": int32 move}.

        Moves (ma_com_simple_env.py:44-53): 0 stay, 1 roll +row, 2 roll -row,
        3 roll +col, 4 roll -col (torus; np.roll of a one-hot == modular
        shift of its index).
        """
        move = action["Apprentice"]
        drow = jnp.where(move == 1, 1, jnp.where(move == 2, -1, 0))
        dcol = jnp.where(move == 3, 1, jnp.where(move == 4, -1, 0))
        agent_rc = jnp.stack(
            [
                jnp.mod(state.agent_rc[..., 0] + drow, self.map_size),
                jnp.mod(state.agent_rc[..., 1] + dcol, self.map_size),
            ],
            axis=-1,
        )
        reward = jnp.all(agent_rc == state.goal_rc, axis=-1).astype(self.dtype)
        done = reward > 0
        next_state = state.replace(
            agent_rc=agent_rc, message=action["Instructor"], done=done
        )
        if self.auto_reset:
            key, sub = jax.random.split(state.key)
            a_r, g_r = self._sample(sub)
            reset_state = GridState(
                agent_rc=a_r, goal_rc=g_r,
                message=jnp.zeros(2, self.dtype),
                done=jnp.zeros_like(done), key=key,
            )
            next_state = tree_where(done, reset_state, next_state.replace(key=key))
        return next_state, self._obs(next_state), reward, done, {}
