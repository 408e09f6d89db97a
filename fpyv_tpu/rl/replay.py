"""On-device ring replay buffer for off-policy learners.

Preallocated static-shape arrays living in HBM; inserts and samples are
pure functions, so the whole collect→store→sample→update loop stays inside
one jitted program (no host round-trips, unlike CPU replay stacks).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class ReplayBuffer:
    obs: jnp.ndarray  # (cap, O)
    action: jnp.ndarray  # (cap, A)
    reward: jnp.ndarray  # (cap,)
    next_obs: jnp.ndarray  # (cap, O)
    done: jnp.ndarray  # (cap,)
    ptr: jnp.ndarray  # () int32 next write slot
    size: jnp.ndarray  # () int32 valid entries

    @property
    def capacity(self) -> int:
        return self.obs.shape[0]


def replay_init(capacity: int, obs_dim: int, action_dim: int,
                dtype=jnp.float32) -> ReplayBuffer:
    return ReplayBuffer(
        obs=jnp.zeros((capacity, obs_dim), dtype),
        action=jnp.zeros((capacity, action_dim), dtype),
        reward=jnp.zeros((capacity,), dtype),
        next_obs=jnp.zeros((capacity, obs_dim), dtype),
        done=jnp.zeros((capacity,), dtype),
        ptr=jnp.zeros((), jnp.int32),
        size=jnp.zeros((), jnp.int32),
    )


def replay_add_batch(buf: ReplayBuffer, obs, action, reward, next_obs,
                     done) -> ReplayBuffer:
    """Insert N transitions at the ring pointer (N static, from the env bank)."""
    n = obs.shape[0]
    cap = buf.capacity
    idx = jnp.mod(buf.ptr + jnp.arange(n, dtype=jnp.int32), cap)
    # explicit casts: scatter with mismatched dtypes (e.g. f64 values under
    # x64 tests into the f32 buffer) is a FutureWarning on its way to an error
    return buf.replace(
        obs=buf.obs.at[idx].set(obs.astype(buf.obs.dtype)),
        action=buf.action.at[idx].set(action.astype(buf.action.dtype)),
        reward=buf.reward.at[idx].set(reward.astype(buf.reward.dtype)),
        next_obs=buf.next_obs.at[idx].set(next_obs.astype(buf.next_obs.dtype)),
        done=buf.done.at[idx].set(done.astype(buf.done.dtype)),
        ptr=jnp.mod(buf.ptr + n, cap),
        size=jnp.minimum(buf.size + n, cap),
    )


def replay_sample(buf: ReplayBuffer, key, batch_size: int) -> Tuple:
    """Uniform sample with replacement over the valid prefix."""
    idx = jax.random.randint(key, (batch_size,), 0,
                             jnp.maximum(buf.size, 1))
    return (buf.obs[idx], buf.action[idx], buf.reward[idx],
            buf.next_obs[idx], buf.done[idx])
