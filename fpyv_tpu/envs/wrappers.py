"""Env wrappers: observation normalization, frame stacking, action shaping.

Standard RL plumbing the reference lacks entirely; all wrappers follow the
same functional convention as the envs (state pytrees in, pytrees out) so
they compose under jit/vmap/shard_map.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
from flax import struct


# ---------------------------------------------------------------------------
# Running observation normalization (Welford across the batch per step)
# ---------------------------------------------------------------------------


@struct.dataclass
class ObsNormState:
    mean: jnp.ndarray  # (O,)
    var: jnp.ndarray  # (O,)
    count: jnp.ndarray  # ()


def obs_norm_init(obs_dim: int, dtype=jnp.float32) -> ObsNormState:
    return ObsNormState(
        mean=jnp.zeros(obs_dim, dtype),
        var=jnp.ones(obs_dim, dtype),
        count=jnp.asarray(1e-4, dtype),
    )


def obs_norm_update(state: ObsNormState, obs: jnp.ndarray) -> ObsNormState:
    """Fold a (N, O) batch into the running mean/var (parallel Welford)."""
    batch_mean = jnp.mean(obs, axis=0)
    batch_var = jnp.var(obs, axis=0)
    batch_count = jnp.asarray(obs.shape[0], state.count.dtype)
    delta = batch_mean - state.mean
    tot = state.count + batch_count
    new_mean = state.mean + delta * batch_count / tot
    m_a = state.var * state.count
    m_b = batch_var * batch_count
    m2 = m_a + m_b + delta**2 * state.count * batch_count / tot
    return ObsNormState(mean=new_mean, var=m2 / tot, count=tot)


def obs_norm_apply(state: ObsNormState, obs: jnp.ndarray,
                   clip: float = 10.0) -> jnp.ndarray:
    return jnp.clip(
        (obs - state.mean) / jnp.sqrt(state.var + 1e-8), -clip, clip)


# ---------------------------------------------------------------------------
# Frame stacking (for pixel observations)
# ---------------------------------------------------------------------------


@struct.dataclass
class FrameStackState:
    frames: jnp.ndarray  # (..., K, H, W)


def frame_stack_init(first_frame: jnp.ndarray, k: int = 4) -> FrameStackState:
    """Fill the stack with the first frame (standard warmup)."""
    return FrameStackState(
        frames=jnp.repeat(first_frame[..., None, :, :], k, axis=-3))


def frame_stack_push(state: FrameStackState,
                     frame: jnp.ndarray) -> FrameStackState:
    frames = jnp.concatenate(
        [state.frames[..., 1:, :, :], frame[..., None, :, :]], axis=-3)
    return FrameStackState(frames=frames)


def frame_stack_reset_where(state: FrameStackState, done,
                            frame: jnp.ndarray) -> FrameStackState:
    """On env auto-reset, refill that env's stack with the new first frame."""
    k = state.frames.shape[-3]
    refilled = jnp.repeat(frame[..., None, :, :], k, axis=-3)
    mask = done[..., None, None, None]
    return FrameStackState(frames=jnp.where(mask, refilled, state.frames))


# ---------------------------------------------------------------------------
# Action shaping
# ---------------------------------------------------------------------------


def squash_action(a: jnp.ndarray) -> jnp.ndarray:
    """tanh squash into the env's [-1, 1] action box."""
    return jnp.tanh(a)


def scale_action(a: jnp.ndarray, low, high) -> jnp.ndarray:
    """[-1, 1] -> [low, high] per dimension."""
    low = jnp.asarray(low, a.dtype)
    high = jnp.asarray(high, a.dtype)
    return low + (a + 1.0) * 0.5 * (high - low)


# ---------------------------------------------------------------------------
# Policy evaluation
# ---------------------------------------------------------------------------


def evaluate_policy(env, world, policy_fn: Callable, key, n_envs: int,
                    n_steps: int) -> dict:
    """Deterministic evaluation rollout: returns aggregate episode stats.

    policy_fn(obs) -> actions (no sampling — pass the mean action).
    Uses the env's auto-reset; episode returns are read from the env's own
    bookkeeping (AcroState.episode_return) when present, else summed rewards.
    """
    keys = jax.random.split(key, n_envs)
    state, obs = jax.vmap(lambda k: env.reset(k, world))(keys)

    def body(carry, _):
        st, obs = carry
        actions = policy_fn(obs)
        st, obs, reward, done, info = jax.vmap(
            lambda s, a: env.step(s, a, world))(st, actions)
        return (st, obs), (reward, done)

    (state, _), (rewards, dones) = jax.lax.scan(
        body, (state, obs), None, length=n_steps)
    rewards = jnp.asarray(rewards)
    dones = jnp.asarray(dones)
    return {
        "mean_step_reward": rewards.mean(),
        "total_episodes": dones.sum(),
        "crash_rate_per_step": dones.mean(),
        "reward_per_episode_lower_bound": rewards.sum() / jnp.maximum(
            dones.sum(), 1),
    }
