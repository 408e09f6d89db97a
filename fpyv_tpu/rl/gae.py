"""Generalized Advantage Estimation as a reverse scan."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def compute_gae(rewards, values, dones, last_value, gamma: float, lam: float):
    """GAE(γ, λ) over a trajectory batch.

    Args:
      rewards: (T, N); values: (T, N) value of the state the action was taken
        in; dones: (T, N) episode end AFTER the transition; last_value: (N,)
        bootstrap value of the state after step T-1.
    Returns:
      advantages (T, N), value targets (T, N).
    """

    def body(carry, inp):
        gae, next_value = carry
        reward, value, done = inp
        nonterminal = 1.0 - done.astype(value.dtype)
        delta = reward + gamma * next_value * nonterminal - value
        gae = delta + gamma * lam * nonterminal * gae
        return (gae, value), gae

    (_, _), advantages = jax.lax.scan(
        body,
        (jnp.zeros_like(last_value), last_value),
        (rewards, values, dones),
        reverse=True,
    )
    return advantages, advantages + values
