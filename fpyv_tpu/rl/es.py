"""Evolutionary / Monte-Carlo search: batched black-box optimization.

The reference sketches this in tests/monte_carlo_search.py: spawn offspring
around the incumbent by unit-normalized Gaussian noise scaled by noise_std
(:8-13), evaluate, select with a softmax over scores (:28-29), iterate.
Here the whole search is one scan — every generation's offspring evaluate
in parallel (vmap), which is the TPU-shaped version of the same algorithm.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def _offspring(key, best_x, n_offspring: int, noise_std: float):
    """tile + unit-normalized noise (monte_carlo_search.py:8-13)."""
    noise = jax.random.normal(key, (n_offspring,) + best_x.shape, best_x.dtype)
    noise = noise / jnp.maximum(
        jnp.linalg.norm(noise.reshape(n_offspring, -1), axis=1), 1e-12
    ).reshape((n_offspring,) + (1,) * best_x.ndim)
    return best_x[None] + noise_std * noise


def monte_carlo_search(
    key,
    x0: jnp.ndarray,
    f: Callable[[jnp.ndarray], jnp.ndarray],
    n_offspring: int = 64,
    n_iterations: int = 100,
    noise_std: float = 0.1,
    temperature: float = 1.0,
    maximize: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Softmax-weighted evolutionary search. Returns (best_x, best_score).

    f maps a candidate (like x0) to a scalar score; it is vmapped across the
    offspring, so write it jit-compatible.
    """
    sign = 1.0 if maximize else -1.0
    f_batch = jax.vmap(f)

    def body(carry, key_i):
        x_best, s_best = carry
        cand = _offspring(key_i, x_best, n_offspring, noise_std)
        scores = sign * f_batch(cand)
        # softmax-weighted recombination (temperature -> greedy as T -> 0)
        w = jax.nn.softmax(scores / jnp.maximum(temperature, 1e-9))
        x_mix = jnp.tensordot(w, cand, axes=1)
        s_mix = sign * f(x_mix)
        # keep the elite if the recombined point is worse
        i_best = jnp.argmax(scores)
        cand_best, cand_s = cand[i_best], scores[i_best]
        x_new, s_new = jax.lax.cond(
            s_mix >= cand_s,
            lambda: (x_mix, s_mix),
            lambda: (cand_best, cand_s),
        )
        improved = s_new > s_best
        x_out = jnp.where(improved, x_new, x_best)
        s_out = jnp.where(improved, s_new, s_best)
        return (x_out, s_out), s_out

    keys = jax.random.split(key, n_iterations)
    (x_best, s_best), _ = jax.lax.scan(body, (x0, sign * f(x0)), keys)
    return x_best, sign * s_best
