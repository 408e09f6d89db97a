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


def make_policy_es(
    params,
    fitness_fn: Callable,  # fitness_fn(params_pytree, key) -> scalar
    *,
    n_perturbations: int = 32,
    noise_std: float = 0.05,
    learning_rate: float = 0.02,
    common_randomness: bool = True,
    mesh=None,
    mesh_axis: str = "env",
    sigma_decay: float = 1.0,
    sigma_min: float = 1e-3,
):
    """Build a chunkable NES trainer over a POLICY PARAM PYTREE.

    Returns ``(init_state, run_chunk, unravel)``:
    - ``init_state() -> es_state`` — (theta, sigma, best-so-far) carry
    - ``run_chunk(es_state, keys) -> (es_state, gen_best_hist)`` — one
      jittable ``lax.scan`` over ``keys.shape[0]`` generations; the trainer
      app calls it repeatedly with fixed-size key chunks so the compile is
      reused and progress can be logged between device calls
    - ``unravel(theta) -> params_pytree``

    Scaling and adaptation:
    - ``mesh``: a ``jax.sharding.Mesh`` shards the POPULATION axis across
      devices (each chip evaluates its slice of the 2P candidates — pure
      DP, no cross-chip traffic inside a generation; the rank transform and
      the (2P, dim) @ (dim,) gradient contraction are tiny and XLA inserts
      the gathers). Results are layout-independent: the math is identical
      with or without a mesh.
    - ``sigma_decay``: multiplicative anneal of noise_std applied whenever a
      generation fails to improve the best fitness seen so far (1.0 = off) —
      narrows the search around the incumbent as the task saturates,
      floored at ``sigma_min``.
    """
    from jax.flatten_util import ravel_pytree

    theta0, unravel = ravel_pytree(params)
    dim = theta0.shape[0]
    P = n_perturbations

    shard_pop = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        pop_sharding = NamedSharding(mesh, PartitionSpec(mesh_axis))

        def shard_pop(x):
            return jax.lax.with_sharding_constraint(x, pop_sharding)

    def centered_ranks(x):
        # fitness -> ranks in [-0.5, 0.5] (OpenAI-ES utility transform)
        ranks = jnp.argsort(jnp.argsort(x)).astype(theta0.dtype)
        return ranks / (x.shape[0] - 1) - 0.5

    def generation(carry, key_i):
        theta, sigma, best = carry
        k_noise, k_eval = jax.random.split(key_i)
        eps = jax.random.normal(k_noise, (P, dim), theta0.dtype)
        cand = jnp.concatenate(
            [theta[None] + sigma * eps, theta[None] - sigma * eps])
        if shard_pop is not None:
            cand = shard_pop(cand)
        # common random numbers: same eval episodes for every candidate in a
        # generation, so fitness differences reflect the params, not the draw
        eval_keys = (jnp.broadcast_to(k_eval, (2 * P,) + k_eval.shape)
                     if common_randomness else jax.random.split(k_eval, 2 * P))
        fits = jax.vmap(lambda c, k: fitness_fn(unravel(c), k))(
            cand, eval_keys)
        w = centered_ranks(fits)
        grad = (w[:P] - w[P:]) @ eps / (P * sigma)
        theta = theta + learning_rate * grad
        gen_best = fits.max()
        improved = gen_best > best
        sigma = jnp.where(improved, sigma,
                          jnp.maximum(sigma * sigma_decay, sigma_min))
        best = jnp.maximum(best, gen_best)
        return (theta, sigma, best), gen_best

    def init_state():
        return (theta0, jnp.asarray(noise_std, theta0.dtype),
                jnp.asarray(-jnp.inf, theta0.dtype))

    def run_chunk(es_state, keys):
        return jax.lax.scan(generation, es_state, keys)

    return init_state, run_chunk, unravel


def policy_es(
    key,
    params,
    fitness_fn: Callable,  # fitness_fn(params_pytree, key) -> scalar
    n_perturbations: int = 32,
    n_iterations: int = 100,
    noise_std: float = 0.05,
    learning_rate: float = 0.02,
    common_randomness: bool = True,
    mesh=None,
    mesh_axis: str = "env",
    sigma_decay: float = 1.0,
    sigma_min: float = 1e-3,
):
    """Natural evolution strategies over a POLICY PARAM PYTREE.

    The TPU-scale application of the reference's evolutionary-search sketch
    (tests/monte_carlo_search.py) to RL: antithetic Gaussian perturbations
    of the flattened params, fitness = rollout return (user-supplied,
    typically a vmapped env rollout), centered-rank weighting (scale-free),
    and an SGD step on the NES gradient estimate. One jittable scan; all
    2*n_perturbations candidates evaluate in parallel per generation —
    gradient-free learning for non-differentiable rewards. See
    ``make_policy_es`` for the mesh/sigma_decay semantics and the chunkable
    variant the trainer app uses.

    Returns (trained params pytree, (n_iterations,) best-fitness history).
    """
    init_state, run_chunk, unravel = make_policy_es(
        params, fitness_fn, n_perturbations=n_perturbations,
        noise_std=noise_std, learning_rate=learning_rate,
        common_randomness=common_randomness, mesh=mesh, mesh_axis=mesh_axis,
        sigma_decay=sigma_decay, sigma_min=sigma_min)
    keys = jax.random.split(key, n_iterations)
    (theta, _, _), best_hist = run_chunk(init_state(), keys)
    return unravel(theta), best_hist
