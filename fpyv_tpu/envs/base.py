"""Shared helpers for functional envs."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def tree_where(pred, a, b):
    """Select between two pytrees per-leaf with a (...,)-bool predicate.

    `pred` broadcasts against each leaf's leading dims (the env batch); used
    for branch-free auto-reset: ``state = tree_where(done, reset_state, state)``.
    """

    def sel(x, y):
        x = jnp.asarray(x)
        extra = x.ndim - pred.ndim
        p = pred.reshape(pred.shape + (1,) * extra) if extra > 0 else pred
        return jnp.where(p, x, y)

    return jax.tree.map(sel, a, b)
