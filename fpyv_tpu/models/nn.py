"""Minimal functional NN modules — the successor of the reference's hand-rolled
NumPy micro-framework (src/utils/nn.py: Module/Parameter/Linear/activations/
Attention/Sequential with manual backward passes).

On TPU there is no reason to hand-write backward passes — ``jax.grad``
differentiates the forward; so modules here are (init, apply) pairs over
parameter pytrees. API kept deliberately small; the RL networks use flax
(fpyv_tpu.models.policy), this module serves the terrain generator and as
the like-for-like counterpart of the reference's nn.py.

Parity notes:
- ``linear_init`` matches nn.py:51-52: standard-normal weights AND biases
  (not scaled); pass ``scale`` for fan-in scaling.
- ``attention`` matches nn.py:150-163: softmax(q kᵀ / sqrt(d)) v, returning
  (output, attention-weights).
"""

from __future__ import annotations

from typing import Callable, List, Sequence, Tuple

import jax
import jax.numpy as jnp

Params = dict


def linear_init(key, in_features: int, out_features: int, scale: float = 1.0,
                dtype=jnp.float32) -> Params:
    """N(0,1)·scale weights and biases (nn.py:51-52 uses scale=1)."""
    kw, kb = jax.random.split(key)
    return {
        "weight": scale * jax.random.normal(kw, (in_features, out_features), dtype),
        "bias": scale * jax.random.normal(kb, (out_features,), dtype),
    }


def linear_apply(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    return x @ params["weight"] + params["bias"]


# activations (nn.py:70-147)
relu = jax.nn.relu
sin = jnp.sin
cos = jnp.cos
tanh = jnp.tanh
sigmoid = jax.nn.sigmoid


def attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray):
    """Softmax attention (nn.py:150-163). q,k,v: (..., L, D)."""
    d = q.shape[-1]
    logits = jnp.einsum("...qd,...kd->...qk", q, k) / jnp.sqrt(
        jnp.asarray(d, q.dtype))
    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("...qk,...kd->...qd", weights, v)
    return out, weights


def mlp_init(key, sizes: Sequence[int], scale: float = 1.0,
             dtype=jnp.float32) -> List[Params]:
    keys = jax.random.split(key, len(sizes) - 1)
    return [
        linear_init(k, sizes[i], sizes[i + 1], scale, dtype)
        for i, k in enumerate(keys)
    ]


def mlp_apply(params: List[Params], x: jnp.ndarray,
              activation: Callable = tanh,
              final_activation: Callable | None = None) -> jnp.ndarray:
    """Sequential Linear/activation stack (nn.py:176-200's Sequential), with
    no activation after the last layer (terrainn.py:16 deletes the last one)."""
    for i, p in enumerate(params):
        x = linear_apply(p, x)
        if i < len(params) - 1:
            x = activation(x)
        elif final_activation is not None:
            x = final_activation(x)
    return x


def binarize(w: jnp.ndarray) -> jnp.ndarray:
    """Sign-binarize weights to ±1 with a straight-through estimator.

    The working form of tests/nn_1bit_weights.py's ±1-weight experiment
    (the reference sketch initializes random ±1 weights but never trains;
    with the STE the binarized net is actually trainable by jax.grad).
    """
    binary = jnp.where(w >= 0, 1.0, -1.0).astype(w.dtype)
    return w + jax.lax.stop_gradient(binary - w)


def binary_linear_apply(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Linear layer with ±1 (binarized) weights, full-precision bias."""
    return x @ binarize(params["weight"]) + params["bias"]
