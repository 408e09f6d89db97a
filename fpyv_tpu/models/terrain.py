"""Procedural terrain from a random sin-activation MLP.

Reference parity (src/utils/terrainn.py:7-44 ``TerraiNN``): a randomly
initialized MLP with Sin activations maps (x, y) -> height, yielding smooth
Perlin-like terrain; the demo normalizes by the max and exponentiates
(:37-38). Layer sizes [2, *hidden, 1]; standard-normal init.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from fpyv_tpu.models import nn


class TerrainNet:
    """Key-seeded terrain field. Stateless: params live in the instance but
    evaluation is a pure function usable under jit/vmap."""

    def __init__(self, key, hidden_layers: Sequence[int] = (10, 10),
                 dtype=jnp.float32):
        sizes = (2, *hidden_layers, 1)
        self.params = nn.mlp_init(key, sizes, dtype=dtype)

    def __call__(self, xy: jnp.ndarray) -> jnp.ndarray:
        """xy: (..., 2) -> height (...,)."""
        return nn.mlp_apply(self.params, xy, activation=nn.sin)[..., 0]


def terrain_heightmap(key, scale: float = 5.0, resolution: int = 100,
                      hidden_layers: Sequence[int] = (10, 10),
                      normalize_exp: bool = True,
                      dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Grid heightmap like terrainn.py's __main__ (:29-44).

    Returns (xy grid (R²,2), heights (R²,)); with ``normalize_exp`` the
    reference's z/max -> exp(z) post-processing is applied.
    """
    net = TerrainNet(key, hidden_layers, dtype)
    axis = jnp.linspace(-scale, scale, resolution, dtype=dtype)
    xx, yy = jnp.meshgrid(axis, axis, indexing="xy")
    xy = jnp.stack([xx.reshape(-1), yy.reshape(-1)], axis=-1)
    z = net(xy)
    if normalize_exp:
        z = jnp.exp(z / jnp.max(z))
    return xy, z
