"""Trail: fixed-size ring buffer of past positions (for debug rendering).

Parity: components.py:631-646 — the reference grows an unbounded vstack and
keeps the last `trail_length` rows. The TPU version is a static ring buffer
(jit/vmap friendly); trails never collide (excluded with gates,
components.py:203) and are render-only.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class Trail:
    points: jnp.ndarray  # (..., L, 3)
    head: jnp.ndarray  # (...,) int32 next write slot
    count: jnp.ndarray  # (...,) int32 valid entries (<= L)

    @classmethod
    def create(cls, length: int, position, batch_shape=()):
        position = jnp.asarray(position)
        pts = jnp.zeros(batch_shape + (length, 3), position.dtype)
        pts = pts.at[..., 0, :].set(position)
        return cls(
            points=pts,
            head=jnp.ones(batch_shape, jnp.int32),
            count=jnp.ones(batch_shape, jnp.int32),
        )

    def update(self, position) -> "Trail":
        L = self.points.shape[-2]
        position = jnp.asarray(position)
        # one-hot masked write: works for scalar AND batched heads (a direct
        # .at[..., head, :] with a batched head gathers a cross product)
        slot = jax.lax.broadcasted_iota(
            jnp.int32, self.points.shape[:-1], self.points.ndim - 2)
        write = slot == (self.head % L)[..., None]
        pts = jnp.where(write[..., None], position[..., None, :], self.points)
        return Trail(
            points=pts,
            head=(self.head + 1) % L,
            count=jnp.minimum(self.count + 1, L),
        )

    def ordered(self) -> jnp.ndarray:
        """(..., L, 3) oldest-first (invalid slots repeat the newest point)."""
        L = self.points.shape[-2]
        lane = jnp.arange(L, dtype=jnp.int32)
        head = self.head[..., None]
        count = self.count[..., None]
        idx = jnp.mod(head - count + lane, L)
        # clamp the tail for partially-filled buffers
        idx = jnp.where(lane < count, idx, jnp.mod(head - 1, L))
        return jnp.take_along_axis(
            self.points, idx[..., None].astype(jnp.int32), axis=-2)


def render_trail(ax, trail: Trail, **kwargs):
    """Plot the trail polyline (components.py:645-646)."""
    from fpyv_tpu.viz.render3d import plot_3d_line

    plot_3d_line(ax, trail.ordered(), **kwargs)
