"""Static-shape SoA world: targets (spheres), cylinders, gates, ground.

The reference keeps worlds as Python object lists and dispatches SDF calls
per object with `isinstance` checks (src/utils/components.py:198-214). On
TPU, worlds are structure-of-arrays with per-object active masks — all SDFs
evaluate branch-free over every (object, query-point) pair and masked terms
contribute zero. World fields may be unbatched (shared world) or carry
leading batch dims (per-env randomized worlds); broadcasting handles both.

SDF semantics replicated exactly:

- Sphere/Target (components.py:773-777): d = |p - c| - r; n = (p-c)/|p-c|.
- Cylinder (components.py:710-729): radial distance if z within the height
  band else sqrt(radial^2 + dz^2) — including the reference's quirks: the
  inside-radius + outside-band case still returns a positive sqrt, and
  `calculate_normal` compares the *relative* z against the *absolute* band
  (components.py:719-720 subtracts position before the band check). Both
  preserved behind `cylinder_normal`'s default; set
  ``relative_band_quirk=False`` for the fixed geometry.
- Ground (components.py:674-680): d = z (plane z=0), n = +z.
- Gate (components.py:819-822): signed plane distance; gates and trails are
  EXCLUDED from collisions (components.py:203) — gates only gate race progress.
- Moving targets follow a CircularPath (components.py:743-751,769-771):
  position_k = path_center + [R cos(2πk/res), R sin(2πk/res), 0], k += 1 per
  step; the first update() jumps the target onto the circle at angle 0.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class World:
    """SoA world. Leading dims of each field broadcast against env batches."""

    # Targets (spheres, may move on circular paths)
    sphere_center: jnp.ndarray  # (S, 3)
    sphere_radius: jnp.ndarray  # (S,)
    sphere_active: jnp.ndarray  # (S,) bool
    sphere_path_center: jnp.ndarray  # (S, 3)
    sphere_path_radius: jnp.ndarray  # (S,)
    sphere_path_res: jnp.ndarray  # (S,) int32 (points per revolution)
    sphere_path_count: jnp.ndarray  # (S,) int32 (CircularPath.count)
    sphere_has_path: jnp.ndarray  # (S,) bool
    # Cylinders (vertical obstacles)
    cyl_center: jnp.ndarray  # (C, 3) base-center position
    cyl_radius: jnp.ndarray  # (C,)
    cyl_height: jnp.ndarray  # (C,)
    cyl_active: jnp.ndarray  # (C,) bool
    # Gates (race track; no collisions)
    gate_pos: jnp.ndarray  # (G, 3)
    gate_rotmat: jnp.ndarray  # (G, 3, 3)
    gate_size: jnp.ndarray  # (G,)
    gate_active: jnp.ndarray  # (G,) bool
    gate_shape: jnp.ndarray  # (G,) int32: 0 rectangle, 1 circle, 2 half_circle
    # Ground plane z=0
    has_ground: jnp.ndarray  # () bool

    @property
    def num_spheres(self) -> int:
        return self.sphere_center.shape[-2]

    @property
    def num_cylinders(self) -> int:
        return self.cyl_center.shape[-2]

    @property
    def num_gates(self) -> int:
        return self.gate_pos.shape[-2]


def empty_world(n_spheres: int = 0, n_cylinders: int = 0, n_gates: int = 0,
                ground: bool = True, dtype=jnp.float32) -> World:
    """A fully-masked world with the given static capacities."""
    S, C, G = max(n_spheres, 1), max(n_cylinders, 1), max(n_gates, 1)
    z3 = jnp.zeros((S, 3), dtype)
    return World(
        sphere_center=z3,
        sphere_radius=jnp.ones((S,), dtype),
        sphere_active=jnp.zeros((S,), bool).at[:n_spheres].set(n_spheres > 0),
        sphere_path_center=z3,
        sphere_path_radius=jnp.zeros((S,), dtype),
        sphere_path_res=jnp.ones((S,), jnp.int32),
        sphere_path_count=jnp.zeros((S,), jnp.int32),
        sphere_has_path=jnp.zeros((S,), bool),
        cyl_center=jnp.zeros((C, 3), dtype),
        cyl_radius=jnp.ones((C,), dtype),
        cyl_height=jnp.ones((C,), dtype),
        cyl_active=jnp.zeros((C,), bool).at[:n_cylinders].set(n_cylinders > 0),
        gate_pos=jnp.zeros((G, 3), dtype),
        gate_rotmat=jnp.broadcast_to(jnp.eye(3, dtype=dtype), (G, 3, 3)),
        gate_size=jnp.ones((G,), dtype),
        gate_active=jnp.zeros((G,), bool).at[:n_gates].set(n_gates > 0),
        gate_shape=jnp.zeros((G,), jnp.int32),
        has_ground=jnp.asarray(ground),
    )


GATE_SHAPES = ("rectangle", "circle", "half_circle")  # gate_shape codes 0/1/2


# ---------------------------------------------------------------------------
# SDFs (batched over query points; masked-object aware)
# ---------------------------------------------------------------------------


def sphere_sdf(center, radius, points):
    """d = |p - c| - r, n = (p - c)/|p - c|. Parity: components.py:773-777.

    center: (..., S, 3), radius: (..., S), points: (..., M, 3)
    Returns d: (..., S, M), n: (..., S, M, 3).
    """
    rel = points[..., None, :, :] - center[..., :, None, :]  # (..., S, M, 3)
    dist = jnp.linalg.norm(rel, axis=-1)  # (..., S, M)
    d = dist - radius[..., :, None]
    n = rel / jnp.maximum(dist, 1e-12)[..., None]
    return d, n


def cylinder_sdf(center, radius, height, points, relative_band_quirk: bool = True):
    """Vertical cylinder signed distance + normal.

    Parity: components.py:710-729 including both reference quirks (module doc).

    center: (..., C, 3), radius/height: (..., C), points: (..., M, 3)
    Returns d: (..., C, M), n: (..., C, M, 3).
    """
    rel = points[..., None, :, :] - center[..., :, None, :]  # (..., C, M, 3)
    d2d = jnp.linalg.norm(rel[..., :2], axis=-1) - radius[..., :, None]  # (..., C, M)
    z0 = center[..., :, None, 2]
    z1 = z0 + height[..., :, None]
    pz = points[..., None, :, 2]
    in_band = (z0 < pz) & (pz < z1)
    dh = jnp.minimum(jnp.abs(pz - z0), jnp.abs(pz - z1))
    d = jnp.where(in_band, d2d, jnp.sqrt(d2d * d2d + dh * dh))

    # Normal: reference checks the band on the RELATIVE z (components.py:719-720).
    qz = rel[..., 2]
    band_for_normal = (z0 < qz) & (qz < z1) if relative_band_quirk else in_band
    side_n = jnp.concatenate(
        [rel[..., :2], jnp.zeros_like(rel[..., :1])], axis=-1
    )
    side_n = side_n / jnp.maximum(jnp.linalg.norm(side_n, axis=-1, keepdims=True), 1e-12)
    zq = qz if relative_band_quirk else pz
    cap_sign = jnp.where(jnp.abs(zq - z0) < jnp.abs(zq - z1), -1.0, 1.0)
    cap_n = jnp.concatenate(
        [jnp.zeros_like(rel[..., :2]), cap_sign[..., None]], axis=-1
    )
    n = jnp.where(band_for_normal[..., None], side_n, cap_n)
    return d, n


def ground_sdf(points):
    """Plane z=0: d = z, n = +z. Parity: components.py:674-680.

    points: (..., M, 3) -> d: (..., M), n: (..., M, 3).
    """
    d = points[..., 2]
    n = jnp.zeros_like(points).at[..., 2].set(1.0)
    return d, n


def gate_plane_distance(gate_pos, gate_rotmat, points):
    """Signed distance to the gate plane (normal = R[:,0]).
    Parity: components.py:811-822. Used for race progress, not collisions.

    gate_pos: (..., G, 3), gate_rotmat: (..., G, 3, 3), points: (..., M, 3)
    Returns (..., G, M).
    """
    normal = gate_rotmat[..., :, 0]  # (..., G, 3)
    rel = points[..., None, :, :] - gate_pos[..., :, None, :]
    return jnp.sum(rel * normal[..., None, :], axis=-1)


# ---------------------------------------------------------------------------
# Target motion (CircularPath)
# ---------------------------------------------------------------------------


def update_targets(world: World) -> World:
    """Advance moving targets one path step. Parity: components.py:743-751,769-771.

    ``CircularPath`` yields path[count % res] then increments count; the path
    is linspace(0, 2π, res+1)[:-1] scaled by radius around the path center
    (helper_functions.py:151-153), so position(count) =
    center + [R cos(2π count/res), R sin(2π count/res), 0].
    """
    res = jnp.maximum(world.sphere_path_res, 1)
    theta = (2.0 * jnp.pi) * (
        jnp.mod(world.sphere_path_count, res).astype(world.sphere_center.dtype)
        / res.astype(world.sphere_center.dtype)
    )
    offset = jnp.stack(
        [
            jnp.cos(theta) * world.sphere_path_radius,
            jnp.sin(theta) * world.sphere_path_radius,
            jnp.zeros_like(theta),
        ],
        axis=-1,
    )
    new_center = jnp.where(
        world.sphere_has_path[..., None],
        world.sphere_path_center + offset,
        world.sphere_center,
    )
    return world.replace(
        sphere_center=new_center,
        sphere_path_count=world.sphere_path_count + world.sphere_has_path.astype(jnp.int32),
    )
