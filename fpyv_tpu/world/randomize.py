"""Device-side world randomization: per-env batched worlds.

World fields broadcast against env batches throughout the physics
(fpyv_tpu.physics.world) and the renderer, so a World whose fields carry a
leading (N,) axis gives every env its own obstacle course — the full
domain-randomization story on top of the per-env mass/drag/thrust scaling
(DomainRand). Sampling is pure jax.random, so worlds can be resampled
inside jitted training loops (e.g. per epoch) with no host round-trips.

Usage:
    worlds = sample_worlds(key, n_envs, n_spheres=1, n_cylinders=4)
    state, obs = jax.vmap(env.reset)(keys, worlds)      # per-env world
    state, *rest = jax.vmap(env.step)(state, acts, worlds)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from fpyv_tpu.physics.world import World, empty_world


@dataclass(frozen=True)
class WorldRanges:
    """Uniform sampling ranges mirroring params.yaml's generator blocks."""

    target_center: Tuple[float, float, float] = (0.0, 0.0, 3.0)
    target_center_std: float = 0.1  # targets block `std`
    target_radius: Tuple[float, float] = (0.8, 1.2)
    target_path_radius: Tuple[float, float] = (20.0, 30.0)
    target_path_res: int = 5500
    moving_targets: bool = True
    cyl_xy_std: float = 10.0  # obstacles block `center_std`
    cyl_radius: Tuple[float, float] = (1.0, 3.0)
    cyl_height: Tuple[float, float] = (4.0, 16.0)


def sample_worlds(key, n_envs: int, n_spheres: int = 1, n_cylinders: int = 4,
                  ranges: WorldRanges = WorldRanges(),
                  dtype=jnp.float32) -> World:
    """A batched World: every field gains a leading (n_envs,) axis."""
    ks, kr, kp, kc, kcr, kch = jax.random.split(key, 6)
    S, C = max(n_spheres, 1), max(n_cylinders, 1)

    center = jnp.asarray(ranges.target_center, dtype)
    sphere_center = center + ranges.target_center_std * jax.random.normal(
        ks, (n_envs, S, 3), dtype)
    sphere_radius = jax.random.uniform(
        kr, (n_envs, S), dtype, *ranges.target_radius)
    path_radius = jax.random.uniform(
        kp, (n_envs, S), dtype, *ranges.target_path_radius)

    cyl_xy = ranges.cyl_xy_std * jax.random.normal(kc, (n_envs, C, 2), dtype)
    cyl_center = jnp.concatenate(
        [cyl_xy, jnp.zeros((n_envs, C, 1), dtype)], axis=-1)
    cyl_radius = jax.random.uniform(kcr, (n_envs, C), dtype, *ranges.cyl_radius)
    cyl_height = jax.random.uniform(kch, (n_envs, C), dtype, *ranges.cyl_height)

    base = empty_world(n_spheres, n_cylinders, 0, ground=True, dtype=dtype)

    def tile(x):
        return jnp.broadcast_to(x, (n_envs,) + x.shape)

    return base.replace(
        sphere_center=sphere_center,
        sphere_radius=sphere_radius,
        sphere_active=tile(base.sphere_active),
        sphere_path_center=sphere_center,
        sphere_path_radius=(path_radius if ranges.moving_targets
                            else jnp.zeros_like(path_radius)),
        sphere_path_res=jnp.full((n_envs, S), ranges.target_path_res, jnp.int32),
        sphere_path_count=tile(base.sphere_path_count),
        sphere_has_path=jnp.broadcast_to(
            jnp.asarray(ranges.moving_targets), (n_envs, S)),
        cyl_center=cyl_center,
        cyl_radius=cyl_radius,
        cyl_height=cyl_height,
        cyl_active=tile(base.cyl_active),
        gate_pos=tile(base.gate_pos),
        gate_rotmat=tile(base.gate_rotmat),
        gate_size=tile(base.gate_size),
        gate_active=tile(base.gate_active),
        gate_shape=tile(base.gate_shape),
        has_ground=jnp.broadcast_to(base.has_ground, (n_envs,)),
    )


def curriculum_worlds(key, n_envs: int, difficulty, n_spheres: int = 1,
                      n_cylinders: int = 4,
                      ranges: WorldRanges = WorldRanges(),
                      dtype=jnp.float32) -> World:
    """Difficulty-ramped :func:`sample_worlds` for curriculum training.

    ``difficulty`` is a scalar in [0, 1] (may be traced — the trainer ramps
    it across iterations without recompiling): the obstacle COUNT ramps
    from 1 to n_cylinders via the active mask (shapes stay static) and the
    obstacle RADIUS from 60% to 100% of the sampled value. At d=1 the
    distribution equals sample_worlds' (modulo which RNG stream drew it).
    """
    d = jnp.clip(jnp.asarray(difficulty, dtype), 0.0, 1.0)
    w = sample_worlds(key, n_envs, n_spheres, n_cylinders, ranges, dtype)
    C = max(n_cylinders, 1)
    n_active = jnp.ceil(d * C).astype(jnp.int32)
    ramp = jnp.broadcast_to(jnp.arange(C) < n_active, w.cyl_active.shape)
    return w.replace(
        cyl_active=w.cyl_active & ramp,
        cyl_radius=w.cyl_radius * (0.6 + 0.4 * d),
    )
