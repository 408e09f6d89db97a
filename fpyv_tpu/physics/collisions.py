"""Motor-point collision handling: crash detection + spring contact forces.

Reference parity (src/utils/components.py:198-214 ``handle_collisions`` and
kinematics.py:56-59 ``spring_force``):

- SDFs are evaluated at the drone's 4 motor positions
  (``position + motors_relative_position @ R.T``, components.py:235).
- any signed distance < 0          -> crash (`done`)
- distance - motor_radius < 0      -> spring force
  ``F = (-k (d - r_m) - c (v . n)) n`` with k=100, c=0 (call site :212).
- Gates and trails never collide (components.py:203); ground does
  (and additionally any motor z < 0 is a crash, components.py:239-240).

One deliberate divergence, documented: on a crash frame the reference
early-returns with only the forces accumulated up to the crashing object
(components.py:207-210), while we always sum the full force field. Since a
crash terminates the episode (the sim loop breaks / the env auto-resets),
the post-crash force value is never observable in a trajectory.
"""

from __future__ import annotations

import jax.numpy as jnp

from fpyv_tpu.physics.world import World, cylinder_sdf, ground_sdf, sphere_sdf

SPRING_CONSTANT = 100.0  # components.py:198 (call-site default)
DAMPING_CONSTANT = 0.0
MOTOR_RADIUS = 0.1  # components.py:121


def _spring(d_pen, normal, velocity, k, c):
    """``(-k d - c (v . n)) n`` — kinematics.py:56-59. d_pen is already
    distance - motor_radius.  velocity: (..., 3) broadcasts over objects."""
    vn = jnp.sum(velocity[..., None, None, :] * normal, axis=-1)  # (..., O, M)
    mag = -k * d_pen - c * vn
    return mag[..., None] * normal  # (..., O, M, 3)


def collide(
    world: World,
    motor_points: jnp.ndarray,  # (..., M, 3)
    velocity: jnp.ndarray,  # (..., 3)
    motor_radius: float = MOTOR_RADIUS,
    spring_constant: float = SPRING_CONSTANT,
    damping_constant: float = DAMPING_CONSTANT,
):
    """Total contact force and crash flag over all active world objects.

    Returns:
      force: (..., 3) summed spring force over penetrating (object, motor) pairs.
      crashed: (...,) bool — any SDF < 0 at a motor point, or any motor z < 0.
    """
    total_force = jnp.zeros(motor_points.shape[:-2] + (3,), motor_points.dtype)
    crashed = jnp.zeros(motor_points.shape[:-2], bool)

    def accumulate(d, n, active, force, crash):
        pen = (d - motor_radius < 0) & active[..., :, None]
        f = _spring(d - motor_radius, n, velocity, spring_constant, damping_constant)
        force = force + jnp.sum(jnp.where(pen[..., None], f, 0.0), axis=(-3, -2))
        crash = crash | jnp.any((d < 0) & active[..., :, None], axis=(-2, -1))
        return force, crash

    if world.num_spheres:
        d, n = sphere_sdf(world.sphere_center, world.sphere_radius, motor_points)
        total_force, crashed = accumulate(d, n, world.sphere_active, total_force, crashed)
    if world.num_cylinders:
        d, n = cylinder_sdf(world.cyl_center, world.cyl_radius, world.cyl_height, motor_points)
        total_force, crashed = accumulate(d, n, world.cyl_active, total_force, crashed)

    # Ground: SDF contact force like any object when a Ground is in the world;
    # the crash rule "any motor below z=0" is UNCONDITIONAL in the reference
    # (components.py:239-240, outside handle_collisions).
    dg, ng = ground_sdf(motor_points)  # (..., M), (..., M, 3)
    ground_on = world.has_ground
    pen_g = (dg - motor_radius < 0) & ground_on
    vng = jnp.sum(velocity[..., None, :] * ng, axis=-1)
    fg = (-spring_constant * (dg - motor_radius) - damping_constant * vng)[..., None] * ng
    total_force = total_force + jnp.sum(jnp.where(pen_g[..., None], fg, 0.0), axis=-2)
    crashed = crashed | jnp.any(dg < 0, axis=-1)

    return total_force, crashed
