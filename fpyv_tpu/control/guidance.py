"""Pixel-guidance autopilots: fly the drone toward a pixel in its camera.

Reference parity (src/utils/components.py):

- ``needed_force_orientation`` ports ``calculate_needed_force_orientation``
  (:258-304): from a target pixel, build the world-frame force that chases
  it — distance-keeping PID on the UWB-clamped range, "virtual drag"
  opposing motion away from the target, "virtual ground-effect lift" below
  ``tof_effective_distance``, minus gravity — and the attitude whose +z
  column applies that force ("level": y = F×g; "frontarget": y = F×dir).
- ``point_and_shoot`` ports :312-381 (the stick-flyable variant): the
  action offsets a virtual target on screen, the PID tracks the pixel ROW,
  a saturation loop rescales the PID multiplier until ‖F‖ fits under the
  motor ceiling, and the returned ‖F‖ maps back through thrust2throttle.

Both return (R_desired, ‖F‖) which ``drone_step`` applies via its
att_override/thrust_override path (components.py:230-232). All math is
batched; the reference's g=9.81 hardcode in these functions (independent
of params.gravity) is preserved.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from fpyv_tpu.config import FpyvConfig
from fpyv_tpu.control.pid import PidParams, PidState, pid_init, pid_step
from fpyv_tpu.physics.drone import DroneParams
from fpyv_tpu.vision.camera import CameraRig, pixel_to_direction


@dataclass(frozen=True)
class GuidanceParams:
    virtual_drag_coef: float = 0.5  # params.yaml point_and_shoot block
    virtual_lift_coef: float = 0.1
    tof_effective_distance: float = 2.0
    keep_distance: float = 6.0
    uwb_max_range: float = 13.0
    mode: str = "level"  # 'level' | 'frontarget'
    pid: PidParams = field(default_factory=lambda: PidParams(
        kP=0.1, kI=2.0, kD=0.05, dt=1 / 60, integral_clip=100.0,
        min_output=0.05, max_output=40.0, derivative_transition_rate=0.2))

    @classmethod
    def from_config(cls, cfg: FpyvConfig, drone_params: DroneParams,
                    dt: Optional[float] = None) -> "GuidanceParams":
        pns = cfg.point_and_shoot
        pid_cfg = cfg.drone.force_multiplier_pid
        curve = drone_params.thrust_curve
        return cls(
            virtual_drag_coef=pns.virtual_drag_coefficient,
            virtual_lift_coef=pns.virtual_lift_coefficient,
            tof_effective_distance=pns.tof_effective_distance,
            keep_distance=cfg.drone.keep_distance,
            uwb_max_range=cfg.drone.UWB_sensor_max_range,
            mode=pns.mode,
            # min/max output overwritten by the thrust-curve force limits
            # (components.py:143-144)
            pid=PidParams(
                kP=pid_cfg.kP, kI=pid_cfg.kI, kD=pid_cfg.kD,
                dt=dt if dt is not None else drone_params.dt,
                integral_clip=pid_cfg.integral_clip,
                min_output=curve.min_force, max_output=curve.max_force,
                derivative_transition_rate=pid_cfg.derivative_transition_rate,
            ),
        )


@struct.dataclass
class GuidanceState:
    pid: PidState
    prev_pixel: jnp.ndarray  # (..., 2)
    pixel_velocity: jnp.ndarray  # (..., 2)
    has_prev: jnp.ndarray  # (...,) bool


def guidance_init(batch_shape=(), dtype=jnp.float32) -> GuidanceState:
    return GuidanceState(
        pid=pid_init(batch_shape, dtype),
        prev_pixel=jnp.zeros(batch_shape + (2,), dtype),
        pixel_velocity=jnp.zeros(batch_shape + (2,), dtype),
        has_prev=jnp.zeros(batch_shape, bool),
    )


def _gravity(mass: float, dtype):
    """g pinned to 9.81 here regardless of sim gravity (components.py:270)."""
    return jnp.asarray([0.0, 0.0, -9.81 * mass], dtype)


def _virtual_drag(velocity, dir2target, coef: float):
    """components.py:271-285: cosine-gated anti-velocity force, mapped to
    fire only when moving away from the target.
    ``-(v̂·d - 1)/2 · (-v) · ‖v‖ · coef``  (signs exactly as the reference)."""
    vnorm = jnp.linalg.norm(velocity, axis=-1, keepdims=True)
    vhat = velocity / jnp.maximum(vnorm, 1e-12)
    cosang = jnp.sum(vhat * dir2target, axis=-1, keepdims=True)
    return coef * (-(cosang - 1.0) / 2.0) * (-velocity) * vnorm


def _force_basis(force, second_ref, mode_force_norm=None):
    """Attitude whose z column is the (normalized) force: columns
    [x, y, z=F] with y = F × ref, x = y × F; each column normalized
    (components.py:294-303)."""
    y = jnp.cross(force, second_ref)
    x = jnp.cross(y, force)
    R = jnp.stack([x, y, force], axis=-1)
    return R / jnp.maximum(jnp.linalg.norm(R, axis=-2, keepdims=True), 1e-12)


def needed_force_orientation(
    g: GuidanceParams,
    state: GuidanceState,
    rig: CameraRig,
    cam_R: jnp.ndarray,  # (..., 3, 3) camera-to-world rotation
    pixel: jnp.ndarray,  # (..., 2) target pixel
    position: jnp.ndarray,  # (..., 3) drone position
    velocity: jnp.ndarray,  # (..., 3)
    dist_to_target: jnp.ndarray,  # (...,) SDF distance to target (pre-clamp)
    mass: float,
) -> Tuple[GuidanceState, jnp.ndarray, jnp.ndarray]:
    """Port of calculate_needed_force_orientation (components.py:258-304),
    ref_frame='world'. Returns (state, R_desired (...,3,3), |F| (...,))."""
    dtype = position.dtype
    dir2target = pixel_to_direction(rig, cam_R, pixel)
    gravity = _gravity(mass, dtype)
    vdrag = _virtual_drag(velocity, dir2target, g.virtual_drag_coef)
    below = (position[..., 2] < g.tof_effective_distance).astype(dtype)
    vlift = (
        below[..., None]
        * -(g.tof_effective_distance - position[..., 2])[..., None]
        * g.virtual_lift_coef * gravity
        * (1.0 + jnp.abs(velocity[..., 2]))[..., None]
    )  # components.py:286
    measured = jnp.minimum(dist_to_target, g.uwb_max_range)  # :287
    pid_state, mult = pid_step(g.pid, state.pid, measured, g.keep_distance)
    mult = jnp.clip(mult, g.pid.min_output, g.pid.max_output)  # :290 (redundant)
    force = mult[..., None] * dir2target + vdrag + vlift - gravity  # :292
    force_norm = jnp.linalg.norm(force, axis=-1)
    second = gravity if g.mode == "level" else dir2target
    R_des = _force_basis(force, jnp.broadcast_to(second, force.shape))
    return state.replace(pid=pid_state), R_des, force_norm


def point_and_shoot(
    g: GuidanceParams,
    state: GuidanceState,
    rig: CameraRig,
    cam_R: jnp.ndarray,
    pixel: jnp.ndarray,  # (..., 2) target pixel (pre virtual offset)
    action: jnp.ndarray,  # (..., 4) [x-screen, y-screen, orbit, over/under]
    position: jnp.ndarray,
    velocity: jnp.ndarray,
    mass: float,
    max_force: float,
    dt: float,
) -> Tuple[GuidanceState, jnp.ndarray, jnp.ndarray]:
    """Port of point_and_shoot (components.py:312-381), ref_frame='world'.
    Returns (state, R_desired, |F|)."""
    dtype = position.dtype
    res = jnp.asarray(rig.resolution, dtype)
    pixel = pixel + action[..., 2:4] * res / 2.0  # virtual target (:322-323)

    pixel_velocity = jnp.where(
        state.has_prev[..., None], (pixel - state.prev_pixel) / dt, 0.0)
    new_state_pix = dict(prev_pixel=pixel, pixel_velocity=pixel_velocity,
                         has_prev=jnp.ones_like(state.has_prev))

    dir2target = pixel_to_direction(rig, cam_R, pixel)
    gravity = _gravity(mass, dtype)
    vdrag = _virtual_drag(velocity, dir2target, g.virtual_drag_coef)
    below = (position[..., 2] < g.tof_effective_distance).astype(dtype)
    vz_neg = -jnp.clip(velocity[..., 2], max=0.0)  # :345
    vlift = (
        below[..., None]
        * -(g.tof_effective_distance - position[..., 2])[..., None]
        * g.virtual_lift_coef * gravity * vz_neg[..., None]
    )

    # screen-position setpoint (:348-350): PID on the pixel ROW
    screen_pos = jnp.trunc(res / 2.0 * (1.0 + action[..., 0:2]))  # :383-387
    pid_state, mult = pid_step(g.pid, state.pid, pixel[..., 1], screen_pos[..., 1])

    def total_force(m):
        return m[..., None] * dir2target + vdrag + vlift - gravity

    force = total_force(mult)
    force_norm = jnp.linalg.norm(force, axis=-1)

    # saturation loop (:357-366): shrink mult until ‖F‖ <= max_force.
    # First pass uses criteria=0.9999, then criteria = max/‖F‖ — converges in
    # a couple of iterations; run a fixed 4 masked iterations (branch-free).
    criteria = jnp.full_like(force_norm, 0.9999)
    for _ in range(4):
        over = force_norm > max_force
        new_mult = jnp.clip(mult * criteria, g.pid.min_output, g.pid.max_output)
        mult = jnp.where(over, new_mult, mult)
        force = total_force(mult)
        force_norm = jnp.linalg.norm(force, axis=-1)
        criteria = max_force / jnp.maximum(force_norm, 1e-12)

    second = gravity if g.mode == "level" else dir2target
    R_des = _force_basis(force, jnp.broadcast_to(second, force.shape))
    new_state = state.replace(pid=pid_state, **new_state_pix)
    return new_state, R_des, force_norm


def point_and_shoot_optimize(
    g: GuidanceParams,
    rig: CameraRig,
    cam_R: jnp.ndarray,
    pixel: jnp.ndarray,  # (..., 2) target pixel in the CURRENT frame
    position: jnp.ndarray,
    velocity: jnp.ndarray,
    mass: float,
    max_force: float,
    desired_row_fraction: float = 0.5,
    iterations: int = 12,
):
    """Working replacement for the reference's unfinished
    ``point_and_shoot_optimizer`` (components.py:389-429 — an aborted sketch
    whose loop never terminates).

    Intent per the reference's comments (:414-421): pick the force
    multiplier so that after the drone re-orients to apply the force, the
    target's REPROJECTED pixel sits at a desired screen row (throttle up ->
    target drops in frame, and vice versa). Solved here by bisection on the
    multiplier over [pid.min_output, max_force]: for each candidate, build
    the force basis exactly as point_and_shoot does, reproject the target
    direction through the new camera orientation, and compare rows.

    Returns (R_desired, |F|, final_pixel_row).
    """
    dtype = position.dtype
    dir2target = pixel_to_direction(rig, cam_R, pixel)
    gravity = _gravity(mass, dtype)
    vdrag = _virtual_drag(velocity, dir2target, g.virtual_drag_coef)
    _, H = rig.resolution
    K = jnp.asarray(rig.K, dtype)
    mount = jnp.asarray(rig.mount_rotation, dtype)
    target_row = desired_row_fraction * H

    def force_of(mult):
        return mult[..., None] * dir2target + vdrag - gravity

    def row_of(mult):
        from fpyv_tpu.ops.camera_ops import project_camera_points
        from fpyv_tpu.ops.rotations import mat3_mul, mat3_vec_T

        force = force_of(mult)
        second = gravity if g.mode == "level" else dir2target
        R_body = _force_basis(force, jnp.broadcast_to(second, force.shape))
        cam = mat3_mul(R_body, mount)  # camera_pose's rotation composition
        d_cam = mat3_vec_T(cam, dir2target)
        _, v, depth = project_camera_points(d_cam[..., None, :], K)
        # behind-camera candidates (low thrust can point the camera away from
        # the target): force them to a huge row so the monotone 'row decreases
        # with thrust' predicate keeps walking the bracket toward more thrust.
        row = jnp.where(depth[..., 0] > 1e-6, v[..., 0], 1e6)
        return row, R_body, force

    lo = jnp.full(position.shape[:-1], g.pid.min_output, dtype)
    hi = jnp.full(position.shape[:-1], max_force, dtype)
    for _ in range(iterations):  # static bisection, branch-free
        mid = 0.5 * (lo + hi)
        row, _, _ = row_of(mid)
        # more thrust toward the target pitches the camera toward it, so the
        # target's row DECREASES monotonically with the multiplier (measured).
        # Row too low in frame (row > desired) -> add thrust.
        add_thrust = row > target_row
        lo = jnp.where(add_thrust, mid, lo)
        hi = jnp.where(add_thrust, hi, mid)

    mult = 0.5 * (lo + hi)
    row, R_des, force = row_of(mult)
    fnorm = jnp.linalg.norm(force, axis=-1)
    fnorm = jnp.minimum(fnorm, max_force)
    return R_des, fnorm, row
