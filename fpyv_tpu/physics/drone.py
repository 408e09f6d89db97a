"""The fused drone physics step — one pure function, batch-agnostic.

This is the TPU rebuild of ``Drone.step`` (src/utils/components.py:220-248)
plus the kinematics kernels it calls (src/utils/kinematics.py). Everything
the reference does across ~10 method calls and Python object mutation
happens here as one fusable dataflow over arrays with arbitrary leading
batch dims; ``jit(scan(drone_step))`` compiles to a single device program.

Reference semantics replicated exactly (each a documented quirk):

1. Action mapping (components.py:179-196): ``action ∈ [-1,1]^4`` =
   [roll, pitch, yaw, throttle]; ``rates_cmd = clip(-a[:3] * max_rates)``
   (NEGATED); first-order low-pass on rates (rates_transition_rate) and on
   thrust (thrust_transition_rate); thrust from the bench-curve polynomial.
2. Guidance override (components.py:230-232): an override attitude/force
   replaces the applied rotation and thrust VECTOR but the low-passed
   throttle memory keeps tracking the action path.
3. Drag (kinematics.py:33-38): body-frame quadratic drag with ρ=1.2225.
4. Collisions at the 4 motor points (see fpyv_tpu.physics.collisions).
5. Integration (kinematics.py:15-24): semi-implicit Euler, POSITION FIRST
   (p += v·dt with the old v, then v += a·dt).
6. DOUBLE ROTATION QUIRK: attitude is advanced by the body rates once
   inside ``update_kinematic_step`` (kinematics.py:23) and once more in
   ``Drone.update`` (components.py:217-218) — net 2·rates·dt per step.
   Parameterized by ``DroneParams.double_rotation_quirk`` (default True).
7. Observation (components.py:247-248): ``(R_newᵀ, E(rates), R_new @ accel)``
   where E interprets the deg/s rates as RADIANS (reference bug, preserved).

Attitude modes: ``att_mode='rotmat'`` stores R (9 numbers, bit-parity with
the reference); ``att_mode='quat'`` stores a unit quaternion (4 numbers,
the BASELINE north-star layout) whose update composes the *same* per-axis
Euler rotation in quaternion space — trajectories match to float precision.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import struct

from fpyv_tpu.config import FpyvConfig
from fpyv_tpu.ops import rotations as rot
from fpyv_tpu.physics import collisions
from fpyv_tpu.physics.motor import ThrustCurve, default_thrust_curve, thrust_curve_from_csv
from fpyv_tpu.physics.world import World

AIR_DENSITY = 1.2225  # kg/m^3 at 20 C (kinematics.py:33-34)


def motor_layout(n_motors: int = 4, radius_in: float = 5.0) -> np.ndarray:
    """X-frame motor positions in the body frame (components.py:120-125):
    angles at 45°,135°,225°,315° on a circle of radius 5·2.54/100 m."""
    r = radius_in * 2.54 / 100.0
    t = np.linspace(0.0, 2.0 * np.pi, n_motors + 1)[:-1]
    t = t + (t[1] - t[0]) / 2.0
    return r * np.stack([np.cos(t), np.sin(t), np.zeros(n_motors)], axis=-1)


@dataclass(frozen=True)
class DroneParams:
    """Static physics constants (hashable → jit-cacheable closure constants).

    Built from :class:`fpyv_tpu.config.FpyvConfig` with the reference's unit
    conversions (components.py:96-100): grams→kg, cm→m.
    """

    dt: float = 1.0 / 60.0
    gravity: float = 9.81
    mass: float = 0.75  # kg
    max_rates: float = 200.0  # deg/s
    drag_coef: Tuple[float, float, float] = (1.8, 1.8, 1.2)
    cross_sections: Tuple[float, float, float] = (0.30 * 0.05, 0.26 * 0.05, 0.26 * 0.30)
    rates_transition_rate: float = 0.7
    thrust_transition_rate: float = 0.5
    n_motors: int = 4
    motor_radius: float = 0.1
    thrust_curve: ThrustCurve = field(default_factory=default_thrust_curve)
    att_mode: str = "rotmat"  # 'rotmat' | 'quat'
    double_rotation_quirk: bool = True

    @classmethod
    def from_config(cls, cfg: FpyvConfig, att_mode: str = "rotmat",
                    double_rotation_quirk: bool = True) -> "DroneParams":
        d = cfg.drone
        dims_m = tuple(x / 100.0 for x in d.dimensions)  # components.py:99
        cross = (dims_m[1] * dims_m[2], dims_m[0] * dims_m[2], dims_m[0] * dims_m[1])
        if d.motor_test_report_path:
            curve = thrust_curve_from_csv(
                d.motor_test_report_path, d.motor_test_report_idx,
                n_motors=4, gravity=cfg.simulator.gravity)
        else:
            curve = default_thrust_curve(
                d.motor_test_report_idx, n_motors=4, gravity=cfg.simulator.gravity)
        return cls(
            dt=cfg.simulator.dt,
            gravity=cfg.simulator.gravity,
            mass=d.mass / 1000.0,  # components.py:97
            max_rates=d.max_rates,
            drag_coef=tuple(d.drag_coefficients),
            cross_sections=cross,
            rates_transition_rate=d.rates_transition_rate,
            thrust_transition_rate=d.thrust_transition_rate,
            thrust_curve=curve,
            att_mode=att_mode,
            double_rotation_quirk=double_rotation_quirk,
        )

    @property
    def motors_relative_position(self) -> np.ndarray:
        return motor_layout(self.n_motors)


@struct.dataclass
class DroneState:
    """Per-drone dynamic state; every field takes leading batch dims."""

    pos: jnp.ndarray  # (..., 3) world position [m]
    vel: jnp.ndarray  # (..., 3) world velocity [m/s]
    att: jnp.ndarray  # (..., 3, 3) rotation matrix | (..., 4) quaternion (w,x,y,z)
    rates: jnp.ndarray  # (..., 3) low-passed body rates [deg/s] (prev_rates)
    thrust: jnp.ndarray  # (...,) low-passed thrust scalar [N] (prev_thrust)
    accel: jnp.ndarray  # (..., 3) world acceleration of the last step
    done: jnp.ndarray  # (...,) bool crash flag


@struct.dataclass
class DomainRand:
    """Per-env multiplicative randomization of the physics constants
    (BASELINE config #3: domain-randomized mass/drag/thrust). Fields are
    (...,)-shaped arrays broadcasting against the state batch; 1.0 = nominal."""

    mass_scale: jnp.ndarray
    drag_scale: jnp.ndarray
    thrust_scale: jnp.ndarray

    @classmethod
    def nominal(cls, batch_shape=(), dtype=jnp.float32) -> "DomainRand":
        o = jnp.ones(batch_shape, dtype)
        return cls(mass_scale=o, drag_scale=o, thrust_scale=o)

    @classmethod
    def sample(cls, key, batch_shape=(), mass_range=(0.8, 1.2),
               drag_range=(0.7, 1.3), thrust_range=(0.85, 1.15),
               dtype=jnp.float32) -> "DomainRand":
        import jax

        km, kd, kt = jax.random.split(key, 3)
        u = lambda k, r: jax.random.uniform(
            k, batch_shape, dtype, minval=r[0], maxval=r[1])
        return cls(mass_scale=u(km, mass_range), drag_scale=u(kd, drag_range),
                   thrust_scale=u(kt, thrust_range))


@struct.dataclass
class ImuObs:
    """The reference's step return tuple (components.py:247-248)."""

    world_from_body_T: jnp.ndarray  # (..., 3, 3) R_newᵀ
    gyro_matrix: jnp.ndarray  # (..., 3, 3) E(rates) — deg/s read as radians (quirk)
    accel_body: jnp.ndarray  # (..., 3) R_new @ accel


# ---------------------------------------------------------------------------
# Attitude-mode helpers
# ---------------------------------------------------------------------------


def _att_to_rotmat(params: DroneParams, att: jnp.ndarray) -> jnp.ndarray:
    return att if params.att_mode == "rotmat" else rot.quat_to_rotmat(att)


def _advance_attitude(params: DroneParams, att, rates_deg, dt):
    if params.att_mode == "rotmat":
        return rot.rotate_body_by_rates(att, rates_deg, dt)
    return rot.quat_rotate_by_rates(att, rates_deg, dt)


def attitude_from_euler(params: DroneParams, euler_rad: jnp.ndarray) -> jnp.ndarray:
    if params.att_mode == "rotmat":
        return rot.euler_to_rotmat(euler_rad)
    return rot.euler_to_quat(euler_rad)


# ---------------------------------------------------------------------------
# Physics kernels
# ---------------------------------------------------------------------------


def calculate_drag(params: DroneParams, R, velocity, wind):
    """Body-frame quadratic drag rotated back to world (kinematics.py:33-38):
    ``R @ (-½ Cd ρ A (Rᵀ (v+w)) |v+w|)``."""
    vsum = velocity + wind
    v_body = rot.mat3_vec_T(R, vsum)  # Rᵀ v
    coef = -0.5 * AIR_DENSITY * jnp.asarray(params.drag_coef, v_body.dtype) * jnp.asarray(
        params.cross_sections, v_body.dtype
    )
    f_body = coef * v_body * jnp.linalg.norm(vsum, axis=-1, keepdims=True)
    return rot.mat3_vec(R, f_body)


def gravity_vector(params: DroneParams, dtype=jnp.float32):
    """[0, 0, -m g] (kinematics.py:41-45)."""
    return jnp.asarray([0.0, 0.0, -params.gravity * params.mass], dtype)


def action_to_rates_thrust(params: DroneParams, state: DroneState, action):
    """components.py:179-196 (``action2force``) minus the thrust vectorization.

    Returns (rates deg/s, thrust scalar N) post low-pass.
    """
    rates_cmd = jnp.clip(
        -action[..., :3] * params.max_rates, -params.max_rates, params.max_rates
    )
    rates = (
        rates_cmd * params.rates_transition_rate
        + state.rates * (1.0 - params.rates_transition_rate)
    )
    # clip throttle to the stick domain before the cubic: the reference's
    # throttle is a calibrated stick read confined to [-1, 1]
    # (get_sticks.py:254-265), but RL policies emit unbounded Gaussian
    # samples — the unclipped cubic at |x| >> 1 produces astronomically
    # large thrust and the physics NaNs within steps (measured: the vision
    # racer's divergence at iteration ~2150 reproduced deterministically
    # from checkpoint until this clip).
    thrust = (
        params.thrust_curve.throttle_to_thrust(
            jnp.clip(action[..., 3], -1.0, 1.0))
        * params.thrust_transition_rate
        + state.thrust * (1.0 - params.thrust_transition_rate)
    )
    return rates, thrust


def drone_reset(
    params: DroneParams,
    position,
    velocity,
    ypr_deg,
) -> DroneState:
    """components.py:150-169: attitude from deg Euler angles, zeroed memories."""
    position = jnp.asarray(position)
    velocity = jnp.asarray(velocity, position.dtype)
    euler = jnp.deg2rad(jnp.asarray(ypr_deg, position.dtype))
    att = attitude_from_euler(params, euler)
    batch = position.shape[:-1]
    return DroneState(
        pos=position,
        vel=velocity,
        att=att,
        rates=jnp.zeros(batch + (3,), position.dtype),
        thrust=jnp.zeros(batch, position.dtype),
        accel=jnp.zeros(batch + (3,), position.dtype),
        done=jnp.zeros(batch, bool),
    )


def drone_step(
    params: DroneParams,
    state: DroneState,
    action: jnp.ndarray,  # (..., 4) [roll, pitch, yaw, throttle] in [-1, 1]
    world: World,
    wind: Optional[jnp.ndarray] = None,  # (..., 3) world-frame wind velocity
    att_override: Optional[jnp.ndarray] = None,  # (..., 3, 3) guidance attitude
    thrust_override: Optional[jnp.ndarray] = None,  # (...,) guidance |F|
    domain_rand: Optional[DomainRand] = None,  # per-env physics randomization
) -> Tuple[DroneState, ImuObs]:
    """One physics step. See module docstring for the replicated semantics."""
    dtype = state.pos.dtype
    action = jnp.asarray(action, dtype)  # don't let caller dtypes promote the state
    wind = jnp.zeros(3, dtype) if wind is None else jnp.asarray(wind, dtype)

    # 1. action -> low-passed rates & thrust scalar (memory updates regardless
    #    of override; components.py:229 runs action2force unconditionally).
    rates, thrust_scalar = action_to_rates_thrust(params, state, action)
    if domain_rand is not None:
        thrust_scalar = thrust_scalar * domain_rand.thrust_scale

    # 2. optional guidance override of attitude and applied |F| (components.py:230-232)
    att = state.att
    if att_override is not None:
        att = (
            att_override
            if params.att_mode == "rotmat"
            else rot.rotmat_to_quat(att_override)
        )
    R = _att_to_rotmat(params, att)
    applied_thrust = thrust_scalar if thrust_override is None else thrust_override
    thrust_vec = R[..., :, 2] * applied_thrust[..., None]  # kinematics.py:48-49

    # 3-4. drag + gravity
    drag = calculate_drag(params, R, state.vel, wind)
    gravity = gravity_vector(params, dtype)
    mass = jnp.asarray(params.mass, dtype)
    if domain_rand is not None:
        drag = drag * domain_rand.drag_scale[..., None]
        mass = mass * domain_rand.mass_scale
        gravity = gravity * domain_rand.mass_scale[..., None]

    # 5. motor points: position + motors_rel @ Rᵀ (components.py:235)
    motors_rel = jnp.asarray(params.motors_relative_position, dtype)
    motor_world = jnp.einsum("...ij,mj->...mi", R, motors_rel, precision="highest")
    motor_points = state.pos[..., None, :] + motor_world

    # 6-7. collisions + crash flags
    contact_force, crashed = collisions.collide(
        world, motor_points, state.vel, motor_radius=params.motor_radius
    )
    done = state.done | crashed

    # 8. total force -> acceleration (components.py:242-243)
    total_force = thrust_vec + gravity + drag + contact_force
    accel = total_force / (
        mass[..., None] if domain_rand is not None else params.mass
    )

    # 9. integrate: position first (old velocity), then velocity; attitude
    #    advanced once in the kinematic step + once more (the 2x quirk).
    pos = state.pos + state.vel * params.dt
    vel = state.vel + accel * params.dt
    att_new = _advance_attitude(params, att, rates, params.dt)
    if params.double_rotation_quirk:
        att_new = _advance_attitude(params, att_new, rates, params.dt)

    new_state = DroneState(
        pos=pos, vel=vel, att=att_new, rates=rates, thrust=thrust_scalar,
        accel=accel, done=done,
    )

    # 10. IMU-style observation from the NEW attitude (components.py:247-248)
    R_new = _att_to_rotmat(params, att_new)
    obs = ImuObs(
        world_from_body_T=jnp.swapaxes(R_new, -1, -2),
        gyro_matrix=rot.euler_to_rotmat(rates),  # deg/s-as-radians quirk
        accel_body=rot.mat3_vec(R_new, accel),
    )
    return new_state, obs


def gravity_in_body_frame(params: DroneParams, state: DroneState):
    """R @ [0,0,-mg] with g=9.81 hardcoded — components.py:255-256 parity
    (the reference pins g=9.81 here even if params.gravity differs)."""
    R = _att_to_rotmat(params, state.att)
    g = jnp.asarray([0.0, 0.0, -9.81 * params.mass], state.pos.dtype)
    return rot.mat3_vec(R, g)
