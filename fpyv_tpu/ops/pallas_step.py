"""Pallas TPU megastep: the whole drone physics step as ONE fused kernel.

The XLA path (fpyv_tpu.physics.drone.drone_step) compiles to a handful of
fused VPU kernels per scan iteration; at 4096 envs the math itself is
trivial (~100 flops/env) so per-kernel dispatch dominates (~37 us/iter
measured). This kernel lays the state out as a (rows, N) matrix — env index
on the 128-wide lane dimension, state components on sublanes — and computes
the entire step (action low-pass, thrust polynomial, quaternion attitude,
drag, gravity, motor-point collisions vs spheres+ground, semi-implicit
Euler, the double-rotation quirk) as pure VPU element-wise work in VMEM.

Two entry points:
- :func:`pallas_drone_step` — one step; drop-in accelerator for scan loops.
- :func:`pallas_rollout` — K steps inside the kernel (fori_loop), state
  VMEM-resident across iterations: zero dispatch overhead. Used by bench
  for the speed-of-light number with a constant action.

Supported configuration (asserted): quat attitude mode, no att/thrust
override, world = S spheres + C cylinders + ground (the reference's default
params.yaml world shape; gates are collision-free by reference semantics,
components.py:203). Domain randomization and wind enter ``_step_math`` as
optional per-env row inputs — statically gated so sphere-only nominal
worlds compile to exactly the old fast path. Parity with drone_step is
covered by tests/test_pallas_step.py in interpret mode (CPU) and on TPU by
the bench cross-check.

State matrix rows (dtype f32):
  0:3  position        3:6  velocity      6:10 quaternion (w,x,y,z)
  10:13 rates (deg/s)  13   thrust (N)    14   done (0/1)
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fpyv_tpu.physics.drone import AIR_DENSITY, DroneParams, DroneState, motor_layout
from fpyv_tpu.physics.world import World

STATE_ROWS = 15
SUBLANES = 8  # each state component packs to an (8, N/8) tile: full VPU
              # sublane utilization (a (1, N) row would use 1/8 of the VPU)
_DEG2RAD = np.pi / 180.0


def _pack(v: jnp.ndarray) -> jnp.ndarray:
    """(N,) -> (8, N/8) row-major tile."""
    return v.astype(jnp.float32).reshape(SUBLANES, -1)


def _unpack(tile: jnp.ndarray) -> jnp.ndarray:
    return tile.reshape(-1)


def state_to_matrix(state: DroneState) -> jnp.ndarray:
    """DroneState (batched, quat mode) -> (15*8, N/8) f32 matrix; component
    i occupies the (8, N/8) tile at rows [8i, 8i+8)."""
    comps = [state.pos[:, 0], state.pos[:, 1], state.pos[:, 2],
             state.vel[:, 0], state.vel[:, 1], state.vel[:, 2],
             state.att[:, 0], state.att[:, 1], state.att[:, 2], state.att[:, 3],
             state.rates[:, 0], state.rates[:, 1], state.rates[:, 2],
             state.thrust, state.done.astype(jnp.float32)]
    return jnp.concatenate([_pack(c) for c in comps], axis=0)


def matrix_to_state(mat: jnp.ndarray, template: DroneState) -> DroneState:
    def comp(i):
        return _unpack(mat[SUBLANES * i:SUBLANES * (i + 1)])

    stack = lambda idxs: jnp.stack([comp(i) for i in idxs], axis=-1)
    return DroneState(
        pos=stack([0, 1, 2]),
        vel=stack([3, 4, 5]),
        att=stack([6, 7, 8, 9]),
        rates=stack([10, 11, 12]),
        thrust=comp(13),
        accel=template.accel,  # not tracked by the kernel (obs-only field)
        done=comp(14) > 0.5,
    )


def _step_math(params: DroneParams, sphere_c, sphere_r, sphere_active,
               state, action, cyl=None, dr=None, wind=None, override=None):
    """One physics step over row-vectors of shape (N,). Pure jnp — runs
    identically inside the pallas kernel and in interpret mode.

    Optional generality (all default-off so the sphere-only fast path is
    unchanged):
    - ``cyl``: (6, C_pad) cylinder rows [center xyz, radius, height, active]
      — motor-point collisions vs vertical cylinders with BOTH reference
      quirks (physics/world.py cylinder_sdf: sqrt distance outside the band,
      relative-z band for the normal; components.py:710-729).
    - ``dr``: (mass_scale, drag_scale, thrust_scale) (8, N/8) tiles — the
      per-env DomainRand multipliers exactly as drone_step applies them.
    - ``wind``: (wx, wy, wz) (8, N/8) tiles — world-frame wind velocity
      entering the drag term (kinematics.py:33-38's velocity+wind).
    - ``override``: guidance attitude/thrust override (components.py:230-232
      via drone_step's att/thrust_override path): a (qw, qx, qy, qz, |F|)
      tuple of (8, N/8) tiles.  The attitude quat is REPLACED before any
      use (forces, motors, and the rates advance all see the override,
      exactly as drone_step's quat mode does), |F| is the applied thrust,
      and the low-passed rates/thrust memories still update from ``action``
      (components.py:229 runs action2force unconditionally).
    """

    def c(i):  # component i's (8, N/8) tile
        return state[SUBLANES * i:SUBLANES * (i + 1)]

    def ac(i):
        return action[SUBLANES * i:SUBLANES * (i + 1)]

    spheres = [(sphere_c[0, s], sphere_c[1, s], sphere_c[2, s],
                sphere_r[s], sphere_active[s])
               for s in range(sphere_c.shape[1])]
    cyls = None if cyl is None else [
        (cyl[0, ci], cyl[1, ci], cyl[2, ci], cyl[3, ci], cyl[4, ci],
         cyl[5, ci]) for ci in range(cyl.shape[1])]
    out = _step_components(
        params, spheres, [c(i) for i in range(STATE_ROWS)],
        [ac(i) for i in range(4)], cyls=cyls, dr=dr, wind=wind,
        override=override)
    return jnp.concatenate(out, axis=0)


def _step_components(params: DroneParams, spheres, comps, acts, cyls=None,
                     dr=None, wind=None, override=None,
                     with_accel_z=False):
    """Layout-agnostic physics-step core: ``comps`` is the 15-component
    state (pos3, vel3, quat4, rates3, thrust, done) as same-shaped arrays
    of ANY layout — (8, N/8) row tiles (:func:`_step_math`) or (E, 1)
    env-major columns (ops/pallas_policy's in-kernel trainer).  ``spheres``
    is a list of (cx, cy, cz, r, active) and ``cyls`` of (cx, cy, cz, r, h,
    active); entries may be scalars (shared world) or arrays broadcasting
    against the components (per-env worlds).  Returns the 15 next-state
    components (+ the world-z acceleration when ``with_accel_z``, the
    IMU-style obs field the vision trainer feeds the policy)."""
    dt = params.dt
    px, py, pz, vx, vy, vz, qw, qx, qy, qz, r0, r1, r2, thrust_prev, done = \
        comps

    # --- action2force (components.py:179-196)
    mr = params.max_rates

    ac = lambda i: acts[i]

    rc0 = jnp.clip(-ac(0) * mr, -mr, mr)
    rc1 = jnp.clip(-ac(1) * mr, -mr, mr)
    rc2 = jnp.clip(-ac(2) * mr, -mr, mr)
    a = params.rates_transition_rate
    n0 = rc0 * a + r0 * (1 - a)
    n1 = rc1 * a + r1 * (1 - a)
    n2 = rc2 * a + r2 * (1 - a)
    # thrust polynomial (Horner, throttle% = 100(x+1)/2); throttle clipped
    # to the stick domain first, matching drone_step (the unclipped cubic
    # explodes on out-of-range RL actions — physics/drone.py note)
    c3, c2_, c1, c0 = [jnp.float32(c) for c in params.thrust_curve.throttle2thrust_coeffs]
    xpct = 100.0 * (jnp.clip(ac(3), -1.0, 1.0) + 1.0) * 0.5
    poly = ((c3 * xpct + c2_) * xpct + c1) * xpct + c0
    b = params.thrust_transition_rate
    thrust = poly * b + thrust_prev * (1 - b)
    if dr is not None:
        # drone_step scales BEFORE storing the low-pass memory, so the
        # scaled value both applies now and feeds the next step's low-pass
        thrust = thrust * dr[2]

    # --- guidance override: replace the quat + applied |F| (drone_step's
    #     att_override/thrust_override path; memories above still updated)
    if override is not None:
        qw, qx, qy, qz, applied_thrust = override
    else:
        applied_thrust = thrust

    # --- rotation matrix columns from quaternion
    R00 = 1 - 2 * (qy * qy + qz * qz)
    R01 = 2 * (qx * qy - qz * qw)
    R02 = 2 * (qx * qz + qy * qw)
    R10 = 2 * (qx * qy + qz * qw)
    R11 = 1 - 2 * (qx * qx + qz * qz)
    R12 = 2 * (qy * qz - qx * qw)
    R20 = 2 * (qx * qz - qy * qw)
    R21 = 2 * (qy * qz + qx * qw)
    R22 = 1 - 2 * (qx * qx + qy * qy)

    tx, ty, tz = R02 * applied_thrust, R12 * applied_thrust, R22 * applied_thrust

    # --- drag (kinematics.py:33-38) on velocity + wind
    if wind is None:
        wx_, wy_, wz_ = vx, vy, vz
    else:
        wx_, wy_, wz_ = vx + wind[0], vy + wind[1], vz + wind[2]
    vnorm = jnp.sqrt(wx_ * wx_ + wy_ * wy_ + wz_ * wz_)
    bx = R00 * wx_ + R10 * wy_ + R20 * wz_  # Rᵀ (v + w)
    by = R01 * wx_ + R11 * wy_ + R21 * wz_
    bz = R02 * wx_ + R12 * wy_ + R22 * wz_
    cdx, cdy, cdz = params.drag_coef
    ax_, ay_, az_ = params.cross_sections
    k = -0.5 * AIR_DENSITY
    fbx = k * cdx * ax_ * bx * vnorm
    fby = k * cdy * ay_ * by * vnorm
    fbz = k * cdz * az_ * bz * vnorm
    dx = R00 * fbx + R01 * fby + R02 * fbz
    dy = R10 * fbx + R11 * fby + R12 * fbz
    dz = R20 * fbx + R21 * fby + R22 * fbz
    if dr is not None:
        dx, dy, dz = dx * dr[1], dy * dr[1], dz * dr[1]

    gz = -params.gravity * params.mass
    if dr is not None:
        gz = gz * dr[0]  # gravity scales with the randomized mass

    # --- motor points + collisions (spheres + ground)
    # python-float motor coords: np.float64 scalars would promote f32 math
    motors = [(float(m[0]), float(m[1])) for m in motor_layout(params.n_motors)]
    spring_k = 100.0
    rm = params.motor_radius
    cfx = jnp.zeros_like(px)
    cfy = jnp.zeros_like(px)
    cfz = jnp.zeros_like(px)
    crashed = jnp.zeros_like(px)
    for m in motors:  # 4 static iterations
        mx = px + R00 * m[0] + R01 * m[1]  # m[2] = 0 on the X frame
        my = py + R10 * m[0] + R11 * m[1]
        mz = pz + R20 * m[0] + R21 * m[1]
        # ground (distance = z)
        pen = mz - rm
        hit = (pen < 0).astype(px.dtype)
        cfz = cfz + hit * (-spring_k * pen)
        crashed = jnp.maximum(crashed, (mz < 0).astype(px.dtype))
        # spheres
        for (sx, sy, sz, sr_, act_s) in spheres:
            ddx, ddy, ddz = mx - sx, my - sy, mz - sz
            dist = jnp.sqrt(ddx * ddx + ddy * ddy + ddz * ddz)
            sd = dist - sr_
            inv = 1.0 / jnp.maximum(dist, 1e-12)
            pen_s = sd - rm
            hit_s = ((pen_s < 0).astype(px.dtype)) * act_s
            mag = -spring_k * pen_s
            cfx = cfx + hit_s * mag * ddx * inv
            cfy = cfy + hit_s * mag * ddy * inv
            cfz = cfz + hit_s * mag * ddz * inv
            crashed = jnp.maximum(crashed, ((sd < 0).astype(px.dtype)) * act_s)
        # cylinders (physics/world.py cylinder_sdf parity incl. both quirks)
        for (cx_, cy2, cz_, cr_, ch_, act_c) in (cyls or ()):
            ddx, ddy = mx - cx_, my - cy2
            r2d = jnp.sqrt(ddx * ddx + ddy * ddy)
            d2d = r2d - cr_
            z0, z1 = cz_, cz_ + ch_
            in_band = ((z0 < mz) & (mz < z1)).astype(px.dtype)
            dh = jnp.minimum(jnp.abs(mz - z0), jnp.abs(mz - z1))
            d = in_band * d2d + (1 - in_band) * jnp.sqrt(d2d * d2d + dh * dh)
            # normal: RELATIVE z vs the ABSOLUTE band (components.py:719-720)
            # (careful: qw..qz name the quaternion in this scope)
            relz = mz - cz_
            band_n = ((z0 < relz) & (relz < z1)).astype(px.dtype)
            inv2d = 1.0 / jnp.maximum(r2d, 1e-12)
            cap_sign = jnp.where(jnp.abs(relz - z0) < jnp.abs(relz - z1),
                                 -1.0, 1.0)
            nx_ = band_n * ddx * inv2d
            ny_ = band_n * ddy * inv2d
            nz_ = (1 - band_n) * cap_sign
            pen_c = d - rm
            hit_c = ((pen_c < 0).astype(px.dtype)) * act_c
            mag = -spring_k * pen_c
            cfx = cfx + hit_c * mag * nx_
            cfy = cfy + hit_c * mag * ny_
            cfz = cfz + hit_c * mag * nz_
            crashed = jnp.maximum(crashed, ((d < 0).astype(px.dtype)) * act_c)

    inv_m = (1.0 / params.mass if dr is None
             else 1.0 / (params.mass * dr[0]))
    acx = (tx + dx + cfx) * inv_m
    acy = (ty + dy + cfy) * inv_m
    acz = (tz + dz + gz + cfz) * inv_m

    # --- integrate: position first (kinematics.py:21-22)
    px, py, pz = px + vx * dt, py + vy * dt, pz + vz * dt
    vx, vy, vz = vx + acx * dt, vy + acy * dt, vz + acz * dt

    # --- attitude: q <- q ⊗ conj(qE), applied twice (the 2x quirk)
    half = 0.5 * _DEG2RAD * dt
    h0, h1, h2 = n0 * half, n1 * half, n2 * half
    cr, sr = jnp.cos(h0), jnp.sin(h0)
    cp, sp = jnp.cos(h1), jnp.sin(h1)
    cy, sy = jnp.cos(h2), jnp.sin(h2)
    ew = cy * cp * cr + sy * sp * sr
    ex = cy * cp * sr - sy * sp * cr
    ey = cy * sp * cr + sy * cp * sr
    ez = sy * cp * cr - cy * sp * sr
    reps = 2 if params.double_rotation_quirk else 1
    for _ in range(reps):
        # q ⊗ conj(qE): conj flips (ex, ey, ez)
        nw = qw * ew + qx * ex + qy * ey + qz * ez
        nx = -qw * ex + qx * ew - qy * ez + qz * ey
        ny = -qw * ey + qx * ez + qy * ew - qz * ex
        nz = -qw * ez - qx * ey + qy * ex + qz * ew
        qw, qx, qy, qz = nw, nx, ny, nz
    qn = 1.0 / jnp.sqrt(qw * qw + qx * qx + qy * qy + qz * qz)
    qw, qx, qy, qz = qw * qn, qx * qn, qy * qn, qz * qn

    done = jnp.maximum(done, crashed)
    out = [px, py, pz, vx, vy, vz, qw, qx, qy, qz, n0, n1, n2, thrust, done]
    if with_accel_z:
        out.append(acz)
    return out


def _kernel_single(params, use_cyl, state_ref, action_ref, sphere_ref,
                   *rest):
    cyl_ref, out_ref = (rest if use_cyl else (None,) + rest)
    sphere_c = sphere_ref[0:3, :]
    sphere_r = sphere_ref[3, :]
    sphere_active = sphere_ref[4, :]
    out_ref[:, :] = _step_math(
        params, sphere_c, sphere_r, sphere_active,
        state_ref[:, :], action_ref[:, :],
        cyl=cyl_ref[:, :] if use_cyl else None,
    )


def _kernel_rollout(params, use_cyl, n_steps, state_ref, action_ref,
                    sphere_ref, *rest):
    cyl_ref, out_ref = (rest if use_cyl else (None,) + rest)
    sphere_c = sphere_ref[0:3, :]
    sphere_r = sphere_ref[3, :]
    sphere_active = sphere_ref[4, :]
    action = action_ref[:, :]
    cyl = cyl_ref[:, :] if use_cyl else None

    def body(_, st):
        return _step_math(params, sphere_c, sphere_r, sphere_active, st,
                          action, cyl=cyl)

    out_ref[:, :] = jax.lax.fori_loop(0, n_steps, body, state_ref[:, :])


def _world_matrix(world: World, n_pad: int = 8) -> Tuple[jnp.ndarray, int]:
    """(5, S_pad) rows: center xyz, radius, active."""
    S = world.num_spheres
    S_pad = max(n_pad, S)
    mat = jnp.zeros((5, S_pad), jnp.float32)
    mat = mat.at[0:3, :S].set(world.sphere_center.T.astype(jnp.float32))
    mat = mat.at[3, :S].set(world.sphere_radius.astype(jnp.float32))
    mat = mat.at[4, :S].set(world.sphere_active.astype(jnp.float32))
    return mat, S_pad


def cylinder_matrix(world: World, n_pad: int = 8) -> jnp.ndarray:
    """(6, C_pad) rows: center xyz, radius, height, active."""
    C = world.num_cylinders
    C_pad = max(n_pad, C)
    mat = jnp.zeros((6, C_pad), jnp.float32)
    mat = mat.at[0:3, :C].set(world.cyl_center.T.astype(jnp.float32))
    mat = mat.at[3, :C].set(world.cyl_radius.astype(jnp.float32))
    mat = mat.at[4, :C].set(world.cyl_height.astype(jnp.float32))
    mat = mat.at[5, :C].set(world.cyl_active.astype(jnp.float32))
    return mat


def world_has_cylinders(world: World) -> bool:
    """Host-side static gate: sphere-only worlds skip the cylinder loop
    entirely (the generality must not tax the fast path)."""
    return bool(np.asarray(world.cyl_active).any())


def _supported(params: DroneParams, world: World) -> bool:
    return (
        params.att_mode == "quat"
        and bool(np.asarray(world.has_ground))
    )


_VMEM = pl.BlockSpec(memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnums=(0, 4), static_argnames=("interpret",))
def _call_single(params, state_mat, action_mat, sphere_mat, interpret,
                 cyl_mat=None):
    n = state_mat.shape[1]
    use_cyl = cyl_mat is not None
    kernel = functools.partial(_kernel_single, params, use_cyl)
    args = (state_mat, action_mat, sphere_mat) + (
        (cyl_mat,) if use_cyl else ())
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((STATE_ROWS * SUBLANES, n), jnp.float32),
        in_specs=[_VMEM] * len(args),
        out_specs=_VMEM,
        interpret=interpret,
    )(*args)


@functools.partial(jax.jit, static_argnums=(0, 4, 5), static_argnames=("interpret",))
def _call_rollout(params, state_mat, action_mat, sphere_mat, n_steps,
                  interpret, cyl_mat=None):
    n = state_mat.shape[1]
    use_cyl = cyl_mat is not None
    kernel = functools.partial(_kernel_rollout, params, use_cyl, n_steps)
    args = (state_mat, action_mat, sphere_mat) + (
        (cyl_mat,) if use_cyl else ())
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((STATE_ROWS * SUBLANES, n), jnp.float32),
        in_specs=[_VMEM] * len(args),
        out_specs=_VMEM,
        interpret=interpret,
    )(*args)


def pallas_drone_step(params: DroneParams, state: DroneState,
                      action: jnp.ndarray, world: World,
                      interpret: bool = False) -> DroneState:
    """One fused physics step. `action` (N, 4). See module doc for limits."""
    assert _supported(params, world), "unsupported config for the pallas path"
    assert state.pos.shape[0] % SUBLANES == 0, "N must be a multiple of 8"
    state_mat = state_to_matrix(state)
    sphere_mat, _ = _world_matrix(world)
    cyl_mat = cylinder_matrix(world) if world_has_cylinders(world) else None
    action_mat = jnp.concatenate([_pack(action[:, i]) for i in range(4)], axis=0)
    out = _call_single(params, state_mat, action_mat, sphere_mat, interpret,
                       cyl_mat=cyl_mat)
    return matrix_to_state(out, state)


def pallas_rollout(params: DroneParams, state: DroneState,
                   action: jnp.ndarray, world: World, n_steps: int,
                   interpret: bool = False) -> DroneState:
    """K fused steps with VMEM-resident state (constant action)."""
    assert _supported(params, world), "unsupported config for the pallas path"
    assert state.pos.shape[0] % SUBLANES == 0, "N must be a multiple of 8"
    state_mat = state_to_matrix(state)
    sphere_mat, _ = _world_matrix(world)
    cyl_mat = cylinder_matrix(world) if world_has_cylinders(world) else None
    action_mat = jnp.concatenate([_pack(action[:, i]) for i in range(4)], axis=0)
    out = _call_rollout(params, state_mat, action_mat, sphere_mat, n_steps,
                        interpret, cyl_mat=cyl_mat)
    return matrix_to_state(out, state)
