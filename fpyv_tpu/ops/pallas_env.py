"""Pallas TPU full-env megaloop: physics + target motion + reward +
auto-reset, K steps per kernel launch with VMEM-resident state.

The XLA acro env (fpyv_tpu.envs.acro.AcroEnv.step inside a scan) measures
~54 us/iter at 4096 envs — ~26 us of which is env overhead (auto-reset
resampling, reward, obs assembly) on top of the ~29 us fused physics
(BENCH.md).  This kernel folds the *entire* env semantics of
``AcroEnv.step`` + ``update_targets`` into the physics megastep
(fpyv_tpu.ops.pallas_step._step_math) so one kernel launch advances the env
bank K steps with zero per-step dispatch:

- moving targets: CircularPath positions recomputed per iteration from the
  step counter (physics/world.py:update_targets; components.py:743-751)
- reward: progress + alive - crash - rates penalty (AcroEnv.step)
- episode bookkeeping: t, prev_dist, episode_return rows
- auto-reset on (crash | truncation): position/attitude uniform, velocity
  normal (Box-Muller), matching AcroEnv._sample_drone's distributions

RNG: a counter-based murmur3-finalizer hash over (env lane, step, draw,
seed) implemented in plain uint32 jnp ops — identical results compiled and
in interpret mode (pltpu.prng_seed has no interpret lowering in this jax),
deterministic for fixed seed, independent per env.  This is a different
stream than the XLA path's per-env threefry keys, so trajectories match the
XLA env exactly *until the first reset event* (tests exploit this) and
statistically thereafter.

Supported (asserted): quat attitude, ground on, float32.  Cylinder worlds
(the reference's default params.yaml obstacles, config/params.yaml:6-35)
collide in-kernel via the same SDF quirks as the XLA path; gate tracks are
accepted unchanged (gates never collide and don't enter the acro reward —
components.py:203); per-env domain randomization (mass/drag/thrust) applies
the DomainRand multipliers exactly as drone_step does and RESAMPLES them on
auto-reset from the env's configured uniform ranges; per-env wind (constant
base + N(0, wind_scale) gusts per episode) enters the drag term in-kernel.
The XLA path remains the general/reference one (rotmat mode, guidance
overrides).

State matrix layout: pallas_step rows 0..14 (pos, vel, quat, rates, thrust,
done) + env rows 15: t, 16: prev_dist, 17: episode_return, 18: mass_scale,
19: drag_scale, 20: thrust_scale, 21:24: wind xyz.  Each row is an
(8, N/8) tile (full VPU sublane utilization, see pallas_step module doc).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fpyv_tpu.envs.acro import AcroEnv, AcroState
from fpyv_tpu.ops.pallas_step import (
    STATE_ROWS,
    SUBLANES,
    _pack,
    _step_math,
    cylinder_matrix,
    matrix_to_state,
    state_to_matrix,
    world_has_cylinders,
)
from fpyv_tpu.physics.drone import DomainRand
from fpyv_tpu.physics.world import World

ENV_EXTRA_ROWS = 9  # t, prev_dist, episode_return, mass/drag/thrust scales,
#                     wind xyz
ENV_ROWS = STATE_ROWS + ENV_EXTRA_ROWS

_TWO_PI = 2.0 * np.pi
_DEG2RAD = np.pi / 180.0

# World matrix rows (f32, shape (12, S_pad)):
#   0:3 center xyz   3 radius      4 active
#   5:8 path_center  8 path_radius 9 path_res  10 has_path  11 path_count
_WORLD_ROWS = 12


# ---------------------------------------------------------------------------
# Counter-based PRNG (murmur3 finalizer) — portable jnp uint32 ops
# ---------------------------------------------------------------------------


def _murmur3_fmix(x: jnp.ndarray) -> jnp.ndarray:
    x = x ^ (x >> jnp.uint32(16))
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> jnp.uint32(13))
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> jnp.uint32(16))
    return x


def _uniform_01(lane_id: jnp.ndarray, ctr: jnp.ndarray) -> jnp.ndarray:
    """U[0, 1) with 24-bit mantissa from (per-env lane id, scalar counter)."""
    bits = _murmur3_fmix(lane_id ^ (ctr * jnp.uint32(0x9E3779B9)))
    # mosaic has no uint32->f32 cast; the >>8 value fits in 24 bits, so the
    # int32 reinterpretation is value-preserving
    top24 = (bits >> jnp.uint32(8)).astype(jnp.int32)
    return top24.astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


def _normal_pair(lane_id, ctr_a, ctr_b):
    """Box-Muller: two standard normals from two uniform draws."""
    u1 = jnp.maximum(_uniform_01(lane_id, ctr_a), jnp.float32(1e-12))
    u2 = _uniform_01(lane_id, ctr_b)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    a = jnp.float32(_TWO_PI) * u2
    return r * jnp.cos(a), r * jnp.sin(a)


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _env_cfg_scalars(env: AcroEnv):
    """The AcroEnv reward/reset scalars the kernel closes over (static)."""
    return (
        tuple(float(x) for x in env.pos_low),
        tuple(float(x) for x in env.pos_high),
        float(env.vel_scale),
        float(env.ypr_range_deg),
        int(env.max_episode_steps),
        float(env.w_progress),
        float(env.w_alive),
        float(env.w_crash),
        float(env.w_rates),
        bool(env.randomize),
        tuple(float(x) for x in env.mass_range),
        tuple(float(x) for x in env.drag_range),
        tuple(float(x) for x in env.thrust_range),
        tuple(float(x) for x in env.wind),
        float(env.wind_scale),
    )


def _env_loop_math(params, cfg, n_steps, seed, state0, action, world_mat,
                   cyl_mat=None, action_fn=None, extra_metrics=False,
                   n_pilot_rows=0, lane_col0=None, n_lane_total=None):
    """The full K-step env loop over (ENV_ROWS*8, N/8) state. Pure jnp.

    ``action`` is a fixed (4*8, N/8) action matrix applied every step; pass
    ``action_fn(i, st, sph_c=..., sphere_r=...) -> (act, override, pilot)``
    instead to compute per-iteration actions from the live state (the
    in-kernel FPV guidance pilot in ops/pallas_vision): ``act`` is the
    (4*8, N/8) action matrix, ``override`` is None or the (qw,qx,qy,qz,|F|)
    attitude/thrust override for _step_math, and ``pilot`` is None or the
    updated (n_pilot_rows*8, N/8) pilot-memory rows (PID state etc.) that
    ride after the ENV_ROWS block in the state matrix — zeroed whenever the
    env resets (the fresh-PID analog of components.py:35-41's reset).

    With ``extra_metrics=True`` the carry also accumulates per-env crash
    and target-contact counts (contact = crash within the chased sphere's
    collision shell) and the return is (state, rsum, crashes, contacts).
    """
    (pos_low, pos_high, vel_scale, ypr_range, max_steps,
     w_progress, w_alive, w_crash, w_rates,
     randomize, mass_range, drag_range, thrust_range,
     wind_base, wind_scale) = cfg
    use_wind = any(w != 0.0 for w in wind_base) or wind_scale > 0.0

    n_lane = state0.shape[1]
    # per-env lane id: distinct uint32 per (sublane, lane) element.  When
    # the caller runs this loop per GRID BLOCK of the full env bank (the
    # chase kernel: one program per 8-env column), n_lane_total is the full
    # bank's lane count and lane_col0 the block's first global lane, so the
    # streams stay globally unique and layout-independent.
    total = n_lane if n_lane_total is None else n_lane_total
    col = jax.lax.broadcasted_iota(jnp.uint32, (SUBLANES, n_lane), 1)
    if lane_col0 is not None:
        col = col + lane_col0.astype(jnp.uint32)
    lane_id = (
        jax.lax.broadcasted_iota(jnp.uint32, (SUBLANES, n_lane), 0)
        * jnp.uint32(total) + col
    )
    lane_id = _murmur3_fmix(lane_id ^ _murmur3_fmix(seed.astype(jnp.uint32)))

    sphere_r = world_mat[3, :]
    sphere_active = world_mat[4, :]

    def sphere_centers(i):
        """(3, S) centers for iteration i: the bench loop calls
        update_targets before step, which places the target from the
        pre-increment count (world.py:178-199), so iteration i sees
        count0 + i.  f32 counts are exact below 2^24 steps."""
        cnt = world_mat[11:12, :] + i.astype(jnp.float32)
        res = jnp.maximum(world_mat[9:10, :], 1.0)
        frac = cnt - jnp.floor(cnt / res) * res
        theta = jnp.float32(_TWO_PI) * frac / res
        has = world_mat[10:11, :] > 0.5
        cx = jnp.where(has, world_mat[5:6, :] + world_mat[8:9, :] * jnp.cos(theta),
                       world_mat[0:1, :])
        cy = jnp.where(has, world_mat[6:7, :] + world_mat[8:9, :] * jnp.sin(theta),
                       world_mat[1:2, :])
        cz = jnp.where(has, world_mat[7:8, :], world_mat[2:3, :])
        return jnp.concatenate([cx, cy, cz], axis=0)

    def row(mat, i):
        return mat[SUBLANES * i:SUBLANES * (i + 1)]

    def body(i, carry):
        st, rsum = carry[0], carry[1]
        sph_c = sphere_centers(i)
        if action_fn is None:
            act, override, pilot = action, None, None
        else:
            act, override, pilot = action_fn(i, st, sph_c=sph_c,
                                             sphere_r=world_mat[3:4, :])
        # DomainRand/wind rows feed the physics only when the env uses them —
        # the nominal path stays free of the extra multiplies
        dr = ((row(st, 18), row(st, 19), row(st, 20)) if randomize else None)
        wnd = ((row(st, 21), row(st, 22), row(st, 23)) if use_wind else None)
        phys = _step_math(params, sph_c, sphere_r, sphere_active,
                          st[: STATE_ROWS * SUBLANES], act,
                          cyl=cyl_mat, dr=dr, wind=wnd, override=override)

        px, py, pz = row(phys, 0), row(phys, 1), row(phys, 2)
        crashed = row(phys, 14)
        tx, ty, tz = sph_c[0, 0], sph_c[1, 0], sph_c[2, 0]  # chased target
        ddx, ddy, ddz = px - tx, py - ty, pz - tz
        dist = jnp.sqrt(ddx * ddx + ddy * ddy + ddz * ddz)

        prev_dist = row(st, 16)
        a0, a1, a2 = (act[:SUBLANES], act[SUBLANES:2 * SUBLANES],
                      act[2 * SUBLANES:3 * SUBLANES])
        rates_pen = a0 * a0 + a1 * a1 + a2 * a2
        reward = (w_progress * (prev_dist - dist) + w_alive
                  - w_crash * crashed - w_rates * rates_pen)

        t = row(st, 15) + 1.0
        truncated = (t >= jnp.float32(max_steps)).astype(jnp.float32)
        done = jnp.maximum(crashed, truncated)

        # ---- reset draws (AcroEnv._sample_drone distributions) -------------
        # stride 32 counters per iteration: up to 32 distinct draws per reset
        base = (i.astype(jnp.uint32) + jnp.uint32(1)) * jnp.uint32(32)

        def u(d):
            return _uniform_01(lane_id, base + jnp.uint32(d))

        rpx = jnp.float32(pos_low[0]) + u(0) * jnp.float32(pos_high[0] - pos_low[0])
        rpy = jnp.float32(pos_low[1]) + u(1) * jnp.float32(pos_high[1] - pos_low[1])
        rpz = jnp.float32(pos_low[2]) + u(2) * jnp.float32(pos_high[2] - pos_low[2])
        z0, z1 = _normal_pair(lane_id, base + jnp.uint32(3), base + jnp.uint32(4))
        z2, _ = _normal_pair(lane_id, base + jnp.uint32(5), base + jnp.uint32(6))
        rvx, rvy, rvz = vel_scale * z0, vel_scale * z1, vel_scale * z2
        half = jnp.float32(0.5 * _DEG2RAD * ypr_range)
        h0 = (2.0 * u(7) - 1.0) * half  # roll
        h1 = (2.0 * u(8) - 1.0) * half  # pitch
        h2 = (2.0 * u(9) - 1.0) * half  # yaw
        cr, sr = jnp.cos(h0), jnp.sin(h0)
        cp, sp = jnp.cos(h1), jnp.sin(h1)
        cy_, sy_ = jnp.cos(h2), jnp.sin(h2)
        rqw = cy_ * cp * cr + sy_ * sp * sr  # rot.euler_to_quat
        rqx = cy_ * cp * sr - sy_ * sp * cr
        rqy = cy_ * sp * cr + sy_ * cp * sr
        rqz = sy_ * cp * cr - cy_ * sp * sr
        rdx, rdy, rdz = rpx - tx, rpy - ty, rpz - tz
        dist_r = jnp.sqrt(rdx * rdx + rdy * rdy + rdz * rdz)

        ones = jnp.ones_like(crashed)
        if randomize:  # resample DomainRand on reset (AcroEnv._sample_dr)
            rms = jnp.float32(mass_range[0]) + u(10) * jnp.float32(
                mass_range[1] - mass_range[0])
            rds = jnp.float32(drag_range[0]) + u(11) * jnp.float32(
                drag_range[1] - drag_range[0])
            rts = jnp.float32(thrust_range[0]) + u(12) * jnp.float32(
                thrust_range[1] - thrust_range[0])
        else:
            rms = rds = rts = ones
        if use_wind and wind_scale > 0.0:  # AcroEnv._sample_wind gusts
            g0, g1 = _normal_pair(lane_id, base + jnp.uint32(13),
                                  base + jnp.uint32(14))
            g2, _ = _normal_pair(lane_id, base + jnp.uint32(15),
                                 base + jnp.uint32(16))
            rwx = jnp.float32(wind_base[0]) + jnp.float32(wind_scale) * g0
            rwy = jnp.float32(wind_base[1]) + jnp.float32(wind_scale) * g1
            rwz = jnp.float32(wind_base[2]) + jnp.float32(wind_scale) * g2
        else:
            rwx = jnp.full_like(crashed, jnp.float32(wind_base[0]))
            rwy = jnp.full_like(crashed, jnp.float32(wind_base[1]))
            rwz = jnp.full_like(crashed, jnp.float32(wind_base[2]))

        # next-state done row is always 0: done envs take the reset branch and
        # live envs by definition have crashed == 0 (AcroEnv.step's tree_where)
        zeros = jnp.zeros_like(crashed)
        live = jnp.concatenate([
            phys[: 14 * SUBLANES],           # pos vel quat rates thrust
            zeros,                           # done
            t, dist, row(st, 17) + reward,
            row(st, 18), row(st, 19), row(st, 20),  # DomainRand persists
            row(st, 21), row(st, 22), row(st, 23),  # wind persists
        ] + ([pilot] if n_pilot_rows else []), axis=0)
        reset = jnp.concatenate([
            rpx, rpy, rpz, rvx, rvy, rvz, rqw, rqx, rqy, rqz,
            zeros, zeros, zeros,            # rates
            zeros,                          # thrust
            zeros,                          # done
            zeros,                          # t
            dist_r,
            zeros,                          # episode_return
            rms, rds, rts,
            rwx, rwy, rwz,
        ] + ([jnp.zeros((n_pilot_rows * SUBLANES, n_lane), jnp.float32)]
             if n_pilot_rows else []), axis=0)
        sel = jnp.tile(done > 0.5, (ENV_ROWS + n_pilot_rows, 1))
        nxt = jnp.where(sel, reset, live)
        if not extra_metrics:
            return nxt, rsum + reward
        # contact = crash inside the chased sphere's collision shell
        # (motor arm 0.127 m + motor radius; 0.3 m margin covers both)
        shell = world_mat[3:4, 0:1] + jnp.float32(0.3)
        contact = crashed * (dist <= shell).astype(jnp.float32)
        return (nxt, rsum + reward, carry[2] + crashed, carry[3] + contact)

    rsum0 = jnp.zeros((SUBLANES, n_lane), jnp.float32)
    init = ((state0, rsum0) if not extra_metrics
            else (state0, rsum0, rsum0, rsum0))
    return jax.lax.fori_loop(0, n_steps, body, init)


def _env_kernel(params, cfg, n_steps, use_cyl, seed_ref, state_ref,
                action_ref, world_ref, *rest):
    cyl_ref, out_ref, rsum_ref = (rest if use_cyl else (None,) + rest)
    seed = seed_ref[0]
    out, rsum = _env_loop_math(params, cfg, n_steps, seed,
                               state_ref[:, :], action_ref[:, :],
                               world_ref[:, :],
                               cyl_mat=cyl_ref[:, :] if use_cyl else None)
    out_ref[:, :] = out
    rsum_ref[:, :] = rsum


@functools.partial(jax.jit, static_argnums=(0, 1, 5, 6))
def _call_env_rollout(params, cfg, state_mat, action_mat, world_mat, n_steps,
                      interpret, seed, cyl_mat=None):
    n = state_mat.shape[1]
    use_cyl = cyl_mat is not None
    kernel = functools.partial(_env_kernel, params, cfg, n_steps, use_cyl)
    args = (jnp.asarray([seed], jnp.int32), state_mat, action_mat,
            world_mat) + ((cyl_mat,) if use_cyl else ())
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((ENV_ROWS * SUBLANES, n), jnp.float32),
            jax.ShapeDtypeStruct((SUBLANES, n), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (len(args) - 1),
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(*args)


# ---------------------------------------------------------------------------
# Public wrappers
# ---------------------------------------------------------------------------


def env_supported(env: AcroEnv, world: World) -> bool:
    """Cylinder worlds and domain randomization run in-kernel; gate tracks
    are accepted unchanged (gates never collide, components.py:203, and the
    acro reward ignores them) — this covers the reference's default
    params.yaml world (config/params.yaml:6-35)."""
    return (
        env.params.att_mode == "quat"
        and env.dtype == jnp.float32
        and bool(np.asarray(world.has_ground))
    )


def env_state_to_matrix(state: AcroState) -> jnp.ndarray:
    phys = state_to_matrix(state.drone)
    n = state.prev_dist.shape[0]
    bc = lambda x: jnp.broadcast_to(x, (n,))  # nominal DR may be unbatched
    extras = [
        _pack(state.t.astype(jnp.float32)),
        _pack(state.prev_dist),
        _pack(state.episode_return),
        _pack(bc(state.domain_rand.mass_scale)),
        _pack(bc(state.domain_rand.drag_scale)),
        _pack(bc(state.domain_rand.thrust_scale)),
        _pack(bc(state.wind[..., 0])),
        _pack(bc(state.wind[..., 1])),
        _pack(bc(state.wind[..., 2])),
    ]
    return jnp.concatenate([phys] + extras, axis=0)


def matrix_to_env_state(mat: jnp.ndarray, template: AcroState) -> AcroState:
    drone = matrix_to_state(mat[: STATE_ROWS * SUBLANES], template.drone)

    def comp(i):
        return mat[SUBLANES * i:SUBLANES * (i + 1)].reshape(-1)

    return AcroState(
        drone=drone,
        domain_rand=DomainRand(
            mass_scale=comp(STATE_ROWS + 3),
            drag_scale=comp(STATE_ROWS + 4),
            thrust_scale=comp(STATE_ROWS + 5),
        ),
        t=comp(STATE_ROWS).astype(jnp.int32),
        prev_dist=comp(STATE_ROWS + 1),
        key=template.key,  # kernel RNG is hash-counter based; keys untouched
        episode_return=comp(STATE_ROWS + 2),
        wind=jnp.stack([comp(STATE_ROWS + 6), comp(STATE_ROWS + 7),
                        comp(STATE_ROWS + 8)], axis=-1),
    )


def env_world_matrix(world: World, n_pad: int = 8) -> jnp.ndarray:
    S = int(world.num_spheres)
    S_pad = max(n_pad, S)
    mat = jnp.zeros((_WORLD_ROWS, S_pad), jnp.float32)
    mat = mat.at[0:3, :S].set(world.sphere_center.T.astype(jnp.float32))
    mat = mat.at[3, :S].set(world.sphere_radius.astype(jnp.float32))
    mat = mat.at[4, :S].set(world.sphere_active.astype(jnp.float32))
    mat = mat.at[5:8, :S].set(world.sphere_path_center.T.astype(jnp.float32))
    mat = mat.at[8, :S].set(world.sphere_path_radius.astype(jnp.float32))
    mat = mat.at[9, :S].set(world.sphere_path_res.astype(jnp.float32))
    mat = mat.at[10, :S].set(world.sphere_has_path.astype(jnp.float32))
    mat = mat.at[11, :S].set(world.sphere_path_count.astype(jnp.float32))
    return mat


def pallas_env_rollout(
    env: AcroEnv,
    state: AcroState,
    action: jnp.ndarray,  # (N, 4), applied every step
    world: World,
    n_steps: int,
    seed: int = 0,
    interpret: bool = False,
) -> Tuple[AcroState, World, jnp.ndarray]:
    """K full env steps in one kernel. Returns (state, advanced world,
    per-env summed reward).  See module doc for semantics + support matrix.
    """
    assert env_supported(env, world), "unsupported config for the pallas env path"
    assert state.drone.pos.shape[0] % SUBLANES == 0, "N must be a multiple of 8"
    state_mat = env_state_to_matrix(state)
    world_mat = env_world_matrix(world)
    cyl_mat = cylinder_matrix(world) if world_has_cylinders(world) else None
    action_mat = jnp.concatenate([_pack(action[:, i]) for i in range(4)], axis=0)
    cfg = _env_cfg_scalars(env)
    out, rsum = _call_env_rollout(env.params, cfg, state_mat, action_mat,
                                  world_mat, n_steps, interpret, int(seed),
                                  cyl_mat=cyl_mat)
    new_world = world.replace(
        sphere_path_count=world.sphere_path_count
        + jnp.int32(n_steps) * world.sphere_has_path.astype(jnp.int32)
    )
    return matrix_to_env_state(out, state), new_world, rsum.reshape(-1)
