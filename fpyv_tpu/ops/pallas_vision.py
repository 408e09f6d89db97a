"""Pallas TPU raycast renderer + in-kernel FPV vision env megaloop.

ROADMAP #1: the state-obs envs run as one pallas kernel (ops/pallas_env);
this module does the same for the VISION path.  Two entry points:

- :func:`pallas_render_depth` — batched analytic-raycast depth frames as one
  kernel, a drop-in for :func:`fpyv_tpu.vision.raycast.render_depth_raycast`
  (same camera model and ray-primitive math — spheres, cylinders, ground,
  shape-aware gates; reference geometry per components.py:449-629).  Returns
  f32 frames in [0, 1] already quantized to the uint8 levels the splat/
  raycast renderers emit (``floor(255*(1-z/max_depth))/255``,
  components.py:626-628), so observations match the XLA path exactly.
- :func:`pallas_vision_env_rollout` — the reference's dim==2 FPV chase loop
  (simulator.py:115-168: render the depth view, extract the target pixel,
  fly toward it, step physics) as ONE kernel advancing K steps with
  VMEM-resident state: per iteration it renders the chased-target depth
  image, takes the mask centroid (the reference's target-pixel extraction,
  simulator.py:103-107), runs the reference's ``needed_force_orientation``
  guidance law (components.py:258-304 — distance-keeping PID on the
  UWB-clamped range, virtual drag, virtual ground-effect lift, 'level'
  force basis) and applies its attitude/|F| through drone_step's override
  path (components.py:230-232), then the full acro env semantics of
  ops/pallas_env (reward, auto-reset, CircularPath targets, DR/wind).
  Frames never touch HBM; parity vs the XLA-composed pilot and the
  station-keeping/intercept behaviors are tested in
  tests/test_pallas_vision.py.

Kernel layout — the whole point of this module:

  The XLA raycast is already VPU-elementwise, but every intermediate is an
  (N, H, W) array and the camera pose enters per env.  Here each tile is
  ``(8 envs, H*W pixels)``: per-env scalars (camera position, rotation
  entries, per-env world parameters) are (8, 1) COLUMN slices and the
  shared pixel-ray grid is a (1, HW) ROW — every op is a full-width VPU
  broadcast, there is no scalar extraction, no gather, no scatter, and the
  frame tile stays in VMEM.  Requires H*W % 128 == 0 (96x72, 64x48, 32x24,
  640x480 all qualify).

Supported: the same world primitives as vision/raycast.py, shared or
per-env (batched) worlds.  The chase megaloop additionally requires the
pallas_env support matrix (quat attitude, ground on, f32).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fpyv_tpu.envs.acro import AcroEnv, AcroState
from fpyv_tpu.ops.pallas_env import (
    ENV_ROWS,
    _env_cfg_scalars,
    _env_loop_math,
    env_state_to_matrix,
    env_supported,
    env_world_matrix,
    matrix_to_env_state,
)
from fpyv_tpu.ops.pallas_step import SUBLANES, cylinder_matrix, world_has_cylinders
from fpyv_tpu.physics.world import World
from fpyv_tpu.vision.camera import CameraRig
from fpyv_tpu.vision.raycast import _BIG, pixel_ray_grid

E_BLK = SUBLANES  # envs per render tile (sublane dimension)


# ---------------------------------------------------------------------------
# Shared render math on (8, HW) tiles
# ---------------------------------------------------------------------------


def _flat_dcam(rig: CameraRig) -> np.ndarray:
    """(3, HW) f32 camera-frame ray dirs, row-major pixel order (v*W + u)."""
    d = pixel_ray_grid(rig)  # (3, H, W)
    return d.reshape(3, -1)


class _RenderCfg(NamedTuple):
    """Static render configuration (hashable; baked into the kernel)."""

    hw: int
    width: int
    n_spheres: int
    n_cylinders: int
    n_gates: int
    spheres: bool
    cylinders: bool
    ground: bool
    gates: bool
    max_depth: float
    ground_extent: Optional[float]
    frame_width: float = 0.08


def _world_cols(cfg: _RenderCfg, world: World, n: int) -> jnp.ndarray:
    """(n, WCOLS) f32 per-env world scalars; broadcasts shared worlds.

    Column layout (kernel reads by static offset):
      spheres   s*5 + [cx cy cz r active]
      cylinders S*5 + c*6 + [cx cy cz r h active]
      gates     S*5 + C*6 + g*15 + [px py pz n(3) ey(3) ez(3) size act shape]
      ground    last column: has_ground
    """

    def bcast(x, trailing):
        x = jnp.asarray(x, jnp.float32)
        return jnp.broadcast_to(x, (n,) + x.shape[x.ndim - trailing:])

    cols = []
    S, C, G = cfg.n_spheres, cfg.n_cylinders, cfg.n_gates
    if S:
        sc = bcast(world.sphere_center, 2)  # (n, S, 3)
        sr = bcast(world.sphere_radius, 1)[..., None]  # (n, S, 1)
        sa = bcast(world.sphere_active, 1)[..., None]
        cols.append(jnp.concatenate([sc, sr, sa], axis=-1).reshape(n, S * 5))
    if C:
        cc = bcast(world.cyl_center, 2)
        cr = bcast(world.cyl_radius, 1)[..., None]
        ch = bcast(world.cyl_height, 1)[..., None]
        ca = bcast(world.cyl_active, 1)[..., None]
        cols.append(jnp.concatenate([cc, cr, ch, ca], axis=-1).reshape(n, C * 6))
    if G:
        gp = bcast(world.gate_pos, 2)  # (n, G, 3)
        gR = bcast(world.gate_rotmat, 3)  # (n, G, 3, 3)
        gn = gR[..., :, 0]  # normal = R[:,0]
        gy = gR[..., :, 1]
        gz = gR[..., :, 2]
        gs = bcast(world.gate_size, 1)[..., None]
        ga = bcast(world.gate_active, 1)[..., None]
        gsh = bcast(world.gate_shape, 1)[..., None]
        cols.append(jnp.concatenate([gp, gn, gy, gz, gs, ga, gsh],
                                    axis=-1).reshape(n, G * 15))
    hg = jnp.asarray(world.has_ground, jnp.float32).reshape(-1, 1)
    cols.append(jnp.broadcast_to(hg, (n, 1)))
    return jnp.concatenate(cols, axis=-1)


def _render_tiles(cfg: _RenderCfg, dcam, cam, wcol, chase_only: bool = False,
                  spheres_override=None):
    """Nearest-hit t over (8, HW) tiles.

    dcam: (3, HW) rows; cam: (8, 16) [pos(3) R00..R22 row-major pad];
    wcol: (8, WCOLS) per-env world scalars (layout in :func:`_world_cols`).
    ``chase_only`` restricts to sphere 0 (the reference's target-only view,
    simulator.py:102/127).  ``spheres_override`` (optional) is a list of
    (cx, cy, cz, r, active) column tuples used INSTEAD of wcol's sphere
    block — the race kernel's moving obstacles recompute their centers
    from episode time each step (envs/multi_race._obstacles_at), so their
    positions are per-step values, not baked world columns.
    """
    col = lambda m, j: m[:, j:j + 1]  # (8, 1)
    dxr, dyr, dzr = dcam[0:1, :], dcam[1:2, :], dcam[2:3, :]
    px, py, pz = col(cam, 0), col(cam, 1), col(cam, 2)
    R = [col(cam, 3 + k) for k in range(9)]  # row-major R00..R22
    dwx = R[0] * dxr + R[1] * dyr + R[2] * dzr  # (8, HW)
    dwy = R[3] * dxr + R[4] * dyr + R[5] * dzr
    dwz = R[6] * dxr + R[7] * dyr + R[8] * dzr

    big = jnp.float32(_BIG)
    t_min = jnp.full(dwx.shape, big, jnp.float32)
    S, C, G = cfg.n_spheres, cfg.n_cylinders, cfg.n_gates
    off_c = S * 5
    off_g = off_c + C * 6
    off_ground = off_g + G * 15

    if cfg.spheres and S:
        a = dwx * dwx + dwy * dwy + dwz * dwz
        for s in range(1 if chase_only else S):
            o = s * 5
            if spheres_override is not None:
                scx, scy, scz, sr2, sact = spheres_override[s]
                ox, oy, oz = px - scx, py - scy, pz - scz
                r = sr2
                act = sact > 0.5
            else:
                ox = px - col(wcol, o + 0)
                oy = py - col(wcol, o + 1)
                oz = pz - col(wcol, o + 2)
                r = col(wcol, o + 3)
                act = col(wcol, o + 4) > 0.5
            b = ox * dwx + oy * dwy + oz * dwz
            c = ox * ox + oy * oy + oz * oz - r * r
            disc = b * b - a * c
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            t = (-b - sq) / a
            t = jnp.where(t > 0, t, (-b + sq) / a)
            ok = (disc >= 0) & (t > 0) & act
            t_min = jnp.minimum(t_min, jnp.where(ok, t, big))
    if chase_only:
        return t_min, (dwx, dwy, dwz)

    if cfg.cylinders and C:
        a2 = dwx * dwx + dwy * dwy
        safe_a = jnp.where(jnp.abs(a2) > 1e-20, a2, 1e-20)
        for ci in range(C):
            o = off_c + ci * 6
            ox = px - col(wcol, o + 0)
            oy = py - col(wcol, o + 1)
            z0 = col(wcol, o + 2)
            r = col(wcol, o + 3)
            h = col(wcol, o + 4)
            act = col(wcol, o + 5) > 0.5
            b = ox * dwx + oy * dwy
            c = ox * ox + oy * oy - r * r
            disc = b * b - a2 * c
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            hit_any = jnp.zeros(dwx.shape, bool)
            t_cyl = jnp.full(dwx.shape, big, jnp.float32)
            for sign in (-1.0, 1.0):  # near wall then far (raycast.py:120)
                t = (-b + sign * sq) / safe_a
                zhit = pz + t * dwz
                ok = (disc >= 0) & (t > 0) & (zhit >= z0) & (zhit <= z0 + h)
                t_cyl = jnp.where(ok & ~hit_any, t, t_cyl)
                hit_any = hit_any | ok
            hit_any = hit_any & act
            t_min = jnp.minimum(t_min, jnp.where(hit_any, t_cyl, big))

    if cfg.ground:
        has = col(wcol, off_ground) > 0.5
        safe = jnp.where(jnp.abs(dwz) > 1e-20, dwz, 1e-20)
        t = -pz / safe
        ok = (t > 0) & (jnp.abs(dwz) > 1e-20) & has
        if cfg.ground_extent is not None:
            hx = px + t * dwx
            hy = py + t * dwy
            ext = jnp.float32(cfg.ground_extent)
            ok = ok & (jnp.abs(hx) <= ext) & (jnp.abs(hy) <= ext)
        t_min = jnp.minimum(t_min, jnp.where(ok, t, big))

    if cfg.gates and G:
        fw = jnp.float32(cfg.frame_width)
        for g in range(G):
            o = off_g + g * 15
            gx, gy_, gz_ = col(wcol, o + 0), col(wcol, o + 1), col(wcol, o + 2)
            nx, ny, nz = col(wcol, o + 3), col(wcol, o + 4), col(wcol, o + 5)
            eyx, eyy, eyz = col(wcol, o + 6), col(wcol, o + 7), col(wcol, o + 8)
            ezx, ezy, ezz = col(wcol, o + 9), col(wcol, o + 10), col(wcol, o + 11)
            s = col(wcol, o + 12)
            act = col(wcol, o + 13) > 0.5
            code = col(wcol, o + 14)
            ndotd = nx * dwx + ny * dwy + nz * dwz
            ndot0 = nx * (gx - px) + ny * (gy_ - py) + nz * (gz_ - pz)
            safe = jnp.where(jnp.abs(ndotd) > 1e-20, ndotd, 1e-20)
            t = ndot0 / safe
            hx = px + t * dwx - gx
            hy = py + t * dwy - gy_
            hz = pz + t * dwz - gz_
            ly = eyx * hx + eyy * hy + eyz * hz
            lz = ezx * hx + ezy * hy + ezz * hz
            half = s * 0.5
            # frame membership as f32 masks: mosaic cannot lower a bool
            # select whose (8,1) condition broadcasts over (8,HW) bool
            # branches (i8->i1 vector truncation, real-chip compile error),
            # so the shape dispatch is mask arithmetic instead of where()
            m_rect = (jnp.abs(jnp.maximum(jnp.abs(ly), jnp.abs(lz)) - half)
                      <= fw).astype(jnp.float32)
            rr = jnp.sqrt(ly * ly + lz * lz)
            m_circ = (jnp.abs(rr - half) <= fw).astype(jnp.float32)
            cz = lz + half
            ra = jnp.sqrt(ly * ly + cz * cz)
            m_arc = ((jnp.abs(ra - s) <= fw) & (cz >= -fw)).astype(jnp.float32)
            m_chord = ((jnp.abs(cz) <= fw)
                       & (jnp.abs(ly) <= s + fw)).astype(jnp.float32)
            m_half = jnp.maximum(m_arc, m_chord)
            sel_circ = (code == 1).astype(jnp.float32)  # (8, 1) one-hots
            sel_half = (code == 2).astype(jnp.float32)
            m_frame = (sel_circ * m_circ + sel_half * m_half
                       + (1.0 - sel_circ - sel_half) * m_rect)
            ok = (t > 0) & (m_frame > 0.5) & (jnp.abs(ndotd) > 1e-20) & act
            t_min = jnp.minimum(t_min, jnp.where(ok, t, big))

    return t_min, (dwx, dwy, dwz)


def _encode_levels(t_min, max_depth: float):
    """f32 in [0,1] equal to the uint8 depth encoding / 255
    (components.py:626-628: clamp, 255*(1-z/max), truncate).  The clip
    matters: XLA may contract ``1 - t/max`` into an FMA whose result is
    -epsilon at t == max_depth, which floor would turn into level -1 (the
    uint8 cast in the XLA path truncates toward zero instead)."""
    t = jnp.minimum(t_min, jnp.float32(max_depth))
    lev = jnp.floor(255.0 * (1.0 - t / jnp.float32(max_depth)))
    return jnp.clip(lev, 0.0, 255.0) * jnp.float32(1.0 / 255.0)


# ---------------------------------------------------------------------------
# Batched per-step render kernel
# ---------------------------------------------------------------------------


def _render_kernel(cfg: _RenderCfg, dcam_ref, cam_ref, wcol_ref, out_ref):
    t_min, _ = _render_tiles(cfg, dcam_ref[:, :], cam_ref[:, :], wcol_ref[:, :])
    out_ref[:, :] = _encode_levels(t_min, cfg.max_depth)


_PIX_BLK_MAX = 8192  # lanes per render tile: big frames (640x480 = 307200
# px) cannot ride VMEM whole — a (8, HW) f32 tile plus the ~10 live
# intermediates of the ray math blows the 16 MB scoped-VMEM budget, so the
# pixel axis tiles too (each block re-reads only its dcam column slice;
# rays are independent, so the split is free)


def _pix_block(hw: int) -> int:
    """Largest divisor of hw that is a multiple of 128 and <= _PIX_BLK_MAX."""
    best = 128
    for blk in range(128, min(hw, _PIX_BLK_MAX) + 1, 128):
        if hw % blk == 0:
            best = blk
    return best


@functools.partial(jax.jit, static_argnames=("cfg", "interpret", "e_blk"))
def _call_render(cfg: _RenderCfg, dcam, cam, wcol, interpret=False,
                 e_blk=E_BLK):
    n = cam.shape[0]
    wcols = wcol.shape[1]
    pblk = _pix_block(cfg.hw)
    cfg_blk = cfg._replace(hw=pblk)
    grid = (n // e_blk, cfg.hw // pblk)
    return pl.pallas_call(
        functools.partial(_render_kernel, cfg_blk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, pblk), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((e_blk, 16), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((e_blk, wcols), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((e_blk, pblk), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, cfg.hw), jnp.float32),
        interpret=interpret,
    )(dcam, cam, wcol)


def pallas_render_depth(
    rig: CameraRig,
    cam_pos: jnp.ndarray,  # (N, 3) or (3,)
    cam_R: jnp.ndarray,  # (N, 3, 3) or (3, 3)
    world: World,  # shared or per-env batched
    max_depth: float = 10.0,
    include: Tuple[str, ...] = ("spheres", "cylinders", "ground", "gates"),
    ground_extent: Optional[float] = None,
    frame_width: float = 0.08,
    interpret: bool = False,
    e_blk: int = E_BLK,  # envs per render tile (sublane-axis block height)
) -> jnp.ndarray:
    """f32 depth frames (N, H, W) in [0, 1], quantized to uint8 levels —
    numerically ``render_depth_raycast(...).astype(f32)/255`` (the exact
    value the vision obs uses) with the frame computed in one pallas kernel.
    """
    W, H = rig.resolution
    hw = W * H
    assert hw % 128 == 0, "H*W must be a multiple of 128 for the TPU kernel"
    single = cam_pos.ndim == 1
    cam_pos = jnp.atleast_2d(cam_pos).astype(jnp.float32)
    cam_R = cam_R.reshape((-1, 3, 3)).astype(jnp.float32)
    n = cam_pos.shape[0]
    n_pad = -(-n // e_blk) * e_blk
    cfg = _RenderCfg(
        hw=hw, width=W,
        n_spheres=int(world.num_spheres), n_cylinders=int(world.num_cylinders),
        n_gates=int(world.num_gates),
        spheres="spheres" in include, cylinders="cylinders" in include,
        ground="ground" in include, gates="gates" in include,
        max_depth=float(max_depth),
        ground_extent=None if ground_extent is None else float(ground_extent),
        frame_width=float(frame_width),
    )
    cam = jnp.zeros((n_pad, 16), jnp.float32)
    cam = cam.at[:n, 0:3].set(cam_pos)
    cam = cam.at[:n, 3:12].set(cam_R.reshape(n, 9))
    # identity rotation on pad rows keeps the ray math non-degenerate
    cam = cam.at[n:, 3].set(1.0).at[n:, 7].set(1.0).at[n:, 11].set(1.0)
    wcol = _world_cols(cfg, world, n)
    if n_pad != n:
        wcol = jnp.concatenate(
            [wcol, jnp.zeros((n_pad - n, wcol.shape[1]), jnp.float32)], axis=0)
    dcam = jnp.asarray(_flat_dcam(rig))
    out = _call_render(cfg, dcam, cam, wcol, interpret=interpret, e_blk=e_blk)
    out = out[:n].reshape(n, H, W)
    return out[0] if single else out


# ---------------------------------------------------------------------------
# In-kernel FPV chase megaloop
# ---------------------------------------------------------------------------


N_PILOT_ROWS = 4  # PID memory: integral, prev_derivative, previous_error,
#                   started (0 = is_first, matching pid_init's zeros)


class ChasePilot(NamedTuple):
    """In-kernel FPV guidance pilot: the reference's
    ``calculate_needed_force_orientation`` autopilot (components.py:258-304,
    ported in control/guidance.needed_force_orientation) driven by the
    RENDERED target centroid pixel, with a hover-scan fallback while the
    target is out of frame.  Distance comes from the UWB-clamped range
    sensor exactly as the reference does (components.py:287); the PID
    output clamps are the thrust-curve force limits (components.py:143-144,
    taken from DroneParams at call time).  All fields mirror
    control/guidance.GuidanceParams / params.yaml's point_and_shoot block.
    """

    virtual_drag_coef: float = 0.5
    virtual_lift_coef: float = 0.1
    tof_effective_distance: float = 2.0
    keep_distance: float = 6.0
    uwb_max_range: float = 13.0
    kP: float = 0.1
    kI: float = 2.0
    kD: float = 0.05
    integral_clip: float = 100.0
    derivative_transition_rate: float = 0.2
    integral_leak: float = 0.99
    # hover-scan while the target is out of frame: hover thrust tilted by
    # scan_tilt, the tilt azimuth rotating at scan_rate_dps (pans the camera)
    scan_tilt: float = 0.15
    scan_rate_dps: float = 45.0


def _quat_cols_from_R(m):
    """Shepperd's method over 9 entry tiles m[0..8] (row-major) -> 4 tiles.
    Mirrors ops/rotations.rotmat_to_quat (same candidates, same dominant-
    diagonal selection, w >= 0 canonical sign) with where-chains instead of
    gathers so it lowers inside the pallas kernel."""
    m00, m01, m02, m10, m11, m12, m20, m21, m22 = m
    tr = m00 + m11 + m22

    def ssqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    sw = ssqrt(1.0 + tr)
    iw = 0.5 / sw
    cw = (0.5 * sw, (m21 - m12) * iw, (m02 - m20) * iw, (m10 - m01) * iw)
    sx = ssqrt(1.0 + m00 - m11 - m22)
    ix = 0.5 / sx
    cx = ((m21 - m12) * ix, 0.5 * sx, (m01 + m10) * ix, (m02 + m20) * ix)
    sy = ssqrt(1.0 - m00 + m11 - m22)
    iy = 0.5 / sy
    cy = ((m02 - m20) * iy, (m01 + m10) * iy, 0.5 * sy, (m12 + m21) * iy)
    sz = ssqrt(1.0 - m00 - m11 + m22)
    iz = 0.5 / sz
    cz = ((m10 - m01) * iz, (m02 + m20) * iz, (m12 + m21) * iz, 0.5 * sz)

    sel_w = (tr >= m00) & (tr >= m11) & (tr >= m22)
    sel_x = (m00 >= m11) & (m00 >= m22)
    sel_y = m11 >= m22
    q = [jnp.where(sel_w, w_, jnp.where(sel_x, x_, jnp.where(sel_y, y_, z_)))
         for w_, x_, y_, z_ in zip(cw, cx, cy, cz)]
    sign = jnp.where(q[0] < 0, -1.0, 1.0)
    return tuple(qi * sign for qi in q)


@functools.lru_cache(maxsize=32)
def _make_chase_action_fn(rig: CameraRig, pilot: ChasePilot, mass: float,
                          dt: float, min_force: float, max_force: float):
    """Builds the per-iteration pilot for _env_loop_math: render the chased
    target per 8-env column block, take the mask centroid pixel, run the
    reference guidance law, and emit the attitude/|F| override plus updated
    PID memory rows.  Cached on its (hashable) args so repeated rollout
    calls reuse the jit cache."""
    mount, rel_pos = rig.mount_rotation, rig.rel_position
    W, H = rig.resolution
    hw = W * H
    m = [float(x) for x in np.asarray(mount).reshape(-1)]  # row-major 3x3
    rp = [float(x) for x in np.asarray(rel_pos).reshape(-1)]
    Ki = np.asarray(rig.K_inv)
    k00, k02, k11, k12 = float(Ki[0, 0]), float(Ki[0, 2]), float(Ki[1, 1]), \
        float(Ki[1, 2])
    gz = -9.81 * mass  # guidance pins g=9.81 (components.py:270)
    scan_s = pilot.scan_tilt * 9.81 * mass
    scan_w = np.deg2rad(pilot.scan_rate_dps) * dt
    cfg = _RenderCfg(hw=hw, width=W, n_spheres=1, n_cylinders=0, n_gates=0,
                     spheres=True, cylinders=False, ground=False, gates=False,
                     max_depth=1.0, ground_extent=None)

    def action_fn(i, st, dcam, sph_c, sphere_r):
        """st: ((ENV_ROWS+N_PILOT_ROWS)*8, n_lane) -> (act, override, pilot
        rows); see _env_loop_math's action_fn contract."""
        n_lane = st.shape[1]

        def row(mat, r):
            return mat[SUBLANES * r:SUBLANES * (r + 1)]

        # pixel coordinate rows (1, HW): u = idx % W, v = idx // W (+centers)
        # (mosaic iota must be integer; cast after)
        idx = jax.lax.broadcasted_iota(jnp.int32, (1, hw), 1).astype(jnp.float32)
        wf = jnp.float32(W)
        u_row = idx - jnp.floor(idx / wf) * wf + 0.5
        v_row = jnp.floor(idx / wf) + 0.5
        theta = jnp.float32(scan_w) * i.astype(jnp.float32)
        scan_fx = jnp.float32(scan_s) * jnp.cos(theta)
        scan_fy = jnp.float32(scan_s) * jnp.sin(theta)

        def render_block(c):
            # STATIC column slice: mosaic has no dynamic_slice lowering on
            # the lane axis, so the env-block loop is unrolled (the chase
            # kernel runs one 8-env block per grid program -> n_lane == 1)
            def colc(r):
                return row(st, r)[:, c:c + 1]

            px, py, pz = colc(0), colc(1), colc(2)
            vx, vy, vz = colc(3), colc(4), colc(5)
            qw, qx, qy, qz = colc(6), colc(7), colc(8), colc(9)
            # body R from quat (same closed form as _step_math)
            B = [1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qz * qw),
                 2 * (qx * qz + qy * qw),
                 2 * (qx * qy + qz * qw), 1 - 2 * (qx * qx + qz * qz),
                 2 * (qy * qz - qx * qw),
                 2 * (qx * qz - qy * qw), 2 * (qy * qz + qx * qw),
                 1 - 2 * (qx * qx + qy * qy)]
            # camera pose (components.py:501-503): cam_R = R @ mount,
            # cam_pos = p + R @ rel_pos — mount/rel are python-float consts
            cR = [B[0] * m[0] + B[1] * m[3] + B[2] * m[6],
                  B[0] * m[1] + B[1] * m[4] + B[2] * m[7],
                  B[0] * m[2] + B[1] * m[5] + B[2] * m[8],
                  B[3] * m[0] + B[4] * m[3] + B[5] * m[6],
                  B[3] * m[1] + B[4] * m[4] + B[5] * m[7],
                  B[3] * m[2] + B[4] * m[5] + B[5] * m[8],
                  B[6] * m[0] + B[7] * m[3] + B[8] * m[6],
                  B[6] * m[1] + B[7] * m[4] + B[8] * m[7],
                  B[6] * m[2] + B[7] * m[5] + B[8] * m[8]]
            cx = px + B[0] * rp[0] + B[1] * rp[1] + B[2] * rp[2]
            cy = py + B[3] * rp[0] + B[4] * rp[1] + B[5] * rp[2]
            cz = pz + B[6] * rp[0] + B[7] * rp[1] + B[8] * rp[2]
            cam = jnp.concatenate(
                [cx, cy, cz] + cR + [jnp.zeros_like(px)] * 4, axis=1)
            # chased target (sphere 0) scalars broadcast over the block
            tx = jnp.broadcast_to(sph_c[0:1, 0:1], (SUBLANES, 1))
            ty = jnp.broadcast_to(sph_c[1:2, 0:1], (SUBLANES, 1))
            tz = jnp.broadcast_to(sph_c[2:3, 0:1], (SUBLANES, 1))
            tr_ = jnp.broadcast_to(sphere_r[0:1, 0:1], (SUBLANES, 1))
            tgt = jnp.concatenate(
                [tx, ty, tz, tr_, jnp.ones((SUBLANES, 1), jnp.float32)],
                axis=1)
            t_min, _ = _render_tiles(cfg, dcam, cam, tgt, chase_only=True)
            mask = (t_min < jnp.float32(1e30)).astype(jnp.float32)  # (8, HW)
            cnt = jnp.sum(mask, axis=1, keepdims=True)
            safe = jnp.maximum(cnt, 1.0)
            ucen = jnp.sum(mask * u_row, axis=1, keepdims=True) / safe
            vcen = jnp.sum(mask * v_row, axis=1, keepdims=True) / safe
            visible = cnt > 0.5

            # ---- needed_force_orientation (components.py:258-304) --------
            # ray through the centroid pixel, world frame, normalized
            dcx = k00 * ucen + k02
            dcy = k11 * vcen + k12
            dwx = cR[0] * dcx + cR[1] * dcy + cR[2]
            dwy = cR[3] * dcx + cR[4] * dcy + cR[5]
            dwz = cR[6] * dcx + cR[7] * dcy + cR[8]
            dn = jnp.maximum(
                jnp.sqrt(dwx * dwx + dwy * dwy + dwz * dwz), 1e-12)
            dwx, dwy, dwz = dwx / dn, dwy / dn, dwz / dn
            # UWB-clamped SDF range (components.py:287)
            ddx, ddy, ddz = px - tx, py - ty, pz - tz
            dist = jnp.sqrt(ddx * ddx + ddy * ddy + ddz * ddz) - tr_
            measured = jnp.minimum(dist, jnp.float32(pilot.uwb_max_range))
            # PID on distance (control/pid.py parity; memory rows after
            # ENV_ROWS: integral, prev_derivative, previous_error, started)
            p_i = colc(ENV_ROWS + 0)
            p_d = colc(ENV_ROWS + 1)
            p_e = colc(ENV_ROWS + 2)
            p_s = colc(ENV_ROWS + 3)
            err = measured - jnp.float32(pilot.keep_distance)
            integ = jnp.clip(
                jnp.float32(pilot.integral_leak) * p_i + err * jnp.float32(dt),
                -pilot.integral_clip, pilot.integral_clip)
            raw_d = jnp.clip(
                jnp.where(p_s > 0.5, (err - p_e) / jnp.float32(dt), 0.0),
                -1.0, 1.0)
            a_ = jnp.float32(pilot.derivative_transition_rate)
            deriv = (1.0 - a_) * p_d + a_ * raw_d
            mult = jnp.clip(
                jnp.float32(pilot.kP) * err + jnp.float32(pilot.kI) * integ
                + jnp.float32(pilot.kD) * deriv,
                jnp.float32(min_force), jnp.float32(max_force))
            # virtual drag (components.py:271-285)
            vnorm = jnp.sqrt(vx * vx + vy * vy + vz * vz)
            inv_v = 1.0 / jnp.maximum(vnorm, 1e-12)
            cosang = (vx * dwx + vy * dwy + vz * dwz) * inv_v
            vc = jnp.float32(pilot.virtual_drag_coef) * (
                -(cosang - 1.0) / 2.0) * vnorm
            vdx, vdy, vdz = -vc * vx, -vc * vy, -vc * vz
            # virtual ground-effect lift (components.py:286)
            below = (pz < jnp.float32(pilot.tof_effective_distance)).astype(
                jnp.float32)
            vlift = (below
                     * -(jnp.float32(pilot.tof_effective_distance) - pz)
                     * jnp.float32(pilot.virtual_lift_coef) * jnp.float32(gz)
                     * (1.0 + jnp.abs(vz)))
            # F = mult*dir + vdrag + vlift - gravity (components.py:292)
            fgx = mult * dwx + vdx
            fgy = mult * dwy + vdy
            fgz = mult * dwz + vdz + vlift - jnp.float32(gz)
            # hover-scan fallback while the target is out of frame
            fx_ = jnp.where(visible, fgx, scan_fx)
            fy_ = jnp.where(visible, fgy, scan_fy)
            fz_ = jnp.where(visible, fgz, jnp.float32(-gz))
            # PID memory freezes while blind (no reference analog: the
            # reference sim always has the pixel)
            n_i = jnp.where(visible, integ, p_i)
            n_d = jnp.where(visible, deriv, p_d)
            n_e = jnp.where(visible, err, p_e)
            n_s = jnp.where(visible, jnp.ones_like(p_s), p_s)
            # 'level' force basis (components.py:294-303): y = F x g,
            # x = y x F, columns normalized; z column = F-hat
            yx = fy_ * jnp.float32(gz)
            yy = -fx_ * jnp.float32(gz)
            xx = yy * fz_
            xy = -yx * fz_
            xz = yx * fy_ - yy * fx_
            xn = jnp.maximum(jnp.sqrt(xx * xx + xy * xy + xz * xz), 1e-12)
            yn = jnp.maximum(jnp.sqrt(yx * yx + yy * yy), 1e-12)
            fn = jnp.maximum(jnp.sqrt(fx_ * fx_ + fy_ * fy_ + fz_ * fz_),
                             1e-12)
            Rd = (xx / xn, yx / yn, fx_ / fn,
                  xy / xn, yy / yn, fy_ / fn,
                  xz / xn, 0.0 * xz, fz_ / fn)
            oqw, oqx, oqy, oqz = _quat_cols_from_R(Rd)
            fnorm = jnp.sqrt(fx_ * fx_ + fy_ * fy_ + fz_ * fz_)
            return (oqw, oqx, oqy, oqz, fnorm, n_i, n_d, n_e, n_s)

        blocks = [render_block(c) for c in range(n_lane)]  # static unroll
        cat = lambda k: jnp.concatenate([b[k] for b in blocks], axis=1)
        act = jnp.zeros((4 * SUBLANES, n_lane), jnp.float32)
        override = tuple(cat(k) for k in range(5))
        pilot_rows = jnp.concatenate([cat(5), cat(6), cat(7), cat(8)], axis=0)
        return act, override, pilot_rows

    return action_fn


CH_ROWS = ENV_ROWS + N_PILOT_ROWS


def _env_major(mat: jnp.ndarray, rows: int) -> jnp.ndarray:
    """(rows*8, NL) row-tile layout -> (NL*8, rows) env-major, ordered so
    the 8 rows [8g, 8g+8) are exactly tile column g's sublanes (keeps the
    in-kernel RNG lane ids identical to the full-width layout)."""
    nl = mat.shape[1]
    return mat.reshape(rows, SUBLANES, nl).transpose(2, 1, 0).reshape(
        nl * SUBLANES, rows)


def _from_env_major(em: jnp.ndarray, rows: int) -> jnp.ndarray:
    nl = em.shape[0] // SUBLANES
    return em.reshape(nl, SUBLANES, rows).transpose(2, 1, 0).reshape(
        rows * SUBLANES, nl)


def _chase_kernel(params, cfg_env, action_fn, n_steps, use_cyl, n_lane_total,
                  seed_ref, state_ref, world_ref, dcam_ref, *rest):
    """One grid program advances ONE 8-env column block K steps.  The grid
    (not an in-kernel loop) walks the env bank because mosaic has no
    dynamic lane slicing; the state rides env-major (8 envs on sublanes,
    components on lanes) and is relaid to _env_loop_math's (CH_ROWS*8, 1)
    row layout through a VMEM scratch — per-slice STORES at static offsets,
    because mosaic rejects concatenating slices whose offsets differ on a
    non-concat dimension (both lane-offset columns stacked on sublanes and
    sublane-offset rows stacked on lanes hit that on the real chip; stores
    relayout freely)."""
    (cyl_ref, out_ref, rsum_ref, crash_ref, contact_ref, st_scratch) = (
        rest if use_cyl else (None,) + rest)
    seed = seed_ref[0]
    g = pl.program_id(0)
    st_T = state_ref[:, :]  # (8, CH_ROWS) env-major
    for r in range(CH_ROWS):  # entry relayout via scratch stores
        st_scratch[SUBLANES * r:SUBLANES * (r + 1), :] = st_T[:, r:r + 1]
    st_rows = st_scratch[:, :]  # (CH_ROWS*8, 1) row layout
    out, rsum, crashes, contacts = _env_loop_math(
        params, cfg_env, n_steps, seed, st_rows, None,
        world_ref[:, :], cyl_mat=cyl_ref[:, :] if use_cyl else None,
        action_fn=functools.partial(action_fn, dcam=dcam_ref[:, :]),
        extra_metrics=True, n_pilot_rows=N_PILOT_ROWS,
        lane_col0=g, n_lane_total=n_lane_total)
    for r in range(CH_ROWS):  # exit relayout: row tiles -> lane columns
        out_ref[:, r:r + 1] = out[SUBLANES * r:SUBLANES * (r + 1), :]
    rsum_ref[:, :] = rsum
    crash_ref[:, :] = crashes
    contact_ref[:, :] = contacts


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 5, 6))
def _call_chase_rollout(params, cfg_env, action_fn, state_mat, world_mat,
                        n_steps, interpret, seed, dcam, cyl_mat=None):
    nl = state_mat.shape[1]
    n_env = nl * SUBLANES
    use_cyl = cyl_mat is not None
    kernel = functools.partial(_chase_kernel, params, cfg_env, action_fn,
                               n_steps, use_cyl, nl)
    state_em = _env_major(state_mat, CH_ROWS)  # (n_env, CH_ROWS)
    args = (jnp.asarray([seed], jnp.int32), state_em, world_mat, dcam) + (
        (cyl_mat,) if use_cyl else ())
    shared = lambda shape: pl.BlockSpec(shape, lambda g: (0, 0),
                                        memory_space=pltpu.VMEM)
    blocked = lambda cols: pl.BlockSpec((SUBLANES, cols), lambda g: (g, 0),
                                        memory_space=pltpu.VMEM)
    out_em, rsum, crashes, contacts = pl.pallas_call(
        kernel,
        grid=(nl,),
        out_shape=(
            jax.ShapeDtypeStruct((n_env, CH_ROWS), jnp.float32),
            jax.ShapeDtypeStruct((n_env, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_env, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_env, 1), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  blocked(CH_ROWS),
                  shared(world_mat.shape),
                  shared(dcam.shape)]
        + ([shared(cyl_mat.shape)] if use_cyl else []),
        out_specs=(blocked(CH_ROWS), blocked(1), blocked(1), blocked(1)),
        scratch_shapes=[pltpu.VMEM((CH_ROWS * SUBLANES, 1), jnp.float32)],
        interpret=interpret,
    )(*args)
    return (_from_env_major(out_em, CH_ROWS),
            _from_env_major(rsum, 1), _from_env_major(crashes, 1),
            _from_env_major(contacts, 1))


def pallas_vision_env_rollout(
    env: AcroEnv,
    state: AcroState,
    world: World,
    n_steps: int,
    rig: Optional[CameraRig] = None,
    pilot: ChasePilot = ChasePilot(),
    seed: int = 0,
    interpret: bool = False,
) -> Tuple[AcroState, World, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """K steps of the FPV chase loop in ONE kernel: target-only render ->
    centroid -> pixel-servo action -> full acro env step (reward, resets,
    CircularPath targets, DR/wind).  Returns (state, advanced world, per-env
    reward sums, crash counts, target-contact counts).  The rebuild of
    simulator.py:115-168's dim==2 loop.
    """
    if rig is None:
        from fpyv_tpu.envs.vision_acro import default_vision_rig

        rig = default_vision_rig()
    assert env_supported(env, world), "unsupported config for the pallas env path"
    assert state.drone.pos.shape[0] % SUBLANES == 0, "N must be a multiple of 8"
    W, H = rig.resolution
    assert (W * H) % 128 == 0, "H*W must be a multiple of 128"
    state_mat = env_state_to_matrix(state)
    state_mat = jnp.concatenate(
        [state_mat,
         jnp.zeros((N_PILOT_ROWS * SUBLANES, state_mat.shape[1]),
                   jnp.float32)], axis=0)  # fresh PID memory (pid_init)
    world_mat = env_world_matrix(world)
    cyl_mat = cylinder_matrix(world) if world_has_cylinders(world) else None
    cfg_env = _env_cfg_scalars(env)
    curve = env.params.thrust_curve
    action_fn = _make_chase_action_fn(
        rig, pilot, float(env.params.mass), float(env.params.dt),
        float(curve.min_force), float(curve.max_force))
    dcam = jnp.asarray(_flat_dcam(rig))
    out, rsum, crashes, contacts = _call_chase_rollout(
        env.params, cfg_env, action_fn, state_mat, world_mat, n_steps,
        interpret, int(seed), dcam, cyl_mat=cyl_mat)
    new_world = world.replace(
        sphere_path_count=world.sphere_path_count
        + jnp.int32(n_steps) * world.sphere_has_path.astype(jnp.int32)
    )
    return (matrix_to_env_state(out[: ENV_ROWS * SUBLANES], state), new_world,
            rsum.reshape(-1), crashes.reshape(-1), contacts.reshape(-1))
