"""Policy-in-kernel VISION RACE rollout: render the gate track -> K-frame
stack -> patch-embed policy -> Gaussian sample -> full single-agent
MultiRace step, T steps per pallas launch (VERDICT r4 #2).

Round 4's policy kernel (ops/pallas_policy) covers the acro chase task only;
the racing flagships (the 90.7-gate onehot racer, the 58.7-gate pixels-only
racer — both ``frame_stack=4``) train on the XLA scan path at 93-191K
steps/s because the kernel had neither gate state nor temporal memory.
This kernel closes both gaps:

- GATE STATE IN-KERNEL: next_gate / gates_passed / plane+center distances
  ride the env-major state matrix; gate passing (plane crossing inside the
  gate, envs/multi_race.py step), bounded center-progress reward, episode
  termination and ring respawn (``_sample_drones``) all run per step inside
  the kernel.  Moving obstacles are a pure function of episode time
  (CircularPath arithmetic, multi_race._obstacles_at), so their centers are
  recomputed per step for BOTH the render (spheres_override) and the
  collision step — nothing rides the carry, resets rewind them, exactly
  like the XLA env.
- K-FRAME STACKS IN-KERNEL: the frame scratch holds the last K rendered
  frames in PATCH-STACK-MAJOR order (per patch, K frames' 64 pixels
  contiguous, oldest first — the exact column order of the net's
  space-to-depth + per-patch concat, models/policy.PixelActorCritic), so
  the policy's embed contraction is K*64 wide (a better MXU shape than a
  single frame) with zero transposes, and whole-race resets flush the
  history to the respawn frame exactly as envs/vision_race.step_batched
  does.  The stacked frames stream out per step; the learner consumes them
  with ``PixelActorCritic(prepatched=True)`` after a pure reshape.

The observation semantics match envs/vision_race.VisionRaceEnv: FPV depth
view of gate frames + ground (+ orbiting obstacle spheres) at the env's
0.35 m frame_width, uint8 levels, proprio [rates/max, accel_z/30,
thrust/max, next-gate onehot] (onehot zeroed for the pixels-only ablation).
Reference lineage: the dim==2 FPV loop over the object list
(/root/reference/src/core/simulator.py:115-168) with the track in the list
(:85) and CircularPath targets (components.py:743-751) — here the racing
env is the fpyv_tpu scale-up (envs/multi_race.py) run at kernel speed.

Support matrix (asserted): single agent (n_agents == 1 — multi-agent views
need opponent positions, which are cross-env data), torso='patch',
embed=128, single fc hidden layer, quat attitude, no wind/DR, static gate
track shared across envs.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fpyv_tpu.envs.multi_race import MultiRaceEnv
from fpyv_tpu.ops.pallas_env import _murmur3_fmix, _normal_pair, _uniform_01
from fpyv_tpu.ops.pallas_policy import (
    PATCH,
    PP,
    PolicyWeights,
    patch_major_ray_grid,
    prepatch_pixels,
)
from fpyv_tpu.ops.pallas_step import _step_components
from fpyv_tpu.ops.pallas_vision import _RenderCfg, _render_tiles, _world_cols
from fpyv_tpu.physics.world import World
from fpyv_tpu.vision.camera import CameraRig

# env-major race state columns
RROWS = 22  # 0:3 pos, 3:6 vel, 6:10 quat, 10:13 rates, 13 thrust, 14 done,
#             15 t, 16 next_gate, 17 prev_center_dist, 18 accel_z,
#             19 gates_passed, 20 prev_gate_dist, 21 flush (just-reset flag)
_SQ2H = float(np.sqrt(0.5))  # cos/sin of the 90 deg spawn yaw half-angle


class _RaceCfg(NamedTuple):
    """Static MultiRaceEnv scalars baked into the kernel."""

    n_gates: int
    max_steps: int
    track_radius: float
    spawn_radius: float
    spawn_height: float
    w_gate: float
    w_progress: float
    w_alive: float
    w_crash: float
    max_rates: float
    max_force: float
    gate_onehot: bool
    frame_stack: int
    n_obstacles: int


def _race_cfg(race: MultiRaceEnv, gate_onehot: bool,
              frame_stack: int) -> _RaceCfg:
    assert race.n_agents == 1, "kernel race rollout is single-agent"
    return _RaceCfg(
        n_gates=int(race.n_gates),
        max_steps=int(race.max_episode_steps),
        track_radius=float(race.track_radius),
        spawn_radius=float(race.spawn_radius),
        spawn_height=float(race.spawn_height),
        w_gate=float(race.w_gate),
        w_progress=float(race.w_progress),
        w_alive=float(race.w_alive),
        w_crash=float(race.w_crash),
        max_rates=float(race.params.max_rates),
        max_force=float(race.params.thrust_curve.max_force),
        gate_onehot=bool(gate_onehot),
        frame_stack=int(frame_stack),
        n_obstacles=int(race.n_obstacles),
    )


def _gate_select(wcol, off_g, masks, G):
    """Accumulate gate columns under (E, 1) one-hot masks: returns
    (gx, gy, gz, nx, ny, nz, half_size) of each env's selected gate."""
    wc = lambda j: wcol[:, j:j + 1]
    acc = [None] * 7
    for g in range(G):
        o = off_g + g * 15
        vals = (wc(o + 0), wc(o + 1), wc(o + 2),  # pos
                wc(o + 3), wc(o + 4), wc(o + 5),  # normal
                wc(o + 12))  # size
        m = masks[g]
        for i, v in enumerate(vals):
            acc[i] = m * v if acc[i] is None else acc[i] + m * v
    return acc[0], acc[1], acc[2], acc[3], acc[4], acc[5], acc[6] * 0.5


def _kernel(params, cfg: _RaceCfg, rcfg: _RenderCfg, rig: CameraRig,
            e_blk: int, n_steps: int, pix_blk: int, compute_dtype, pool: int,
            # refs
            seed_ref, state_in, wcol_ref, ocol_ref, hist_in, dcam_ref,
            we_ref, be_ref, wp_ref, bp_ref, wf_ref, bf_ref, wm_ref, bm_ref,
            std_ref, frames_out, extra_out, aux_out, state_out,
            frame_s, cur_s, embed_s, fcin_s, state_s, pool_s=None):
    E = e_blk
    hw = rcfg.hw
    NP = hw // PP
    K = cfg.frame_stack
    G = cfg.n_gates
    S = cfg.n_obstacles
    KPP = K * PP
    NPG = NP // pool
    b = pl.program_id(0)
    k = pl.program_id(1)
    dt = jnp.float32 if compute_dtype is None else compute_dtype

    kf_pad = wf_ref.shape[0]
    n_flat = NPG * 128
    # proprio layout: [rates(3), accel_z, thrust, onehot(G)] padded to 16
    # (the fcin pad slot); wf rows past it must stay zero
    assert 5 + G <= 16, f"proprio block 5+{G} exceeds the 16-wide pad slot"

    @pl.when(k == 0)
    def _():
        state_s[:, :] = state_in[:, :]
        # frame history -> slots 1..K-1 (the uniform shift below moves them
        # to 0..K-2 before the first policy read)
        for p in range(NP):
            for j in range(K - 1):
                frame_s[:, p * KPP + (j + 1) * PP:p * KPP + (j + 2) * PP] = (
                    hist_in[:, p * (K - 1) * PP + j * PP:
                            p * (K - 1) * PP + (j + 1) * PP])
        # zero the fc-input pad tail once (fresh VMEM may hold NaN patterns)
        if n_flat + 16 < kf_pad:
            fcin_s[:, n_flat + 16:] = jnp.zeros((E, kf_pad - n_flat - 16),
                                                jnp.float32).astype(
                fcin_s.dtype if hasattr(fcin_s, "dtype") else jnp.float32)

    st = state_s[:, :]  # (E, RROWS)
    col = lambda i: st[:, i:i + 1]

    # ---- per-env PRNG lanes (same mixing as pallas_env/pallas_policy) -----
    seed = seed_ref[0]
    env0 = (b * E).astype(jnp.uint32)
    raw = jax.lax.broadcasted_iota(jnp.uint32, (E, 1), 0) + env0
    lane_id = _murmur3_fmix(raw ^ _murmur3_fmix(seed.astype(jnp.uint32)))
    base = (k.astype(jnp.uint32) + jnp.uint32(1)) * jnp.uint32(32)

    # ---- camera pose from the live state (vision/camera.camera_pose) ------
    qw, qx, qy, qz = col(6), col(7), col(8), col(9)
    B = [1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qz * qw),
         2 * (qx * qz + qy * qw),
         2 * (qx * qy + qz * qw), 1 - 2 * (qx * qx + qz * qz),
         2 * (qy * qz - qx * qw),
         2 * (qx * qz - qy * qw), 2 * (qy * qz + qx * qw),
         1 - 2 * (qx * qx + qy * qy)]
    m = [float(x) for x in np.asarray(rig.mount_rotation).reshape(-1)]
    rp = [float(x) for x in np.asarray(rig.rel_position).reshape(-1)]
    cR = [B[0] * m[0] + B[1] * m[3] + B[2] * m[6],
          B[0] * m[1] + B[1] * m[4] + B[2] * m[7],
          B[0] * m[2] + B[1] * m[5] + B[2] * m[8],
          B[3] * m[0] + B[4] * m[3] + B[5] * m[6],
          B[3] * m[1] + B[4] * m[4] + B[5] * m[7],
          B[3] * m[2] + B[4] * m[5] + B[5] * m[8],
          B[6] * m[0] + B[7] * m[3] + B[8] * m[6],
          B[6] * m[1] + B[7] * m[4] + B[8] * m[7],
          B[6] * m[2] + B[7] * m[5] + B[8] * m[8]]
    px, py, pz = col(0), col(1), col(2)
    cx = px + B[0] * rp[0] + B[1] * rp[1] + B[2] * rp[2]
    cy = py + B[3] * rp[0] + B[4] * rp[1] + B[5] * rp[2]
    cz = pz + B[6] * rp[0] + B[7] * rp[1] + B[8] * rp[2]
    cam = jnp.concatenate([cx, cy, cz] + cR + [jnp.zeros_like(px)] * 4,
                          axis=1)  # (E, 16)
    wcol = wcol_ref[:, :]

    # ---- moving obstacles: centers at episode time t (render) and t+1
    # (collision — the reference's target.update() -> drone.step() order,
    # multi_race.step / simulator.py:87/110)
    t_now = col(15)

    def _obstacles_at(t):
        out = []
        for s in range(S):
            o = s * 8
            oc = lambda j: ocol_ref[:, o + j:o + j + 1]
            pcx, pcy, pcz = oc(0), oc(1), oc(2)
            pr, res, cnt0 = oc(3), oc(4), oc(5)
            # res >= 1 clamp matches multi_race._obstacles_at (an
            # obstacle_period=0 world must not divide by zero in-kernel)
            res = jnp.maximum(res, 1.0)
            theta = (2.0 * np.pi) * jnp.mod(cnt0 + t, res) / res
            out.append((pcx + pr * jnp.cos(theta),
                        pcy + pr * jnp.sin(theta), pcz,
                        ocol_ref[:, o + 6:o + 7],  # radius
                        jnp.ones_like(pcx)))  # active
        return out

    sph_render = _obstacles_at(t_now) if S else None

    # ---- render the CURRENT frame (patch-major pixel order) ---------------
    rcfg_blk = rcfg._replace(hw=pix_blk)
    for p0 in range(0, hw, pix_blk):
        t_min, _ = _render_tiles(rcfg_blk, dcam_ref[:, p0:p0 + pix_blk],
                                 cam, wcol, spheres_override=sph_render)
        t = jnp.minimum(t_min, jnp.float32(rcfg.max_depth))
        lev = jnp.clip(jnp.floor(255.0 * (1.0 - t / jnp.float32(
            rcfg.max_depth))), 0.0, 255.0)
        cur_s[:, p0:p0 + pix_blk] = lev.astype(jnp.bfloat16)

    # ---- frame stack update (shift + flush + write newest) ----------------
    # flush: a reset at the previous step rewinds the history to the
    # respawn frame (vision_race.step_batched's "fresh" semantics)
    flush = col(21)  # (E, 1) f32 in {0, 1}
    for p in range(NP):
        cur_p = cur_s[:, p * PP:(p + 1) * PP].astype(jnp.float32)
        for j in range(K - 1):
            nxt = frame_s[:, p * KPP + (j + 1) * PP:
                          p * KPP + (j + 2) * PP].astype(jnp.float32)
            frame_s[:, p * KPP + j * PP:p * KPP + (j + 1) * PP] = (
                flush * cur_p + (1.0 - flush) * nxt).astype(jnp.bfloat16)
        frame_s[:, p * KPP + (K - 1) * PP:p * KPP + K * PP] = (
            cur_p.astype(jnp.bfloat16))
    frames_out[0, :, :] = frame_s[:, :]

    # ---- proprio + next-gate onehot ---------------------------------------
    r0 = col(10) * jnp.float32(1.0 / cfg.max_rates)
    r1 = col(11) * jnp.float32(1.0 / cfg.max_rates)
    r2 = col(12) * jnp.float32(1.0 / cfg.max_rates)
    az_n = col(18) * jnp.float32(1.0 / 30.0)
    th_n = col(13) * jnp.float32(1.0 / cfg.max_force)
    ng = col(16)
    masks = [(jnp.abs(ng - g) < 0.5).astype(jnp.float32) for g in range(G)]
    onehot = masks if cfg.gate_onehot else [jnp.zeros_like(ng)
                                            for _ in range(G)]
    zero = jnp.zeros_like(r0)
    prop_cols = [r0, r1, r2, az_n, th_n] + onehot
    pad16 = 16 - len(prop_cols)
    prop16 = jnp.concatenate(prop_cols + [zero] * pad16, axis=1)
    extra_out[0, :, :] = prop16

    # ---- policy forward ----------------------------------------------------
    for p in range(NP):
        embed_s[p * E:(p + 1) * E, :] = (
            frame_s[:, p * KPP:(p + 1) * KPP].astype(jnp.float32)
            / jnp.float32(255.0)).astype(dt)
    emb = jax.lax.dot_general(
        embed_s[:, :], we_ref[:, :], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dt)
    emb = jnp.maximum(emb + be_ref[:, :], 0.0)  # (NP*E, embed)
    if pool > 1:
        for g in range(NPG):
            for j in range(pool):
                pool_s[g * E:(g + 1) * E, j * 128:(j + 1) * 128] = (
                    emb[(g * pool + j) * E:(g * pool + j + 1) * E, :])
        pooled = jax.lax.dot_general(
            pool_s[:, :], wp_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dt)
        pooled = jnp.maximum(pooled + bp_ref[:, :], 0.0)
        for g in range(NPG):
            fcin_s[:, g * 128:(g + 1) * 128] = pooled[g * E:(g + 1) * E, :]
    else:
        for p in range(NP):
            fcin_s[:, p * 128:(p + 1) * 128] = emb[p * E:(p + 1) * E, :]
    fcin_s[:, n_flat:n_flat + 16] = prop16.astype(dt)  # wf rows past the
    #   proprio block are zero
    h = jax.lax.dot_general(
        fcin_s[:, :], wf_ref[:, :], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dt)
    h = jnp.maximum(h + bf_ref[:, :], 0.0)
    mm = jax.lax.dot_general(
        h.astype(jnp.float32), wm_ref[:, :], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bm_ref[:, :]  # (E, 8)

    # ---- Gaussian sample (draws 20-23; resets use 0-5) --------------------
    z0, z1 = _normal_pair(lane_id, base + jnp.uint32(20),
                          base + jnp.uint32(21))
    z2, z3 = _normal_pair(lane_id, base + jnp.uint32(22),
                          base + jnp.uint32(23))
    std = std_ref[:, :]
    a0 = mm[:, 0:1] + std[0, 0] * z0
    a1 = mm[:, 1:2] + std[0, 1] * z1
    a2 = mm[:, 2:3] + std[0, 2] * z2
    a3 = mm[:, 3:4] + std[0, 3] * z3
    value = mm[:, 4:5]
    log_prob = (-0.5 * (z0 * z0 + z1 * z1 + z2 * z2 + z3 * z3)
                - (std[0, 4] + std[0, 5] + std[0, 6] + std[0, 7])
                - jnp.float32(2.0 * np.log(2.0 * np.pi)))

    # ---- env step: physics (obstacles advanced to t+1 for collisions) ----
    sph_phys = _obstacles_at(t_now + 1.0) if S else []
    comps = [col(i) for i in range(15)]
    out = _step_components(params, sph_phys, comps, [a0, a1, a2, a3],
                           cyls=None, with_accel_z=True)
    (npx, npy, npz, nvx, nvy, nvz, nqw, nqx, nqy, nqz,
     nr0, nr1, nr2, nth, crashed, az) = out

    # ---- gate passing + reward (envs/multi_race.step, A == 1) -------------
    off_g = rcfg.n_spheres * 5 + rcfg.n_cylinders * 6
    gx, gy, gz, nx, ny, nz, half = _gate_select(wcol, off_g, masks, G)
    relx, rely, relz = npx - gx, npy - gy, npz - gz
    plane_d = relx * nx + rely * ny + relz * nz
    lat2 = (relx * relx + rely * rely + relz * relz) - plane_d * plane_d
    lateral = jnp.sqrt(jnp.maximum(lat2, 0.0))
    center_d = jnp.sqrt(relx * relx + rely * rely + relz * relz)
    newly_crashed = crashed * (1.0 - col(14))
    passed = ((col(20) < 0).astype(jnp.float32)
              * (plane_d >= 0).astype(jnp.float32)
              * (lateral < half).astype(jnp.float32)
              * (1.0 - crashed))
    ng2 = jnp.mod(ng + passed, jnp.float32(G))
    gates2 = col(19) + passed
    masks2 = [(jnp.abs(ng2 - g) < 0.5).astype(jnp.float32)
              for g in range(G)]
    g2x, g2y, g2z, n2x, n2y, n2z, _ = _gate_select(wcol, off_g, masks2, G)
    r2x, r2y, r2z = npx - g2x, npy - g2y, npz - g2z
    plane_d_new = r2x * n2x + r2y * n2y + r2z * n2z
    center_d_new = jnp.sqrt(r2x * r2x + r2y * r2y + r2z * r2z)
    progress = (1.0 - passed) * (col(17) - center_d)
    reward = (jnp.float32(cfg.w_gate) * passed
              + jnp.float32(cfg.w_progress) * progress
              + jnp.float32(cfg.w_alive) * (1.0 - crashed)
              - jnp.float32(cfg.w_crash) * newly_crashed)
    t_next = t_now + 1.0
    env_done = jnp.maximum(
        crashed, (t_next >= jnp.float32(cfg.max_steps)).astype(jnp.float32))

    aux_out[0, :, :] = jnp.concatenate(
        [a0, a1, a2, a3, reward, env_done, value, log_prob], axis=1)

    # ---- respawn draws (multi_race._sample_drones, A == 1) ----------------
    j0, j1 = _normal_pair(lane_id, base + jnp.uint32(0), base + jnp.uint32(1))
    j2, _ = _normal_pair(lane_id, base + jnp.uint32(2), base + jnp.uint32(3))
    sx = jnp.float32(cfg.track_radius + cfg.spawn_radius) + 0.3 * j0
    sy = jnp.float32(-3.0 - cfg.spawn_radius) + 0.3 * j1
    sz = jnp.float32(cfg.spawn_height) + 0.3 * j2
    # gate 0 distances at the spawn point (multi_race.reset)
    wc = lambda j: wcol[:, j:j + 1]
    g0x, g0y, g0z = wc(off_g + 0), wc(off_g + 1), wc(off_g + 2)
    n0x, n0y, n0z = wc(off_g + 3), wc(off_g + 4), wc(off_g + 5)
    d0x, d0y, d0z = sx - g0x, sy - g0y, sz - g0z
    plane_d0 = d0x * n0x + d0y * n0y + d0z * n0z
    center_d0 = jnp.sqrt(d0x * d0x + d0y * d0y + d0z * d0z)

    zeros = jnp.zeros_like(crashed)
    ones = jnp.ones_like(crashed)
    live = jnp.concatenate(
        [npx, npy, npz, nvx, nvy, nvz, nqw, nqx, nqy, nqz, nr0, nr1, nr2,
         nth, crashed, t_next, ng2, center_d_new, az, gates2, plane_d_new,
         zeros], axis=1)
    reset = jnp.concatenate(
        [sx, sy, sz, zeros, zeros, zeros,
         jnp.full_like(crashed, _SQ2H), zeros, zeros,
         jnp.full_like(crashed, _SQ2H),
         zeros, zeros, zeros, zeros, zeros, zeros, zeros, center_d0, zeros,
         zeros, plane_d0, ones], axis=1)
    nxt = env_done * reset + (1.0 - env_done) * live
    state_s[:, :] = nxt
    state_out[:, :] = nxt


@functools.partial(
    jax.jit,
    static_argnames=("params", "cfg", "rcfg", "rig", "e_blk", "n_steps",
                     "pix_blk", "compute_dtype", "patch_pool", "interpret"))
def _call_race_rollout(params, cfg, rcfg, rig, e_blk, n_steps, pix_blk,
                       compute_dtype, patch_pool, interpret, seed,
                       state_mat, wcol, ocol, hist, dcam,
                       weights: PolicyWeights):
    N = state_mat.shape[0]
    hw = rcfg.hw
    K = cfg.frame_stack
    n_blocks = N // e_blk
    dt = jnp.float32 if compute_dtype is None else compute_dtype
    NP = hw // PP
    kf_pad = weights.wf.shape[0]

    kernel = functools.partial(_kernel, params, cfg, rcfg, rig, e_blk,
                               n_steps, pix_blk, compute_dtype, patch_pool)
    full = lambda a: pl.BlockSpec(a.shape, lambda b, k: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    blk = lambda cols: pl.BlockSpec((e_blk, cols), lambda b, k: (b, 0),
                                    memory_space=pltpu.VMEM)
    step_out = lambda cols: pl.BlockSpec((1, e_blk, cols),
                                         lambda b, k: (k, b, 0),
                                         memory_space=pltpu.VMEM)
    scratch = [
        pltpu.VMEM((e_blk, K * hw), jnp.bfloat16),     # frame stack
        pltpu.VMEM((e_blk, hw), jnp.bfloat16),         # current frame
        pltpu.VMEM((NP * e_blk, K * PP), dt),          # embed input
        pltpu.VMEM((e_blk, kf_pad), dt),               # fc input
        pltpu.VMEM((e_blk, RROWS), jnp.float32),       # state carry
    ]
    if patch_pool > 1:
        scratch.append(pltpu.VMEM(((NP // patch_pool) * e_blk,
                                   patch_pool * 128), dt))
    frames, extra, aux, state_out = pl.pallas_call(
        kernel,
        grid=(n_blocks, n_steps),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  blk(RROWS), blk(wcol.shape[1]), blk(ocol.shape[1]),
                  blk(hist.shape[1]), full(dcam),
                  full(weights.we), full(weights.be), full(weights.wp),
                  full(weights.bp), full(weights.wf), full(weights.bf),
                  full(weights.wm), full(weights.bm), full(weights.std)],
        out_specs=(step_out(K * hw), step_out(16), step_out(8), blk(RROWS)),
        out_shape=(
            jax.ShapeDtypeStruct((n_steps, N, K * hw), jnp.bfloat16),
            jax.ShapeDtypeStruct((n_steps, N, 16), jnp.float32),
            jax.ShapeDtypeStruct((n_steps, N, 8), jnp.float32),
            jax.ShapeDtypeStruct((N, RROWS), jnp.float32),
        ),
        scratch_shapes=scratch,
        interpret=interpret,
    )(jnp.asarray([seed], jnp.int32).reshape(1), state_mat, wcol, ocol,
      hist, dcam, *weights)
    return frames, extra, aux, state_out


# ---------------------------------------------------------------------------
# Host-side wrappers
# ---------------------------------------------------------------------------


def race_state_to_cols(state) -> jnp.ndarray:
    """Batched single-agent MultiRaceState -> (N, RROWS) env-major f32.
    The flush flag starts at 1 only where episode time is 0 (fresh env —
    its stack history is the first frame repeated, which is exactly what
    flushing to the current render produces)."""
    d = state.drones
    sq = lambda x: x[:, 0]  # drop the A == 1 agent axis
    N = d.pos.shape[0]
    return jnp.concatenate([
        sq(d.pos), sq(d.vel), sq(d.att), sq(d.rates),
        sq(d.thrust)[:, None],
        sq(d.done).astype(jnp.float32)[:, None],
        state.t.astype(jnp.float32)[:, None],
        sq(state.next_gate).astype(jnp.float32)[:, None],
        sq(state.prev_center_dist)[:, None],
        sq(d.accel)[:, 2:3],
        sq(state.gates_passed).astype(jnp.float32)[:, None],
        sq(state.prev_gate_dist)[:, None],
        (state.t == 0).astype(jnp.float32)[:, None],
    ], axis=1).astype(jnp.float32)


def _obstacle_cols(world: World, n: int, S: int) -> jnp.ndarray:
    """(n, max(S,1)*8) [path_cx path_cy path_cz path_r res count0 radius 0]
    per obstacle sphere (multi_race.default_world's CircularPath params)."""
    if S == 0:
        return jnp.zeros((n, 8), jnp.float32)
    cols = jnp.concatenate([
        jnp.asarray(world.sphere_path_center, jnp.float32),
        jnp.asarray(world.sphere_path_radius, jnp.float32)[:, None],
        jnp.asarray(world.sphere_path_res, jnp.float32)[:, None],
        jnp.asarray(world.sphere_path_count, jnp.float32)[:, None],
        jnp.asarray(world.sphere_radius, jnp.float32)[:, None],
        jnp.zeros((S, 1), jnp.float32),
    ], axis=1).reshape(1, S * 8)
    return jnp.broadcast_to(cols, (n, S * 8))


def pallas_race_vision_rollout(
    venv,  # envs.vision_race.VisionRaceEnv (single-agent)
    state_cols: jnp.ndarray,  # (N, RROWS)
    hist: jnp.ndarray,  # (N, (K-1)*hw) bf16 patch-major history (newest
    #   last); ignored (dummy (N, 8)) when frame_stack == 1
    world: World,
    weights: PolicyWeights,
    n_steps: int,
    seed,
    e_blk: int = 32,
    compute_dtype=jnp.bfloat16,
    patch_pool: int = 1,
    interpret: bool = False,
):
    """T policy-driven race steps in one kernel.

    Returns (frames (T, N, K*HW) bf16 levels patch-stack-major,
    extra (T, N, 16) [proprio(5), onehot(G), pad], aux (T, N, 8)
    [action(4), reward, done, value, log_prob], state_cols' (N, RROWS))."""
    race = venv.race
    N = state_cols.shape[0]
    rig = venv.rig
    W, H = rig.resolution
    hw = W * H
    K = venv.frame_stack
    S = race.n_obstacles
    assert N % e_blk == 0
    rcfg = _RenderCfg(
        hw=hw, width=W,
        n_spheres=S, n_cylinders=0, n_gates=race.n_gates,
        spheres=S > 0, cylinders=False, ground=True, gates=True,
        max_depth=float(venv.max_depth), ground_extent=None,
        frame_width=float(venv.frame_width),
    )
    cfg = _race_cfg(race, venv.gate_onehot, K)
    wcol = _world_cols(rcfg, world, N)
    ocol = _obstacle_cols(world, N, S)
    dcam = jnp.asarray(patch_major_ray_grid(rig))
    from fpyv_tpu.ops.pallas_policy import _policy_pix_block

    pix_blk = _policy_pix_block(hw, target=1536 if e_blk <= 32 else 768)
    return _call_race_rollout(race.params, cfg, rcfg, rig, e_blk, n_steps,
                              pix_blk, compute_dtype, patch_pool, interpret,
                              seed, state_cols, wcol, ocol, hist, dcam,
                              weights)


# ---------------------------------------------------------------------------
# PPO integration
# ---------------------------------------------------------------------------


def make_kernel_race_ppo_parts(venv, world: World, net, num_envs: int,
                               e_blk: int = 32, interpret: bool = False):
    """Build (apply_fn, make_rollout_fn, obs_from_carry, init_carry) for the
    kernel-rollout vision-RACE trainer (apps/train.train_vision_race
    rollout='kernel').

    The PPO env_state carry is ``(cols (N, RROWS), hist (N, (K-1)*HW) u8)``
    — the frame history must survive rollout boundaries so the stack is
    seamless across iterations (hist is a dummy (N, 8) zeros for K == 1).
    """
    from fpyv_tpu.ops.pallas_policy import build_policy_weights
    from fpyv_tpu.rl.ppo import Transition, gaussian_log_prob

    race = venv.race
    rig = venv.rig
    W, H = rig.resolution
    hw = W * H
    NP = (W // PATCH) * (H // PATCH)
    K = venv.frame_stack
    G = race.n_gates
    assert race.n_agents == 1, \
        "kernel race rollout is single-agent (multi-agent FPV views read " \
        "cross-env opponent positions — scan path)"
    assert race.params.att_mode == "quat"
    assert net.torso == "patch" and net.prepatched and net.embed == 128
    e_blk = min(e_blk, num_envs)

    def apply_fn(params, obs):
        px = obs["pixels"]  # (..., NP*K*64) u8 patch-stack-major flat
        px = px.reshape(px.shape[:-1] + (NP, K * PP))
        return net.apply(params, px, obs["proprio"])

    def obs_from_carry(carry):
        """XLA observation of the carry (GAE bootstrap): render the current
        frame, stack it under the carried history (flush where the last
        step reset), mirror the kernel's patch-stack-major layout."""
        cols, hist = carry
        img, proprio = _render_cols_obs(cols)
        cur = prepatch_pixels(img).reshape(-1, NP, 1, PP)
        if K > 1:
            flush = cols[:, 21] > 0.5
            hist_p = hist.reshape(-1, NP, K - 1, PP)
            hist_p = jnp.where(flush[:, None, None, None],
                               jnp.broadcast_to(cur, hist_p.shape), hist_p)
            stack = jnp.concatenate([hist_p, cur], axis=2)
        else:
            stack = cur
        return {"pixels": stack.reshape(-1, NP * K * PP),
                "proprio": proprio}

    def _render_cols_obs(cols):
        from fpyv_tpu.ops.rotations import quat_to_rotmat
        from fpyv_tpu.vision.camera import camera_pose
        from fpyv_tpu.vision.raycast import render_depth_raycast

        R = quat_to_rotmat(cols[:, 6:10])
        cam_pos, cam_R = camera_pose(rig, cols[:, 0:3], R)
        rworld = world
        include = ("gates", "ground")
        if race.n_obstacles:
            obs_c = jax.vmap(lambda t: race._obstacles_at(world, t))(
                cols[:, 15].astype(jnp.int32))
            rworld = world.replace(
                sphere_center=obs_c,
                sphere_radius=jnp.broadcast_to(
                    world.sphere_radius.astype(jnp.float32), obs_c.shape[:-1]),
                sphere_active=jnp.ones(obs_c.shape[:-1], bool))
            include = ("spheres", "gates", "ground")
        img = render_depth_raycast(
            rig, cam_pos, cam_R, rworld, max_depth=venv.max_depth,
            include=include, frame_width=venv.frame_width)
        mr = float(race.params.max_rates)
        mf = float(race.params.thrust_curve.max_force)
        onehot = jax.nn.one_hot(cols[:, 16].astype(jnp.int32), G,
                                dtype=jnp.float32)
        if not venv.gate_onehot:
            onehot = jnp.zeros_like(onehot)
        proprio = jnp.concatenate(
            [cols[:, 10:13] / mr, cols[:, 18:19] / 30.0,
             cols[:, 13:14] / mf, onehot], axis=1)
        return img, proprio

    def init_carry(keys):
        state, _ = jax.vmap(lambda k: race.reset(k, world))(keys)
        cols = race_state_to_cols(state)
        if K > 1:
            img, _ = _render_cols_obs(cols)
            cur = prepatch_pixels(img).reshape(-1, NP, 1, PP)
            hist = jnp.broadcast_to(cur, (cols.shape[0], NP, K - 1, PP))
            hist = hist.reshape(cols.shape[0], NP * (K - 1) * PP)
            hist = hist.astype(jnp.uint8)
            # history is now materialized: fresh envs need no flush
            cols = cols.at[:, 21].set(0.0)
        else:
            hist = jnp.zeros((cols.shape[0], 8), jnp.uint8)
        return (cols, hist)

    def make_rollout_fn(num_steps: int, compute_dtype=jnp.bfloat16,
                        exact_logprob: bool = True, patch_pool: int = 1):
        def rollout_fn(state):
            key, k_seed = jax.random.split(state.key)
            seed = jax.random.randint(k_seed, (), 0,
                                      jnp.iinfo(jnp.int32).max,
                                      dtype=jnp.int32)
            weights = build_policy_weights(
                state.params, n_patches=NP, compute_dtype=compute_dtype,
                log_std_min=net.log_std_min, log_std_max=net.log_std_max,
                patch_pool=patch_pool)
            cols, hist = state.env_state
            hist_bf = (hist.astype(jnp.bfloat16) if K > 1
                       else jnp.zeros((cols.shape[0], 8), jnp.bfloat16))
            frames, extra, aux, cols_out = pallas_race_vision_rollout(
                venv, cols, hist_bf, world, weights, num_steps, seed,
                e_blk=e_blk, compute_dtype=compute_dtype,
                patch_pool=patch_pool, interpret=interpret)
            T, N = frames.shape[0], frames.shape[1]
            obs = {"pixels": frames.astype(jnp.uint8).reshape(T, N, -1),
                   "proprio": extra[..., :5 + G]}
            action = aux[..., 0:4]
            reward = aux[..., 4]
            done = aux[..., 5] > 0.5  # env reset = termination for the
            #   agent (vision_race.step_batched's crashed|done flag:
            #   bootstrapping across the respawn would corrupt GAE)
            if exact_logprob:
                flat = jax.tree.map(
                    lambda x: x.reshape((-1,) + x.shape[2:]), obs)
                mean, log_std, value = apply_fn(state.params, flat)
                log_prob = gaussian_log_prob(
                    mean, log_std, action.reshape(-1, 4)).reshape(T, N)
                value = value.reshape(T, N)
            else:
                value, log_prob = aux[..., 6], aux[..., 7]
            if K > 1:
                last = frames[-1].reshape(N, NP, K, PP)
                new_hist = last[:, :, 1:, :].reshape(N, -1).astype(jnp.uint8)
            else:
                new_hist = state.env_state[1]
            traj = Transition(obs=obs, action=action, log_prob=log_prob,
                              value=value, reward=reward, done=done)
            carry = (cols_out, new_hist)
            return carry, obs_from_carry(carry), key, traj

        return rollout_fn

    def race_metrics(carry):
        cols, _ = carry
        gates = cols[:, 19]
        t = jnp.maximum(cols[:, 15], 1.0)
        return {
            "mean_gates_passed": gates.mean(),
            "gates_per_100_steps": (gates / t).mean() * 100.0,
        }

    return apply_fn, make_rollout_fn, obs_from_carry, init_carry, race_metrics
