"""Policy-in-kernel vision PPO rollout: render -> patch-embed policy ->
Gaussian sample -> full acro env step, K steps per launch (VERDICT r3 #1 /
ROADMAP #1).

The round-3 chase megaloop (ops/pallas_vision.pallas_vision_env_rollout)
proved the in-kernel FPV loop wins end-to-end, but its pilot is the
reference guidance law and its frames never leave the chip — useless for
PPO, whose learner must re-see every observation.  This kernel puts the
TRAINED policy in the loop and writes the training data out:

- per step it renders the full-world depth view (same ray math as
  ops/pallas_vision._render_tiles — spheres, cylinders, ground, gates, the
  view of /root/reference/src/core/simulator.py:122), feeds the patch-embed
  actor (models/policy.PixelActorCritic, torso='patch') whose weights ride
  VMEM in bf16, samples a Gaussian action with the in-kernel counter PRNG,
  and advances the full AcroEnv semantics (reward, truncation, auto-reset —
  the same distributions as ops/pallas_env);
- frames (integer uint8 levels, stored f32 and cast outside), normalized
  proprio, sampled actions, rewards and termination flags stream to HBM per
  step — everything PPO's learner needs.  Values and log-probs are NOT
  computed in-kernel: the learner recomputes both in ONE batched (T*N)
  forward (an MXU-friendlier shape than per-step calls), which also makes
  the epoch-0 importance ratio exactly 1 by construction.

Layout — different from the chase kernel, for the matmuls' sake:

  The grid is (env_block, step) with the step axis innermost; each program
  advances E envs ONE step, carrying state in a persistent VMEM scratch
  (re-initialized when step == 0).  State is ENV-MAJOR — an (E, ROWS) tile
  whose columns are components — because the policy's fc contraction wants
  env-major activations: with E envs per block the fc matmul is
  (E, 13952) @ (13952, 256), M = E rows of the MXU, not the (8, ...)
  sublane tiles of the physics kernels (an 8-env fc would run the MXU at
  6% row occupancy).  The physics runs on (E, 1) column slices through the
  SAME :func:`fpyv_tpu.ops.pallas_step._step_components` math as every
  other kernel (layout-agnostic core), with per-env world scalars read from
  the render's wcol columns — per-env randomized worlds (the trainer's
  default) work in-kernel for both rendering and collisions.

  Frames are rendered in PATCH-MAJOR pixel order (the host permutes the
  camera-frame ray grid once), so the patch-embed input is a static
  column-block copy instead of an in-kernel transpose; stored rollout
  pixels stay in that order and the learner's net consumes them with
  ``PixelActorCritic(prepatched=True)`` (identical parameters — the embed
  contraction sees the same 64 pixels either way).

Support matrix (asserted): torso='patch', patch=8, embed=128, single fc
hidden layer, single-frame obs, quat attitude, f32, no DomainRand/wind
(the vision trainer's defaults), static targets (the vision trainer never
advances paths mid-rollout — worlds ride the carry unchanged).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fpyv_tpu.envs.acro import AcroEnv
from fpyv_tpu.ops.pallas_env import _murmur3_fmix, _normal_pair, _uniform_01
from fpyv_tpu.ops.pallas_step import _step_components
from fpyv_tpu.ops.pallas_vision import (
    _RenderCfg,
    _render_tiles,
    _world_cols,
)
from fpyv_tpu.physics.world import World
from fpyv_tpu.vision.camera import CameraRig
from fpyv_tpu.vision.raycast import pixel_ray_grid

# env-major state columns
ROWS = 18  # 0:3 pos, 3:6 vel, 6:10 quat, 10:13 rates, 13 thrust, 14 done,
#            15 t, 16 prev_dist, 17 accel_z
PATCH = 8
PP = PATCH * PATCH  # pixels per patch (the embed contraction)
_DEG2RAD = np.pi / 180.0


def patch_major_ray_grid(rig: CameraRig) -> np.ndarray:
    """(3, H*W) camera-frame ray dirs permuted to patch-major pixel order:
    patches row-major over the (H/8, W/8) grid, pixels row-major within
    each patch — exactly the net's own space-to-depth order
    (models/policy.PixelActorCritic patch torso)."""
    d = pixel_ray_grid(rig)  # (3, H, W)
    W, H = rig.resolution
    d = d.reshape(3, H // PATCH, PATCH, W // PATCH, PATCH)
    d = np.moveaxis(d, 2, 3)  # (3, H/8, W/8, 8, 8)
    return np.ascontiguousarray(d.reshape(3, -1))


def prepatch_pixels(img: jnp.ndarray) -> jnp.ndarray:
    """Row-major (..., H, W) image -> patch-major flat (..., NP*64): the
    XLA-side twin of the kernel's frame order (used for the bootstrap
    observation the kernel does not render)."""
    H, W = img.shape[-2], img.shape[-1]
    lead = img.shape[:-2]
    x = img.reshape(lead + (H // PATCH, PATCH, W // PATCH, PATCH))
    x = jnp.moveaxis(x, -3, -2)
    return x.reshape(lead + ((H // PATCH) * (W // PATCH) * PP,))


class PolicyWeights(NamedTuple):
    """Actor weights flattened for VMEM residency (built per call from the
    live PPO params — cheap relative to the rollout)."""

    we: jnp.ndarray  # (PP, embed)
    be: jnp.ndarray  # (1, embed)
    wp: jnp.ndarray  # (pool*embed, embed) pooled-patch mixer — or an
    #                    (8, embed) zero dummy when patch_pool == 1 (kept in
    #                    the tuple so the kernel arity is static)
    bp: jnp.ndarray  # (1, embed) (dummy zeros when patch_pool == 1)
    wf: jnp.ndarray  # (KF_pad, hidden) — rows [patch-flat, proprio, 0-pad]
    bf: jnp.ndarray  # (1, hidden)
    wm: jnp.ndarray  # (hidden, 8) f32 — cols 0:4 = pi_mean, col 4 = v_out
    bm: jnp.ndarray  # (1, 8) f32 — same column layout
    std: jnp.ndarray  # (1, 8) f32 — cols 0:4 exp(clipped log_std),
    #                    cols 4:8 the clipped log_std itself (for the
    #                    in-kernel log_prob)


def build_policy_weights(params, n_patches: int, compute_dtype=jnp.bfloat16,
                         log_std_min: float = -5.0,
                         log_std_max: float = 1.5,
                         patch_pool: int = 1) -> PolicyWeights:
    p = params["params"] if "params" in params else params
    dt = jnp.float32 if compute_dtype is None else compute_dtype
    we = p["patch_embed"]["kernel"].astype(dt)
    be = p["patch_embed"]["bias"].astype(dt)[None, :]
    embed = we.shape[1]
    if patch_pool > 1:
        wp = p["patch_pool"]["kernel"].astype(dt)
        bp = p["patch_pool"]["bias"].astype(dt)[None, :]
        assert wp.shape == (patch_pool * embed, embed)
    else:
        wp = jnp.zeros((8, embed), dt)
        bp = jnp.zeros((1, embed), dt)
    wf_raw = p["fc0"]["kernel"]  # (NP*embed + P_prop, hidden)
    kf = wf_raw.shape[0]
    kf_pad = -(-kf // 128) * 128
    wf = jnp.zeros((kf_pad, wf_raw.shape[1]), dt).at[:kf].set(
        wf_raw.astype(dt))
    bf = p["fc0"]["bias"].astype(dt)[None, :]
    wm_raw = p["pi_mean"]["kernel"].astype(jnp.float32)  # (hidden, 4)
    wm = jnp.zeros((wm_raw.shape[0], 8), jnp.float32).at[:, :4].set(wm_raw)
    wm = wm.at[:, 4].set(p["v_out"]["kernel"].astype(jnp.float32)[:, 0])
    bm = jnp.zeros((1, 8), jnp.float32).at[0, :4].set(
        p["pi_mean"]["bias"].astype(jnp.float32))
    bm = bm.at[0, 4].set(p["v_out"]["bias"].astype(jnp.float32)[0])
    log_std = jnp.clip(p["log_std"].astype(jnp.float32), log_std_min,
                       log_std_max)
    std = jnp.zeros((1, 8), jnp.float32).at[0, :4].set(jnp.exp(log_std))
    std = std.at[0, 4:8].set(log_std)
    return PolicyWeights(we=we, be=be, wp=wp, bp=bp, wf=wf, bf=bf, wm=wm,
                         bm=bm, std=std)


class _EnvCfg(NamedTuple):
    """Static AcroEnv reward/reset scalars (hashable, baked into kernel)."""

    pos_low: Tuple[float, float, float]
    pos_high: Tuple[float, float, float]
    vel_scale: float
    ypr_range: float
    max_steps: int
    w_progress: float
    w_alive: float
    w_crash: float
    w_rates: float
    max_rates: float
    max_force: float


def _acro_cfg(env: AcroEnv) -> _EnvCfg:
    return _EnvCfg(
        pos_low=tuple(float(x) for x in env.pos_low),
        pos_high=tuple(float(x) for x in env.pos_high),
        vel_scale=float(env.vel_scale),
        ypr_range=float(env.ypr_range_deg),
        max_steps=int(env.max_episode_steps),
        w_progress=float(env.w_progress),
        w_alive=float(env.w_alive),
        w_crash=float(env.w_crash),
        w_rates=float(env.w_rates),
        max_rates=float(env.params.max_rates),
        max_force=float(env.params.thrust_curve.max_force),
    )


def _kernel(params, ecfg: _EnvCfg, rcfg: _RenderCfg, rig: CameraRig,
            e_blk: int, n_steps: int, pix_blk: int, compute_dtype, pool: int,
            # refs
            seed_ref, state_in, wcol_ref, dcam_ref,
            we_ref, be_ref, wp_ref, bp_ref, wf_ref, bf_ref, wm_ref, bm_ref,
            std_ref, frames_out, extra_out, aux_out, state_out,
            frame_s, embed_s, fcin_s, state_s, pool_s=None):
    E = e_blk
    hw = rcfg.hw
    NP = hw // PP
    NPG = NP // pool  # fc patch blocks after pooling (== NP when pool == 1)
    b = pl.program_id(0)
    k = pl.program_id(1)
    dt = jnp.float32 if compute_dtype is None else compute_dtype

    kf_pad = wf_ref.shape[0]
    NP_flat = NPG * 128

    @pl.when(k == 0)
    def _():
        state_s[:, :] = state_in[:, :]
        # zero the fc-input pad tail once: fresh VMEM scratch may hold
        # NaN/Inf bit patterns, and 0-weight x NaN garbage is NaN, not 0
        if NP_flat + 8 < kf_pad:
            fcin_s[:, NP_flat + 8:] = jnp.zeros(
                (E, kf_pad - NP_flat - 8),
                fcin_s.dtype if hasattr(fcin_s, "dtype") else jnp.float32)

    st = state_s[:, :]  # (E, ROWS)
    col = lambda i: st[:, i:i + 1]

    # ---- per-env PRNG lane ids (globally unique, matching pallas_env's
    # seed-mixing so streams are deterministic per (seed, env))
    seed = seed_ref[0]
    env0 = (b * E).astype(jnp.uint32)
    raw = jax.lax.broadcasted_iota(jnp.uint32, (E, 1), 0) + env0
    lane_id = _murmur3_fmix(raw ^ _murmur3_fmix(seed.astype(jnp.uint32)))

    # ---- camera pose from the live state (components.py:501-503) ----------
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
    wcol = wcol_ref[:, :]  # (E, WCOLS)

    # ---- render (patch-major pixel order), obs LEVELS in [0, 255] ---------
    rcfg_blk = rcfg._replace(hw=pix_blk)
    for p0 in range(0, hw, pix_blk):
        t_min, _ = _render_tiles(rcfg_blk, dcam_ref[:, p0:p0 + pix_blk],
                                 cam, wcol)
        # uint8 depth levels as exact f32 integers (components.py:626-628);
        # the learner recomputes levels/255 from the uint8 cast, so the
        # POLICY input below divides by 255.0 the same way — bit-identical
        t = jnp.minimum(t_min, jnp.float32(rcfg.max_depth))
        lev = jnp.clip(jnp.floor(255.0 * (1.0 - t / jnp.float32(
            rcfg.max_depth))), 0.0, 255.0)
        # integer levels <= 255 are EXACT in bf16 (8 significand bits), so
        # bf16 frame storage halves both the scratch and the HBM stream
        frame_s[:, p0:p0 + pix_blk] = lev.astype(jnp.bfloat16)
        frames_out[0, :, p0:p0 + pix_blk] = lev.astype(jnp.bfloat16)

    # ---- proprio (env._obs normalization) + store --------------------------
    r0 = col(10) * jnp.float32(1.0 / ecfg.max_rates)
    r1 = col(11) * jnp.float32(1.0 / ecfg.max_rates)
    r2 = col(12) * jnp.float32(1.0 / ecfg.max_rates)
    az_n = col(17) * jnp.float32(1.0 / 30.0)
    th_n = col(13) * jnp.float32(1.0 / ecfg.max_force)
    zero = jnp.zeros_like(r0)
    extra_out[0, :, :] = jnp.concatenate(
        [r0, r1, r2, az_n, th_n, zero, zero, zero], axis=1)

    # ---- policy forward ----------------------------------------------------
    # patchify: static column-block copies into (NP*E, PP) bf16
    for p in range(NP):
        # via f32 DIVISION so the policy sees bit-identical values to the
        # learner's u8.astype(f32)/255.0 (a reciprocal multiply differs in
        # the last ulp for some levels)
        embed_s[p * E:(p + 1) * E, :] = (
            frame_s[:, p * PP:(p + 1) * PP].astype(jnp.float32)
            / jnp.float32(255.0)).astype(dt)
    emb = jax.lax.dot_general(
        embed_s[:, :], we_ref[:, :], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dt)
    emb = jnp.maximum(emb + be_ref[:, :], 0.0)  # (NP*E, embed) relu
    if pool > 1:
        # pooled-patch mixing (models/policy.PixelActorCritic patch_pool):
        # group `pool` consecutive patches (patch-major order — the same
        # grouping the net's reshape produces), concat their embeds, one
        # Dense(embed) per group. The fc contraction shrinks pool-fold.
        for g in range(NPG):
            for j in range(pool):
                pool_s[g * E:(g + 1) * E, j * 128:(j + 1) * 128] = (
                    emb[(g * pool + j) * E:(g * pool + j + 1) * E, :])
        pooled = jax.lax.dot_general(
            pool_s[:, :], wp_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dt)
        pooled = jnp.maximum(pooled + bp_ref[:, :], 0.0)  # (NPG*E, embed)
        for g in range(NPG):
            fcin_s[:, g * 128:(g + 1) * 128] = pooled[g * E:(g + 1) * E, :]
    else:
        for p in range(NP):
            fcin_s[:, p * 128:(p + 1) * 128] = emb[p * E:(p + 1) * E, :]
    n_flat = NPG * 128
    # 8-wide aligned store (13824 is 128-aligned); wf rows past the real
    # proprio rows are zero, so the 3 pad columns contribute nothing
    prop = jnp.concatenate([r0, r1, r2, az_n, th_n, zero, zero, zero],
                           axis=1).astype(dt)
    fcin_s[:, n_flat:n_flat + 8] = prop
    h = jax.lax.dot_general(
        fcin_s[:, :], wf_ref[:, :], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dt)
    h = jnp.maximum(h + bf_ref[:, :], 0.0)  # (E, hidden)
    mm = jax.lax.dot_general(
        h.astype(jnp.float32), wm_ref[:, :], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bm_ref[:, :]  # (E, 8)

    # ---- Gaussian sample (counter PRNG; draws 20-23 of this step's stride,
    # disjoint from the reset draws 0-9 below)
    base = (k.astype(jnp.uint32) + jnp.uint32(1)) * jnp.uint32(32)
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
    # rollout-time log N(a | mean, std): the z draws ARE the normalized
    # residuals, so lp = sum(-z^2/2 - log_std) - 2 log(2 pi)
    log_prob = (-0.5 * (z0 * z0 + z1 * z1 + z2 * z2 + z3 * z3)
                - (std[0, 4] + std[0, 5] + std[0, 6] + std[0, 7])
                - jnp.float32(2.0 * np.log(2.0 * np.pi)))

    # ---- env step: physics via the layout-agnostic core, per-env world ----
    wc = lambda j: wcol[:, j:j + 1]
    S, C = rcfg.n_spheres, rcfg.n_cylinders
    spheres = [(wc(s * 5 + 0), wc(s * 5 + 1), wc(s * 5 + 2), wc(s * 5 + 3),
                wc(s * 5 + 4)) for s in range(S)]
    off_c = S * 5
    cyls = [(wc(off_c + c * 6 + 0), wc(off_c + c * 6 + 1),
             wc(off_c + c * 6 + 2), wc(off_c + c * 6 + 3),
             wc(off_c + c * 6 + 4), wc(off_c + c * 6 + 5))
            for c in range(C)] or None
    comps = [col(i) for i in range(15)]
    out = _step_components(params, spheres, comps, [a0, a1, a2, a3],
                           cyls=cyls, with_accel_z=True)
    (npx, npy, npz, nvx, nvy, nvz, nqw, nqx, nqy, nqz,
     nr0, nr1, nr2, nth, crashed, az) = out

    # ---- reward / truncation (AcroEnv.step semantics) ----------------------
    tx, ty, tz = spheres[0][0], spheres[0][1], spheres[0][2]
    ddx, ddy, ddz = npx - tx, npy - ty, npz - tz
    dist = jnp.sqrt(ddx * ddx + ddy * ddy + ddz * ddz)
    prev_dist = col(16)
    rates_pen = a0 * a0 + a1 * a1 + a2 * a2
    reward = (jnp.float32(ecfg.w_progress) * (prev_dist - dist)
              + jnp.float32(ecfg.w_alive)
              - jnp.float32(ecfg.w_crash) * crashed
              - jnp.float32(ecfg.w_rates) * rates_pen)
    t_next = col(15) + 1.0
    truncated = (t_next >= jnp.float32(ecfg.max_steps)).astype(jnp.float32)
    done = jnp.maximum(crashed, truncated)

    aux_out[0, :, :] = jnp.concatenate(
        [a0, a1, a2, a3, reward, crashed, value, log_prob], axis=1)

    # ---- auto-reset draws (AcroEnv._sample_drone; draws 0-9) ---------------
    def u(d):
        return _uniform_01(lane_id, base + jnp.uint32(d))

    lo, hi = ecfg.pos_low, ecfg.pos_high
    rpx = jnp.float32(lo[0]) + u(0) * jnp.float32(hi[0] - lo[0])
    rpy = jnp.float32(lo[1]) + u(1) * jnp.float32(hi[1] - lo[1])
    rpz = jnp.float32(lo[2]) + u(2) * jnp.float32(hi[2] - lo[2])
    g0, g1 = _normal_pair(lane_id, base + jnp.uint32(3), base + jnp.uint32(4))
    g2, _ = _normal_pair(lane_id, base + jnp.uint32(5), base + jnp.uint32(6))
    vs = jnp.float32(ecfg.vel_scale)
    half = jnp.float32(0.5 * _DEG2RAD * ecfg.ypr_range)
    h0 = (2.0 * u(7) - 1.0) * half
    h1 = (2.0 * u(8) - 1.0) * half
    h2 = (2.0 * u(9) - 1.0) * half
    cr, sr = jnp.cos(h0), jnp.sin(h0)
    cp, sp = jnp.cos(h1), jnp.sin(h1)
    cy_, sy_ = jnp.cos(h2), jnp.sin(h2)
    rqw = cy_ * cp * cr + sy_ * sp * sr
    rqx = cy_ * cp * sr - sy_ * sp * cr
    rqy = cy_ * sp * cr + sy_ * cp * sr
    rqz = sy_ * cp * cr - cy_ * sp * sr
    rdx, rdy, rdz = rpx - tx, rpy - ty, rpz - tz
    dist_r = jnp.sqrt(rdx * rdx + rdy * rdy + rdz * rdz)

    zeros = jnp.zeros_like(crashed)
    live = jnp.concatenate(
        [npx, npy, npz, nvx, nvy, nvz, nqw, nqx, nqy, nqz, nr0, nr1, nr2,
         nth, zeros, t_next, dist, az], axis=1)
    reset = jnp.concatenate(
        [rpx, rpy, rpz, vs * g0, vs * g1, vs * g2, rqw, rqx, rqy, rqz,
         zeros, zeros, zeros, zeros, zeros, zeros, dist_r, zeros], axis=1)
    nxt = jnp.where(done > 0.5, reset, live)
    state_s[:, :] = nxt
    state_out[:, :] = nxt


@functools.partial(
    jax.jit,
    static_argnames=("params", "ecfg", "rcfg", "rig", "e_blk", "n_steps",
                     "pix_blk", "compute_dtype", "patch_pool", "interpret"))
def _call_policy_rollout(params, ecfg, rcfg, rig, e_blk, n_steps, pix_blk,
                         compute_dtype, patch_pool, interpret, seed,
                         state_mat, wcol, dcam, weights: PolicyWeights):
    N = state_mat.shape[0]
    hw = rcfg.hw
    n_blocks = N // e_blk
    dt = jnp.float32 if compute_dtype is None else compute_dtype
    NP = hw // PP
    kf_pad = weights.wf.shape[0]
    hidden = weights.wf.shape[1]
    kernel = functools.partial(_kernel, params, ecfg, rcfg, rig, e_blk,
                               n_steps, pix_blk, compute_dtype, patch_pool)
    full = lambda a: pl.BlockSpec(a.shape, lambda b, k: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    blk_state = pl.BlockSpec((e_blk, ROWS), lambda b, k: (b, 0),
                             memory_space=pltpu.VMEM)
    blk_wcol = pl.BlockSpec((e_blk, wcol.shape[1]), lambda b, k: (b, 0),
                            memory_space=pltpu.VMEM)
    step_out = lambda cols: pl.BlockSpec((1, e_blk, cols),
                                         lambda b, k: (k, b, 0),
                                         memory_space=pltpu.VMEM)
    scratch = [
        pltpu.VMEM((e_blk, hw), jnp.bfloat16),         # frame
        pltpu.VMEM((NP * e_blk, PP), dt),              # embed input
        pltpu.VMEM((e_blk, kf_pad), dt),               # fc input
        pltpu.VMEM((e_blk, ROWS), jnp.float32),        # state carry
    ]
    if patch_pool > 1:
        scratch.append(pltpu.VMEM(((NP // patch_pool) * e_blk,
                                   patch_pool * 128), dt))  # pool input
    frames, extra, aux, state_out = pl.pallas_call(
        kernel,
        grid=(n_blocks, n_steps),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  blk_state, blk_wcol, full(dcam),
                  full(weights.we), full(weights.be), full(weights.wp),
                  full(weights.bp), full(weights.wf),
                  full(weights.bf), full(weights.wm), full(weights.bm),
                  full(weights.std)],
        out_specs=(step_out(hw), step_out(8), step_out(8), blk_state),
        out_shape=(
            jax.ShapeDtypeStruct((n_steps, N, hw), jnp.bfloat16),
            jax.ShapeDtypeStruct((n_steps, N, 8), jnp.float32),
            jax.ShapeDtypeStruct((n_steps, N, 8), jnp.float32),
            jax.ShapeDtypeStruct((N, ROWS), jnp.float32),
        ),
        scratch_shapes=scratch,
        interpret=interpret,
    )(jnp.asarray([seed], jnp.int32).reshape(1), state_mat, wcol, dcam,
      *weights)
    return frames, extra, aux, state_out


# ---------------------------------------------------------------------------
# Host-side wrappers
# ---------------------------------------------------------------------------


def acro_state_to_cols(state) -> jnp.ndarray:
    """AcroState (batched, quat mode) -> (N, ROWS) env-major f32 matrix."""
    d = state.drone
    return jnp.concatenate([
        d.pos, d.vel, d.att, d.rates, d.thrust[:, None],
        d.done.astype(jnp.float32)[:, None],
        state.t.astype(jnp.float32)[:, None],
        state.prev_dist[:, None],
        d.accel[:, 2:3],
    ], axis=1).astype(jnp.float32)


def cols_to_acro_state(mat: jnp.ndarray, template):
    """(N, ROWS) -> AcroState (accel carries only its z; x/y unobserved)."""
    d = template.drone
    az = mat[:, 17]
    accel = jnp.zeros_like(d.accel).at[:, 2].set(az)
    return template.replace(
        drone=d.replace(
            pos=mat[:, 0:3], vel=mat[:, 3:6], att=mat[:, 6:10],
            rates=mat[:, 10:13], thrust=mat[:, 13], accel=accel,
            done=mat[:, 14] > 0.5),
        t=mat[:, 15].astype(jnp.int32),
        prev_dist=mat[:, 16],
    )


def policy_rollout_supported(env, world: World) -> bool:
    import numpy as _np

    return (
        env.params.att_mode == "quat"
        and not env.randomize
        and float(env.wind_scale) == 0.0
        and all(w == 0.0 for w in env.wind)
        and bool(_np.asarray(world.has_ground).all())
    )


def pallas_policy_vision_rollout(
    env: AcroEnv,
    rig: CameraRig,
    state_cols: jnp.ndarray,  # (N, ROWS) from acro_state_to_cols
    worlds: World,  # per-env batched (or shared) world
    weights: PolicyWeights,
    n_steps: int,
    seed,
    max_depth: float,
    include=("spheres", "cylinders", "ground", "gates"),
    ground_extent: Optional[float] = None,
    frame_width: float = 0.08,
    e_blk: int = 32,
    compute_dtype=jnp.bfloat16,
    patch_pool: int = 1,
    interpret: bool = False,
):
    """K policy-driven env steps in one kernel.

    Returns (frames_levels (K, N, HW) f32 in [0, 255] patch-major,
    obs_extra (K, N, 8) [rates/max(3), accel_z/30, thrust/max, pad],
    aux (K, N, 8) [action(4), reward, crashed, truncated, pad],
    state_cols' (N, ROWS)).
    """
    N = state_cols.shape[0]
    W, H = rig.resolution
    hw = W * H
    assert N % e_blk == 0, "N must divide the env block size"
    assert hw % PP == 0 and (W % PATCH == 0) and (H % PATCH == 0)
    rcfg = _RenderCfg(
        hw=hw, width=W,
        n_spheres=int(worlds.num_spheres),
        n_cylinders=int(worlds.num_cylinders),
        n_gates=int(worlds.num_gates),
        spheres="spheres" in include, cylinders="cylinders" in include,
        ground="ground" in include, gates="gates" in include,
        max_depth=float(max_depth),
        ground_extent=(None if ground_extent is None
                       else float(ground_extent)),
        frame_width=float(frame_width),
    )
    wcol = _world_cols(rcfg, worlds, N)
    dcam = jnp.asarray(patch_major_ray_grid(rig))
    pix_blk = _policy_pix_block(hw, target=1536 if e_blk <= 32 else 768)
    return _call_policy_rollout(env.params, _acro_cfg(env), rcfg, rig,
                                e_blk, n_steps, pix_blk, compute_dtype,
                                patch_pool, interpret, seed, state_cols,
                                wcol, dcam, weights)


def _policy_pix_block(hw: int, target: int = 1536) -> int:
    """Largest divisor of hw (<= target) aligned to BOTH the 128-lane
    tiling and the 64-px patch boundary — lcm(128, 64) = 128 — so the
    render tiles and the patchify copies stay static slices. Larger env
    blocks pass a smaller target to keep the render's live intermediates
    inside the VMEM budget."""
    align = np.lcm(128, PP)
    best = align
    for blk in range(align, min(hw, target) + 1, align):
        if hw % blk == 0:
            best = blk
    return best


# ---------------------------------------------------------------------------
# PPO integration: a rollout_fn for rl.ppo.make_ppo
# ---------------------------------------------------------------------------


def make_kernel_vision_ppo_parts(venv, worlds: World, net, num_envs: int,
                                 e_blk: int = 32, interpret: bool = False):
    """Build (apply_fn, rollout_fn, reset_carry) for a kernel-rollout
    vision PPO trainer (apps/train.train_vision rollout='kernel').

    - ``apply_fn(params, obs)`` consumes the kernel's obs pytree
      {pixels: (..., NP*64) u8 patch-major flat, proprio: (..., 5)} through
      a ``prepatched=True`` PixelActorCritic — same parameters as the
      standard net.
    - ``rollout_fn(state)`` runs K env steps in ONE pallas launch
      (:func:`pallas_policy_vision_rollout`) and recomputes log_prob/value
      with a single batched (T*N) forward, so the epoch-0 importance ratio
      is exactly 1.
    - the PPO env_state carry is the raw (N, ROWS) env-major state matrix.
    """
    from fpyv_tpu.rl.ppo import Transition, gaussian_log_prob

    env = venv.acro
    rig = venv.rig
    e_blk = min(e_blk, num_envs)
    include = ("spheres", "cylinders", "ground", "gates")
    assert policy_rollout_supported(env, worlds), \
        "kernel rollout needs quat/f32/no-DR/no-wind acro env"
    assert net.torso == "patch" and net.prepatched, \
        "kernel rollout pairs with PixelActorCritic(torso='patch', " \
        "prepatched=True)"

    def apply_fn(params, obs):
        px = obs["pixels"]
        px = px.reshape(px.shape[:-1] + (px.shape[-1] // PP, PP))
        return net.apply(params, px, obs["proprio"])

    def obs_from_cols(cols):
        """XLA-side observation of a state matrix (the GAE bootstrap obs —
        the one frame per iteration the kernel does not emit)."""
        from fpyv_tpu.ops.rotations import quat_to_rotmat
        from fpyv_tpu.vision.camera import camera_pose
        from fpyv_tpu.vision.raycast import render_depth_raycast

        R = quat_to_rotmat(cols[:, 6:10])
        cam_pos, cam_R = camera_pose(rig, cols[:, 0:3], R)
        img = render_depth_raycast(
            rig, cam_pos, cam_R, worlds, max_depth=venv.max_depth,
            include=include, ground_extent=venv.ground_extent,
            frame_width=venv.frame_width)
        mr = float(env.params.max_rates)
        mf = float(env.params.thrust_curve.max_force)
        proprio = jnp.concatenate(
            [cols[:, 10:13] / mr, cols[:, 17:18] / 30.0,
             cols[:, 13:14] / mf], axis=1)
        return {"pixels": prepatch_pixels(img), "proprio": proprio}

    def make_rollout_fn(num_steps: int, compute_dtype=jnp.bfloat16,
                        exact_logprob: bool = True):
        """``exact_logprob=True`` recomputes log_prob/value with the XLA
        forward over the stored obs (epoch-0 importance ratio exactly 1 —
        the default); False trusts the kernel's own emissions (saves one
        (T*N) forward per iteration; the ratio then differs from 1 only by
        the bf16 accumulation-order delta between the kernel and XLA
        forwards of the same weights)."""
        def rollout_fn(state):
            key, k_seed = jax.random.split(state.key)
            seed = jax.random.randint(k_seed, (), 0, jnp.iinfo(jnp.int32).max,
                                      dtype=jnp.int32)
            weights = build_policy_weights(
                state.params, n_patches=(rig.resolution[0] // PATCH)
                * (rig.resolution[1] // PATCH),
                compute_dtype=compute_dtype,
                log_std_min=net.log_std_min, log_std_max=net.log_std_max,
                patch_pool=net.patch_pool)
            frames, extra, aux, cols_out = pallas_policy_vision_rollout(
                env, rig, state.env_state, worlds, weights, num_steps,
                seed, venv.max_depth, include=include,
                ground_extent=venv.ground_extent,
                frame_width=venv.frame_width, e_blk=e_blk,
                compute_dtype=compute_dtype, patch_pool=net.patch_pool,
                interpret=interpret)
            obs = {"pixels": frames.astype(jnp.uint8),
                   "proprio": extra[..., :5]}
            action = aux[..., 0:4]
            reward = aux[..., 4]
            done = aux[..., 5] > 0.5  # terminations only (GAE bootstraps
            #                           across time-limit truncations)
            T, N = frames.shape[0], frames.shape[1]
            if exact_logprob:
                flat = jax.tree.map(
                    lambda x: x.reshape((-1,) + x.shape[2:]), obs)
                mean, log_std, value = apply_fn(state.params, flat)
                log_prob = gaussian_log_prob(
                    mean, log_std, action.reshape(-1, 4)).reshape(T, N)
                value = value.reshape(T, N)
            else:
                value, log_prob = aux[..., 6], aux[..., 7]
            traj = Transition(
                obs=obs, action=action, log_prob=log_prob,
                value=value, reward=reward, done=done)
            return cols_out, obs_from_cols(cols_out), key, traj

        return rollout_fn

    return apply_fn, make_rollout_fn, obs_from_cols
