"""Measure the policy-in-kernel vision rollout on the real chip
(VERDICT r3 #1): kernel vs XLA-scan rollout device time (K-sweep slopes),
then short seed-matched trains of every arm for end-to-end trained
env-steps/s.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_kernel_rollout.py
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

OUT = Path(__file__).resolve().parents[1] / "runs" / "r4"
N = 1024


def timed(fn, *args, reps=3):
    jax.block_until_ready(fn(*args))  # compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    from fpyv_tpu.envs.vision_acro import VisionAcroEnv
    from fpyv_tpu.models.policy import PixelActorCritic
    from fpyv_tpu.ops.pallas_policy import (
        acro_state_to_cols, build_policy_weights, make_kernel_vision_ppo_parts,
        pallas_policy_vision_rollout, prepatch_pixels)

    results = {}
    venv = VisionAcroEnv(renderer="raycast", target_only=False,
                         pixel_dtype="u8")
    import dataclasses

    from fpyv_tpu.envs.acro import AcroEnv
    from fpyv_tpu.physics.drone import DroneParams

    venv = dataclasses.replace(
        venv, acro=AcroEnv(params=DroneParams(att_mode="quat")))
    worlds, bank = venv.make_randomized_worlds(jax.random.key(0), N)
    keys = jax.random.split(jax.random.key(1), N)
    state, obs = venv.reset_batched(keys, worlds, bank)
    net = PixelActorCritic(action_dim=4, torso="patch", prepatched=True,
                           compute_dtype=jnp.bfloat16)
    px0 = prepatch_pixels(obs["pixels"][:1]).reshape(1, -1, 64)
    pr0 = jnp.concatenate([obs["rates"][:1], obs["accel_z"][:1],
                           obs["thrust"][:1]], axis=-1)
    params = net.init(jax.random.key(2), px0, pr0)
    cols = acro_state_to_cols(state)
    NPAT = (venv.rig.resolution[0] // 8) * (venv.rig.resolution[1] // 8)

    # ---- 1) raw kernel rollout: device time per T=32 at e_blk sweep --------
    w = build_policy_weights(params, n_patches=NPAT)
    for e_blk in (32, 64, 128):
        try:
            def run(T):
                f, e, a, c = pallas_policy_vision_rollout(
                    venv.acro, venv.rig, cols, worlds, w, T, 7,
                    venv.max_depth, frame_width=venv.frame_width,
                    e_blk=e_blk)
                return a

            t32 = timed(run, 32)
            t96 = timed(run, 96)
            slope = (t96 - t32) / 64 * 32  # device ms per 32-step rollout
            results[f"kernel_rollout_T32_ms_eblk{e_blk}"] = slope * 1e3
            print(f"kernel e_blk={e_blk}: T=32 {t32*1e3:.1f} ms wall, "
                  f"slope {slope*1e3:.1f} ms/32-steps", flush=True)
        except Exception as ex:
            results[f"kernel_rollout_T32_ms_eblk{e_blk}"] = repr(ex)[:300]
            print(f"kernel e_blk={e_blk} FAILED: {ex!r}"[:400], flush=True)

    # ---- 2) XLA scan rollout (policy sample + env step + store) ------------
    std_net = PixelActorCritic(action_dim=4, torso="patch",
                               compute_dtype=jnp.bfloat16)

    def scan_rollout(T):
        def body(c, _):
            st, key = c
            o = venv._obs(st, worlds, bank)
            pr = jnp.concatenate([o["rates"], o["accel_z"], o["thrust"]],
                                 axis=-1)
            key, ka = jax.random.split(key)
            mean, log_std, value = std_net.apply(params, o["pixels"], pr)
            act = mean + jnp.exp(log_std) * jax.random.normal(
                ka, mean.shape, mean.dtype)
            st, _, r, d, info = jax.vmap(
                lambda s, a2, w2: venv.acro.step(s, a2, w2))(st, act, worlds)
            return (st, key), (o["pixels"], act, r, value,
                               info["crashed"])

        (st, _), traj = jax.lax.scan(body, (state, jax.random.key(3)),
                                     None, length=T)
        return traj[2]

    jr = jax.jit(scan_rollout, static_argnums=0)
    t32 = timed(jr, 32)
    t96 = timed(jr, 96)
    slope = (t96 - t32) / 64 * 32
    results["scan_rollout_T32_ms"] = slope * 1e3
    print(f"scan rollout: slope {slope*1e3:.1f} ms/32-steps", flush=True)

    # ---- 3) end-to-end short trains (seed-matched) -------------------------
    from fpyv_tpu.apps.train import train_vision

    for tag, kw in (
        ("scan_e2", dict(rollout="scan", update_epochs=2)),
        ("kernel_e2", dict(rollout="kernel", update_epochs=2)),
        ("scan_e1", dict(rollout="scan", update_epochs=1)),
        ("kernel_e1", dict(rollout="kernel", update_epochs=1)),
    ):
        try:
            res = train_vision(num_envs=N, num_iterations=40, seed=0,
                               scan_chunk=10, print_every=1000, **kw)
            results[f"train_{tag}_steps_per_s"] = res.steps_per_second
            results[f"train_{tag}_reward_last"] = res.mean_reward_last
            print(f"train {tag}: {res.steps_per_second:.0f} steps/s, "
                  f"r {res.mean_reward_first:.4f}->{res.mean_reward_last:.4f}",
                  flush=True)
        except Exception as ex:
            results[f"train_{tag}_steps_per_s"] = repr(ex)[:300]
            print(f"train {tag} FAILED: {ex!r}"[:400], flush=True)

    OUT.mkdir(parents=True, exist_ok=True)
    (OUT / "kernel_bench.json").write_text(json.dumps(results, indent=1))
    print("RESULT", json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
