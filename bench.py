"""Benchmark: env-steps/s/chip at 4096 envs (BASELINE.json metric).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.
vs_baseline is measured throughput / the 5M env-steps/s/chip north star.

The benched program is the full acro drone env step — motor curve, quadratic
drag, motor-point collisions vs (target sphere + ground), double-rotation
attitude update, auto-reset, reward — scanned K steps per device call.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

N_ENVS = 4096
SCAN_STEPS = 1000
REPEATS = 5
BASELINE_STEPS_PER_S = 5_000_000.0  # BASELINE.json north star


def build():
    from fpyv_tpu.envs.acro import AcroEnv
    from fpyv_tpu.physics.drone import DroneParams
    from fpyv_tpu.physics.world import update_targets

    env = AcroEnv(params=DroneParams(att_mode="quat"))
    world = env.default_world()

    keys = jax.random.split(jax.random.key(0), N_ENVS)
    state, obs = jax.vmap(lambda k: env.reset(k, world))(keys)

    action = jnp.zeros((N_ENVS, 4), jnp.float32).at[:, 3].set(-0.6)

    @jax.jit
    def run(state, world):
        def body(carry, _):
            st, w = carry
            w = update_targets(w)
            st, obs, reward, done, _ = jax.vmap(
                lambda s, a: env.step(s, a, w))(st, action)
            return (st, w), reward[0]

        (state, world), r = jax.lax.scan(body, (state, world), None,
                                         length=SCAN_STEPS)
        return state, world, r

    return run, state, world


def main():
    run, state, world = build()
    # warmup/compile
    state, world, r = run(state, world)
    jax.block_until_ready(r)

    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        state, world, r = run(state, world)
        jax.block_until_ready(r)
        times.append(time.perf_counter() - t0)

    best = min(times)
    steps_per_s = N_ENVS * SCAN_STEPS / best
    print(json.dumps({
        "metric": f"acro-env steps/s/chip at {N_ENVS} envs",
        "value": round(steps_per_s),
        "unit": "env-steps/s",
        "vs_baseline": round(steps_per_s / BASELINE_STEPS_PER_S, 4),
    }))


if __name__ == "__main__":
    main()
