"""Benchmark: env-steps/s/chip at 4096 envs (BASELINE.json metric).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.
vs_baseline is measured throughput / the 5M env-steps/s/chip north star.

The benched program is the FULL acro drone env — motor curve, quadratic
drag, motor-point collisions vs (moving target sphere + ground),
double-rotation attitude update, CircularPath target motion, reward,
auto-reset with uniform/normal respawn sampling — as the fused pallas
megaloop (fpyv_tpu.ops.pallas_env), K steps per kernel launch with
VMEM-resident state.  Parity of the kernel vs the XLA env path is enforced
by tests/test_pallas_env.py.

Measurement note: this tunneled platform adds ~100 ms of per-call dispatch
overhead that dwarfs device time for small K (BENCH.md), so the bench runs
a large-K single kernel and wall-clock-times warm calls end to end; the
reward sum is materialized on host so the timing includes real completion.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

N_ENVS = 4096
KERNEL_STEPS = 500_000
REPEATS = 3
BASELINE_STEPS_PER_S = 5_000_000.0  # BASELINE.json north star


def build(env, world):
    from fpyv_tpu.ops.pallas_env import pallas_env_rollout

    keys = jax.random.split(jax.random.key(0), N_ENVS)
    state, obs = jax.vmap(lambda k: env.reset(k, world))(keys)

    action = jnp.zeros((N_ENVS, 4), jnp.float32).at[:, 3].set(-0.6)

    def run(state, world):
        st, w, rsum = pallas_env_rollout(env, state, action, world,
                                         KERNEL_STEPS, seed=0)
        # materialize on host: the timing must include real completion
        total = float(np.asarray(rsum).sum())
        return st, w, total

    return run, state, world


def measure(env, world):
    run, state, world = build(env, world)
    # warmup/compile at the benched K
    state, world, total = run(state, world)
    assert np.isfinite(total)

    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        state, world, total = run(state, world)
        times.append(time.perf_counter() - t0)

    return N_ENVS * KERNEL_STEPS / min(times)


def measure_vision(n_envs: int = 1024, k1: int = 512, k2: int = 2048):
    """FPV chase megaloop (ops/pallas_vision.pallas_vision_env_rollout):
    in-kernel render -> centroid -> guidance -> physics, K steps/launch.
    Slope-timed (K-sweep cancels the tunnel's per-call dispatch)."""
    from fpyv_tpu.envs.acro import AcroEnv
    from fpyv_tpu.ops.pallas_vision import pallas_vision_env_rollout
    from fpyv_tpu.physics.drone import DroneParams

    env = AcroEnv(params=DroneParams(att_mode="quat"))
    world = env.default_world()
    keys = jax.random.split(jax.random.key(0), n_envs)
    state0, _ = jax.vmap(lambda k: env.reset(k, world))(keys)

    def run(K):
        _, _, rsum, _, _ = pallas_vision_env_rollout(env, state0, world, K,
                                                     seed=0)
        assert np.isfinite(float(np.asarray(rsum).sum()))

    def timed(K):
        run(K)  # compile + warm
        ts = []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            run(K)
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t1, t2 = timed(k1), timed(k2)
    return n_envs * (k2 - k1) / (t2 - t1)


def measure_vision_trainer(n_envs: int = 1024, iters: int = 30):
    """End-to-end trained vision env-steps/s with the policy-in-kernel
    rollout (ops/pallas_policy) at the default recipe — the round-4
    vision-lane number (BENCH.md)."""
    from fpyv_tpu.apps.train import train_vision

    res = train_vision(num_envs=n_envs, num_iterations=iters,
                       scan_chunk=10, print_every=10**9)
    return res.steps_per_second


def measure_vision_race_trainer(n_envs: int = 1024, iters: int = 30):
    """Trained vision_race env-steps/s at the flagship recipe (4-frame
    stack, onehot, 5 m gates) — the racing-lane trainer number (VERDICT r4
    #9: the bench line should capture the capability story, not just acro).
    Rollout 'auto' picks whatever the convergence A/B crowned."""
    from fpyv_tpu.apps.train import train_vision_race

    res = train_vision_race(num_envs=n_envs, num_iterations=iters,
                            frame_stack=4, gate_size=5.0, scan_chunk=10,
                            print_every=10**9)
    return res.steps_per_second


def measure_flagship_gates():
    """Deterministic-eval gates of the shipped flagship racer checkpoint
    (runs/flagship/meta.json names the recipe + play kwargs). None when no
    flagship checkpoint ships with the repo."""
    import json as _json
    from pathlib import Path

    meta_p = Path(__file__).resolve().parent / "runs" / "flagship" / "meta.json"
    if not meta_p.exists():
        return None
    meta = _json.loads(meta_p.read_text())
    from fpyv_tpu.apps.play import play_policy

    out = play_policy(
        checkpoint_dir=str(meta_p.parent / "ck"), env_name="vision_race",
        steps=2000, num_envs=32, chunk=500, **meta.get("play_kwargs", {}))
    return {"gates": out["final_gates_passed_mean"],
            "recipe": meta.get("recipe")}


def main():
    from fpyv_tpu.config import FpyvConfig
    from fpyv_tpu.envs.acro import AcroEnv
    from fpyv_tpu.physics.drone import DroneParams
    from fpyv_tpu.world.generators import WorldSpec, build_world

    # headline: the default acro env (moving target + ground)
    env = AcroEnv(params=DroneParams(att_mode="quat"))
    steps_per_s = measure(env, env.default_world())

    # secondary: the reference-shaped params.yaml world (targets + cylinders
    # + gate track + ground, /root/reference/config/params.yaml:6-35) with
    # domain randomization AND per-episode wind gusts — all in-kernel
    env_ref = AcroEnv(params=DroneParams(att_mode="quat"),
                      randomize=True, wind=(1.0, 0.5, 0.0), wind_scale=0.5)
    spec = WorldSpec.from_config(FpyvConfig().simulator, seed=2)
    ref_steps_per_s = measure(env_ref, build_world(spec, dtype=jnp.float32))

    vision_steps_per_s = measure_vision()

    try:  # trained vision throughput (kernel rollout); never sink the bench
        vision_train_steps_per_s = round(measure_vision_trainer())
    except Exception as e:  # pragma: no cover - platform-dependent
        vision_train_steps_per_s = f"failed: {e!r}"[:200]

    try:  # racing lane: trained steps/s + shipped-flagship eval gates
        race_train_steps_per_s = round(measure_vision_race_trainer())
    except Exception as e:  # pragma: no cover - platform-dependent
        race_train_steps_per_s = f"failed: {e!r}"[:200]
    try:
        flagship = measure_flagship_gates()
    except Exception as e:  # pragma: no cover - platform-dependent
        flagship = f"failed: {e!r}"[:200]

    print(json.dumps({
        "metric": f"full acro-env steps/s/chip at {N_ENVS} envs",
        "value": round(steps_per_s),
        "unit": "env-steps/s",
        "vs_baseline": round(steps_per_s / BASELINE_STEPS_PER_S, 4),
        "reference_world_value": round(ref_steps_per_s),
        "reference_world_vs_baseline": round(
            ref_steps_per_s / BASELINE_STEPS_PER_S, 4),
        "vision_chase_kernel_steps_per_s_1024": round(vision_steps_per_s),
        "vision_trained_steps_per_s_1024": vision_train_steps_per_s,
        "vision_race_trained_steps_per_s_1024": race_train_steps_per_s,
        "flagship_vision_race_eval": flagship,
    }))


if __name__ == "__main__":
    main()
