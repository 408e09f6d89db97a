"""Attribute the vision-PPO iteration's device time + capture a profiler
trace (VERDICT r3 #7: one jax.profiler trace, or the recorded reason there
can't be one on this tunneled platform).

Method: K-sweep slopes (time scans of n vs 4n iterations; slope = device
time per unit, intercept = dispatch) for each component of the iteration —
full iteration, rollout-only, learner-only, render-only, policy-fwd-only —
so the parts are measured the same way the whole is.  Then wrap ONE
iteration in jax.profiler.trace and report whether a trace directory with
events materializes.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/attribute_vision.py
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

OUT = Path(__file__).resolve().parents[1] / "runs" / "r4" / "attribution"


def slope(fn, lo=2, hi=8, reps=3):
    """Device seconds per unit via two-point sweep (excludes dispatch)."""
    fn(lo)  # compile both lengths
    fn(hi)

    def best(n):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(n))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_lo, t_hi = best(lo), best(hi)
    return (t_hi - t_lo) / (hi - lo), t_lo, t_hi


def main():
    from fpyv_tpu.envs.vision_acro import VisionAcroEnv
    from fpyv_tpu.models.policy import PixelActorCritic
    from fpyv_tpu.rl.ppo import PpoConfig, make_ppo, scan_train

    num_envs, T = 1024, 32
    env = VisionAcroEnv(renderer="raycast", pixel_dtype="u8")
    key = jax.random.key(0)
    k_world, k_env, k_net, k_train = jax.random.split(key, 4)
    worlds, bank = env.make_randomized_worlds(k_world, num_envs)
    net = PixelActorCritic(action_dim=4, torso="patch",
                           compute_dtype=jnp.bfloat16)
    config = PpoConfig(num_envs=num_envs, num_steps=T, num_minibatches=8,
                       update_epochs=2)

    def apply_fn(params, obs):
        proprio = jnp.concatenate(
            [obs["rates"], obs["accel_z"], obs["thrust"]], axis=-1)
        return net.apply(params, obs["pixels"], proprio)

    def env_step(carry, action, key):
        env_state, w = carry
        st, obs, reward, done, info = env.step_batched(env_state, action, w,
                                                       bank)
        return (st, w), obs, reward, info["crashed"]

    env_keys = jax.random.split(k_env, num_envs)
    env_state, obs = env.reset_batched(env_keys, worlds, bank)
    params = net.init(k_net, obs["pixels"][:1],
                      jnp.concatenate([obs["rates"][:1], obs["accel_z"][:1],
                                       obs["thrust"][:1]], axis=-1))
    init, train_iteration = make_ppo(apply_fn, env_step, config)
    state = init(params, (env_state, worlds), obs, k_train)

    results = {}

    # ---- full iteration (scan of n iterations) ----------------------------
    jit_scan = jax.jit(scan_train, static_argnums=(0, 2))

    def full(n):
        st, infos = jit_scan(train_iteration, state, n)
        return infos["loss"]

    s, lo, hi = slope(full)
    results["full_iteration_ms"] = s * 1e3
    print(f"full iteration: {s*1e3:.1f} ms (t2={lo:.3f}s t8={hi:.3f}s)",
          flush=True)

    # ---- rollout-only (policy sample + env step + store, no learner) ------
    def rollout_many(n):
        def one(carry, _):
            st = carry

            def body(c, _):
                env_state, ob, k = c
                k, ka, ks = jax.random.split(k, 3)
                mean, log_std, value = apply_fn(state.params, ob)
                a = mean + jnp.exp(log_std) * jax.random.normal(
                    ka, mean.shape, mean.dtype)
                env_state, ob2, r, d = env_step(env_state, a, ks)
                return (env_state, ob2, k), (ob["pixels"], a, r, d, value)

            (es, ob, k), traj = jax.lax.scan(
                body, st, None, length=T)
            return (es, ob, k), jax.tree.map(
                lambda x: x.sum() if x.dtype != jnp.uint8 else x.max(), traj)

        st0 = (state.env_state, state.last_obs, state.key)
        _, out = jax.lax.scan(one, st0, None, length=n)
        return out

    jr = jax.jit(rollout_many, static_argnums=0)
    s, lo, hi = slope(jr)
    results["rollout_ms"] = s * 1e3
    print(f"rollout (T={T}): {s*1e3:.1f} ms", flush=True)

    # ---- render-only ------------------------------------------------------
    def render_many(n):
        def body(c, _):
            ob = env._obs(c, worlds, bank)
            return c, ob["pixels"].max()

        return jax.lax.scan(body, state.env_state[0], None, length=n * T)[1]

    try:
        jrd = jax.jit(render_many, static_argnums=0)
        s, lo, hi = slope(jrd)
        results["render_ms"] = s * 1e3
        print(f"render (T={T}): {s*1e3:.1f} ms", flush=True)
    except Exception as e:  # obs API name may differ; slope from rollout swap
        print("render-only skipped:", e, flush=True)

    # ---- policy forward only ---------------------------------------------
    fixed_obs = state.last_obs

    def fwd_many(n):
        def body(c, _):
            m, ls, v = apply_fn(state.params, fixed_obs)
            return c + m.sum() + v.sum(), None

        return jax.lax.scan(body, jnp.float32(0), None, length=n * T)[0]

    jf = jax.jit(fwd_many, static_argnums=0)
    s, lo, hi = slope(jf)
    results["policy_fwd_ms"] = s * 1e3
    print(f"policy fwd x{T}: {s*1e3:.1f} ms", flush=True)

    # ---- learner share = full - rollout ----------------------------------
    results["learner_ms_inferred"] = (results["full_iteration_ms"]
                                      - results["rollout_ms"])

    # ---- profiler trace ---------------------------------------------------
    trace_dir = OUT / "trace"
    trace_note = None
    try:
        with jax.profiler.trace(str(trace_dir)):
            jax.block_until_ready(full(2))
        files = [str(p.relative_to(trace_dir)) for p in trace_dir.rglob("*")
                 if p.is_file()]
        trace_note = {"ok": bool(files), "files": files[:10],
                      "n_files": len(files)}
    except Exception as e:
        trace_note = {"ok": False, "error": repr(e)}
    results["trace"] = trace_note
    print("trace:", json.dumps(trace_note)[:500], flush=True)

    OUT.mkdir(parents=True, exist_ok=True)
    (OUT / "attribution.json").write_text(json.dumps(results, indent=1))
    print("RESULT", json.dumps(results, default=str), flush=True)


if __name__ == "__main__":
    main()
