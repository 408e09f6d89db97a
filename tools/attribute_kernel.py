"""Attribute the KERNEL-rollout vision-PPO iteration (VERDICT r4 #7): where
do the ~39 ms of non-learner time go on the kernel-e2 path?

Round 4 traced only the scan path; this tool K-sweeps the kernel-rollout
iteration's components the same way (slope method cancels the tunnel's
per-call dispatch) and captures a jax.profiler trace of the kernel-e2
program:

- full iteration (kernel rollout + GAE + 2-epoch learner)
- kernel rollout launch only (the pallas program)
- bootstrap obs (the one XLA render per iteration, obs_from_cols)
- exact-logprob recompute (the batched (T*N) forward)
- learner only (epoch loop over a frozen trajectory)

    PYTHONPATH=/root/repo:/root/.axon_site python tools/attribute_kernel.py \
        [--patch-pool 4] [--update-epochs 2] [--mu bf16]
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

OUT = Path(__file__).resolve().parents[1] / "runs" / "r5"


def slope(fn, lo=2, hi=8, reps=3):
    fn(lo)
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


def main(patch_pool=1, update_epochs=2, mu=None, num_envs=1024, T=32,
         tag=None):
    from fpyv_tpu.envs.vision_acro import VisionAcroEnv
    from fpyv_tpu.models.policy import PixelActorCritic
    from fpyv_tpu.ops.pallas_policy import (
        acro_state_to_cols, make_kernel_vision_ppo_parts)
    from fpyv_tpu.physics.drone import DroneParams
    from fpyv_tpu.rl.ppo import PpoConfig, make_ppo, scan_train

    import dataclasses

    env = VisionAcroEnv(renderer="raycast", pixel_dtype="u8")
    env = dataclasses.replace(
        env, acro=dataclasses.replace(
            env.acro, params=DroneParams(att_mode="quat")))
    key = jax.random.key(0)
    k_world, k_env, k_net, k_train = jax.random.split(key, 4)
    worlds, bank = env.make_randomized_worlds(k_world, num_envs)
    net = PixelActorCritic(action_dim=4, torso="patch", prepatched=True,
                           compute_dtype=jnp.bfloat16,
                           patch_pool=patch_pool)
    config = PpoConfig(num_envs=num_envs, num_steps=T, num_minibatches=8,
                       update_epochs=update_epochs, adam_mu_dtype=mu)
    apply_fn, make_rollout_fn, obs_from_cols = make_kernel_vision_ppo_parts(
        env, worlds, net, num_envs, interpret=False)

    env_keys = jax.random.split(k_env, num_envs)
    env_state, obs = env.reset_batched(env_keys, worlds, bank)
    cols = acro_state_to_cols(env_state)
    obs0 = obs_from_cols(cols)
    params = net.init(
        k_net, obs0["pixels"][:1].reshape(1, -1, 64).astype(jnp.uint8),
        obs0["proprio"][:1])
    rollout_fn = make_rollout_fn(T, compute_dtype=jnp.bfloat16)
    init, train_iteration = make_ppo(apply_fn, None, config,
                                     rollout_fn=rollout_fn)
    state = init(params, cols, obs0, k_train)

    results = {"patch_pool": patch_pool, "update_epochs": update_epochs,
               "adam_mu_dtype": mu, "num_envs": num_envs}

    jit_scan = jax.jit(scan_train, static_argnums=(0, 2))

    def full(n):
        st, infos = jit_scan(train_iteration, state, n)
        return infos["loss"]

    s, lo, hi = slope(full)
    results["full_iteration_ms"] = s * 1e3
    print(f"full iteration: {s*1e3:.2f} ms (t2={lo:.3f}s t8={hi:.3f}s)",
          flush=True)
    results["steps_per_s"] = num_envs * T / s

    # ---- kernel rollout only (incl. bootstrap render + recompute) ---------
    def rollout_many(n):
        def one(carry, _):
            st = carry
            env_state, last_obs, k, traj = rollout_fn(st)
            st = st.replace(env_state=env_state, last_obs=last_obs, key=k)
            return st, (traj.reward.sum(), traj.value.sum())

        _, out = jax.lax.scan(one, state, None, length=n)
        return out

    s, lo, hi = slope(jax.jit(rollout_many, static_argnums=0))
    results["rollout_with_recompute_ms"] = s * 1e3
    print(f"rollout+bootstrap+recompute: {s*1e3:.2f} ms", flush=True)

    # ---- the batched (T*N) exact-logprob forward alone --------------------
    _, _, _, traj0 = rollout_fn(state)
    flat_obs = jax.tree.map(lambda x: x.reshape((-1,) + x.shape[2:]),
                            traj0.obs)

    def fwd_many(n):
        def body(c, _):
            m, ls, v = apply_fn(state.params, flat_obs)
            return c + m.sum() + v.sum(), None

        return jax.lax.scan(body, jnp.float32(0), None, length=n)[0]

    s, lo, hi = slope(jax.jit(fwd_many, static_argnums=0))
    results["tn_forward_ms"] = s * 1e3
    print(f"(T*N) forward: {s*1e3:.2f} ms", flush=True)

    # ---- bootstrap obs (XLA render of the carry state) --------------------
    def boot_many(n):
        def body(c, _):
            ob = obs_from_cols(cols)
            return c + ob["pixels"].sum() + ob["proprio"].sum(), None

        return jax.lax.scan(body, jnp.float32(0), None, length=n)[0]

    s, lo, hi = slope(jax.jit(boot_many, static_argnums=0))
    results["bootstrap_obs_ms"] = s * 1e3
    print(f"bootstrap obs render: {s*1e3:.2f} ms", flush=True)

    # ---- learner only: epoch loop over a frozen trajectory ----------------
    frozen = jax.tree.map(jnp.asarray, traj0)

    def frozen_rollout(st):
        return st.env_state, st.last_obs, st.key, frozen

    _, learner_iteration = make_ppo(apply_fn, None, config,
                                    rollout_fn=frozen_rollout)

    def learner_many(n):
        st, infos = jit_scan(learner_iteration, state, n)
        return infos["loss"]

    s, lo, hi = slope(learner_many)
    results["learner_ms"] = s * 1e3
    print(f"learner (GAE + {update_epochs} epochs x 8 mb): {s*1e3:.2f} ms",
          flush=True)

    # ---- profiler trace of the kernel-e2 program --------------------------
    name = tag or f"attribution_kernel_p{patch_pool}e{update_epochs}"
    trace_dir = OUT / name / "trace"
    try:
        with jax.profiler.trace(str(trace_dir)):
            jax.block_until_ready(full(2))
        files = [str(p.relative_to(trace_dir)) for p in trace_dir.rglob("*")
                 if p.is_file()]
        results["trace"] = {"ok": bool(files), "n_files": len(files)}
    except Exception as e:
        results["trace"] = {"ok": False, "error": repr(e)}
    print("trace:", json.dumps(results["trace"])[:300], flush=True)

    (OUT / name).mkdir(parents=True, exist_ok=True)
    (OUT / name / "attribution.json").write_text(
        json.dumps(results, indent=1))
    print("RESULT", json.dumps(results, default=str), flush=True)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--patch-pool", type=int, default=1)
    p.add_argument("--update-epochs", type=int, default=2)
    p.add_argument("--mu", default=None)
    p.add_argument("--num-envs", type=int, default=1024)
    p.add_argument("--tag", default=None)
    a = p.parse_args()
    main(patch_pool=a.patch_pool, update_epochs=a.update_epochs, mu=a.mu,
         num_envs=a.num_envs, tag=a.tag)
