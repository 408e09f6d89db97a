"""Round-5 experiment campaign (VERDICT r4): learner speed A/Bs, frontier
convergence, 4-agent fairness, race-kernel receipts.

Evidence scripts, not library code — same shape as tools/experiments_r4.py:

    PYTHONPATH=/root/repo:/root/.axon_site python tools/experiments_r5.py hardest_ext
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
RUNS = REPO / "runs" / "r5"


def _read_metric(log_dir, key="mean_gates_passed"):
    rows = []
    with open(Path(log_dir) / "metrics.jsonl") as f:
        for line in f:
            r = json.loads(line)
            if key in r:
                rows.append((r["step"], r[key]))
    return rows


def _peak_step(log_dir, saved_steps, key="mean_gates_passed", window=200):
    rows = dict(_read_metric(log_dir, key))
    best, best_v = None, -1e30
    for s in saved_steps:
        vals = [v for it, v in rows.items() if s - window <= it < s]
        if not vals:
            continue
        m = sum(vals) / len(vals)
        if m > best_v:
            best, best_v = s, m
    return best, best_v


def _eval_vision_race(ck, step, *, agents, gate_size, frame_stack=1,
                      gate_onehot=True, show_opponents=True, num_envs=64,
                      steps=2000, seed=7, n_obstacles=0):
    from fpyv_tpu.apps.play import play_policy

    return play_policy(
        checkpoint_dir=ck, env_name="vision_race", steps=steps,
        num_envs=num_envs, seed=seed, n_agents=agents,
        gate_onehot=gate_onehot, frame_stack=frame_stack,
        show_opponents=show_opponents, gate_size=gate_size,
        n_obstacles=n_obstacles,
        step_checkpoint=step, chunk=500)


def _save(name, obj):
    out = RUNS / name / "result.json"
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(obj, indent=1))
    print("RESULT", name, json.dumps(obj))


# ---------------------------------------------------------------------------
# Experiments
# ---------------------------------------------------------------------------


def hardest_fresh(p1=800, p2=3200, races=1024):
    """VERDICT r4 #5: converge the frontier config (pixels + IMU + 4-frame
    memory + 3 moving obstacles, NO gate onehot). Round 4 stopped at 2000
    iterations / 6.4 gates with the curve still climbing and did not keep
    checkpoints, so this is a FRESH run at 2x the budget on the same
    two-phase curriculum (800 @ 7 m -> the rest @ 5 m), checkpointed every
    200 so extension arms can branch from any point."""
    from fpyv_tpu.apps.train import train_vision_race

    d = RUNS / "hardest"
    common = dict(num_envs=races, n_agents=1, gate_onehot=False,
                  frame_stack=4, n_obstacles=3,
                  checkpoint_dir=str(d / "ck"), checkpoint_every=200,
                  log_dir=str(d / "log"), print_every=50)
    train_vision_race(num_iterations=p1, gate_size=7.0, **common)
    res = train_vision_race(num_iterations=p2, gate_size=5.0, resume=True,
                            **common)
    total = p1 + p2
    saved = list(range(p1 + 200, total + 1, 200))
    peak, peak_train = _peak_step(d / "log", saved)
    evals = {}
    for tag, step in (("peak", peak), ("final", total)):
        evals[tag] = dict(
            _eval_vision_race(str(d / "ck"), step, agents=1, gate_size=5.0,
                              frame_stack=4, gate_onehot=False,
                              n_obstacles=3), step=step)
    _save("hardest", {
        "total_iters": total,
        "train_steps_per_s": res.steps_per_second,
        "peak_step": peak, "peak_train_gates": peak_train,
        "eval": evals})


def hardest_lowent(start=4000, extra=2000, races=1024, ent=0.003):
    """Entropy-control extension branch for the frontier run: the round-4
    frontier log shows policy entropy CLIMBING monotonically (3.8 -> 7.1
    nats by iter 2000 — sigma ~1.4 per action dim, exploration noise the
    size of the action box). Branch from hardest's `start` checkpoint with
    ent_coef dropped to `ent` and measure whether taming sigma converts
    the noisy plateau into laps."""
    import shutil

    from fpyv_tpu.apps.train import train_vision_race

    src = RUNS / "hardest"
    d = RUNS / "hardest_lowent"
    if not (d / "ck").exists():
        d.mkdir(parents=True, exist_ok=True)
        (d / "ck").mkdir()
        shutil.copytree(src / "ck" / f"step_{start:010d}",
                        d / "ck" / f"step_{start:010d}")
        shutil.copytree(src / "log", d / "log")
    res = train_vision_race(
        num_envs=races, n_agents=1, num_iterations=extra, gate_size=5.0,
        gate_onehot=False, frame_stack=4, n_obstacles=3, ent_coef=ent,
        resume=True, checkpoint_dir=str(d / "ck"), checkpoint_every=200,
        log_dir=str(d / "log"), print_every=50)
    total = start + extra
    saved = list(range(start + 200, total + 1, 200))
    peak, peak_train = _peak_step(d / "log", saved)
    evals = {}
    for tag, step in (("peak", peak), ("final", total)):
        evals[tag] = dict(
            _eval_vision_race(str(d / "ck"), step, agents=1, gate_size=5.0,
                              frame_stack=4, gate_onehot=False,
                              n_obstacles=3), step=step)
    _save("hardest_lowent", {
        "ent_coef": ent, "branched_at": start, "total_iters": total,
        "train_steps_per_s": res.steps_per_second,
        "peak_step": peak, "peak_train_gates": peak_train,
        "eval": evals})


def _curve_stats(log_dir, key="mean_reward"):
    vals = [v for _, v in _read_metric(log_dir, key)]
    return {"auc": sum(vals) / max(len(vals), 1),
            "last50": sum(vals[-50:]) / max(len(vals[-50:]), 1)}


def learner_probe(iters=40, envs=1024):
    """VERDICT r4 #1 step 1: throughput ladder for the vision learner
    levers at the kernel-e2 default recipe (pooled-patch fc, bf16 adam
    moment, 1-epoch reference point). Short runs — speed only; the
    convergence question goes to learner_ab."""
    from fpyv_tpu.apps.train import train_vision

    # NOTE: measured before the round-5 kernel_exact_logprob default flip;
    # exact=True is pinned so re-runs reproduce the recorded baselines
    E = {"kernel_exact_logprob": True}
    arms = {
        "base_e2": {**E},
        "mu_e2": {**E, "adam_mu_dtype": "bf16"},
        "pool2_e2": {**E, "patch_pool": 2},
        "pool4_e2": {**E, "patch_pool": 4},
        "pool4_mu_e2": {**E, "patch_pool": 4, "adam_mu_dtype": "bf16"},
        "pool4_mu_e1": {**E, "patch_pool": 4, "adam_mu_dtype": "bf16",
                        "update_epochs": 1},
    }
    out = {}
    for name, kw in arms.items():
        res = train_vision(num_envs=envs, num_iterations=iters,
                           scan_chunk=10, print_every=10**9, **kw)
        out[name] = {"steps_per_s": res.steps_per_second,
                     "reward_last": res.mean_reward_last}
        print("ARM", name, json.dumps(out[name]), flush=True)
    _save("learner_probe", out)


def learner_ab(iters=400, envs=1024, seeds=3):
    """VERDICT r4 #1 step 2: seed-matched convergence A/B of the surviving
    speed arms vs the kernel-e2 default (AUC + last-50). The probes
    (learner_probe/learner_probe2) eliminated pooling and larger
    minibatches (both SLOWER — the learner is activation-bound, not
    fc-weight-bound); what survives is fastlp (kernel-emitted bf16
    logprob/value instead of the exact f32 recompute, +12%) and
    fastlp+mu+e1 (the round-4 726K ladder point, +43% — but r4's
    single-seed curves showed e1 converging worse at equal iterations,
    so it must beat the noise band to win)."""
    from fpyv_tpu.apps.train import train_vision

    arms = {
        # exact=True pinned: this A/B *decided* the round-5 default flip,
        # so the baseline must not follow the new default on re-runs
        "base_e2": {"kernel_exact_logprob": True},
        "fastlp_e2": {"kernel_exact_logprob": False},
        "fastlp_mu_e1": {"kernel_exact_logprob": False,
                         "adam_mu_dtype": "bf16", "update_epochs": 1},
    }
    out = {}
    for name, kw in arms.items():
        per_seed = {}
        for seed in range(seeds):
            d = RUNS / "learner_ab" / f"{name}_s{seed}"
            res = train_vision(num_envs=envs, num_iterations=iters,
                               seed=seed, log_dir=str(d), print_every=200,
                               **kw)
            per_seed[seed] = dict(_curve_stats(d),
                                  steps_per_s=res.steps_per_second)
            print("AB", name, seed, json.dumps(per_seed[seed]), flush=True)
        out[name] = per_seed
    _save("learner_ab", out)


def kernel_eblk2(envs=1024, T=32):
    """VERDICT r4 #3 remeasured: the first sweep (kernel_eblk) proved
    pool4 UNLOCKS e_blk=64 compilation (the fc-weight VMEM blocker cleared)
    but its direct-call K-sweep timing returned negative slopes — tunnel
    dispatch noise. This version slope-times a lax.scan of FULL rollout_fn
    calls (the same method that measured the 34.7 ms rollout in
    runs/r5/attribution_kernel_p1e2), so dispatch cancels and the state
    carry defeats loop hoisting."""
    import time

    import dataclasses

    import jax
    import jax.numpy as jnp

    from fpyv_tpu.envs.vision_acro import VisionAcroEnv
    from fpyv_tpu.models.policy import PixelActorCritic
    from fpyv_tpu.ops.pallas_policy import (
        acro_state_to_cols, make_kernel_vision_ppo_parts)
    from fpyv_tpu.physics.drone import DroneParams
    from fpyv_tpu.rl.ppo import PpoConfig, make_ppo

    env = VisionAcroEnv(renderer="raycast", pixel_dtype="u8")
    env = dataclasses.replace(
        env, acro=dataclasses.replace(
            env.acro, params=DroneParams(att_mode="quat")))
    k_world, k_env, k_net, k_train = jax.random.split(jax.random.key(0), 4)
    worlds, bank = env.make_randomized_worlds(k_world, envs)
    env_keys = jax.random.split(k_env, envs)
    env_state, _ = env.reset_batched(env_keys, worlds, bank)
    cols0 = acro_state_to_cols(env_state)

    def slope(fn, lo=2, hi=8, reps=3):
        jax.block_until_ready(fn(lo))
        jax.block_until_ready(fn(hi))

        def best(n):
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                jax.block_until_ready(fn(n))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        return (best(hi) - best(lo)) / (hi - lo)

    out = {}
    for pool in (1, 4):
        net = PixelActorCritic(action_dim=4, torso="patch", prepatched=True,
                               compute_dtype=jnp.bfloat16, patch_pool=pool)
        config = PpoConfig(num_envs=envs, num_steps=T)
        for e_blk in (32, 64, 128):
            name = f"pool{pool}_eblk{e_blk}"
            try:
                apply_fn, make_rollout_fn, obs_from_cols = (
                    make_kernel_vision_ppo_parts(env, worlds, net, envs,
                                                 e_blk=e_blk,
                                                 interpret=False))
                obs0 = obs_from_cols(cols0)
                params = net.init(
                    k_net,
                    obs0["pixels"][:1].reshape(1, -1, 64).astype(jnp.uint8),
                    obs0["proprio"][:1])
                rollout_fn = make_rollout_fn(T,
                                             compute_dtype=jnp.bfloat16)
                init, _ = make_ppo(apply_fn, None, config,
                                   rollout_fn=rollout_fn)
                state = init(params, cols0, obs0, k_train)

                def many(n):
                    def one(st, _):
                        es, lo, k, traj = rollout_fn(st)
                        st = st.replace(env_state=es, last_obs=lo, key=k)
                        return st, (traj.reward.sum(), traj.value.sum())

                    return jax.lax.scan(one, state, None, length=n)[1]

                s = slope(jax.jit(many, static_argnums=0))
                out[name] = {"rollout_ms": s * 1e3,
                             "rollout_steps_per_s": envs * T / s}
            except Exception as e:
                out[name] = {"error": repr(e)[:300]}
            print("EBLK", name, json.dumps(out[name]), flush=True)
    _save("kernel_eblk2", out)


def kernel_eblk(envs=1024, T=32):
    """VERDICT r4 #3: e_blk > 32 for the policy kernel. The round-4 blocker
    was the scoped-VMEM budget — dominated by the VMEM-resident fc weights
    (13952 x 256 bf16 = 7.2 MB); patch_pool=4 shrinks them to 1.8 MB, so
    sweep e_blk x pool and record every arm (even the losers).

    OUTCOME (runs/r5/kernel_eblk): pool4 does unlock e_blk=64 compilation,
    but this function's direct-call K-sweep timing is dispatch-noise-bound
    on the tunneled platform (negative slopes) — see kernel_eblk2 for the
    usable timing method."""
    import time

    from fpyv_tpu.envs.acro import AcroEnv
    from fpyv_tpu.envs.vision_acro import VisionAcroEnv
    from fpyv_tpu.models.policy import PixelActorCritic
    from fpyv_tpu.ops.pallas_policy import (
        acro_state_to_cols, build_policy_weights,
        pallas_policy_vision_rollout, prepatch_pixels)
    from fpyv_tpu.physics.drone import DroneParams

    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    venv = VisionAcroEnv(renderer="raycast", target_only=False,
                         pixel_dtype="u8")
    venv = dataclasses.replace(
        venv, acro=AcroEnv(params=DroneParams(att_mode="quat")))
    worlds, bank = venv.make_randomized_worlds(jax.random.key(0), envs)
    keys = jax.random.split(jax.random.key(1), envs)
    state, obs = venv.reset_batched(keys, worlds, bank)
    cols = acro_state_to_cols(state)
    NPAT = (venv.rig.resolution[0] // 8) * (venv.rig.resolution[1] // 8)

    out = {}
    for pool in (1, 4):
        net = PixelActorCritic(action_dim=4, torso="patch", prepatched=True,
                               compute_dtype=jnp.bfloat16, patch_pool=pool)
        px0 = prepatch_pixels(obs["pixels"][:1]).reshape(1, -1, 64)
        pr0 = jnp.concatenate([obs["rates"][:1], obs["accel_z"][:1],
                               obs["thrust"][:1]], axis=-1)
        params = net.init(jax.random.key(2), px0, pr0)
        w = build_policy_weights(params, n_patches=NPAT,
                                 compute_dtype=jnp.bfloat16, patch_pool=pool)
        for e_blk in (32, 64, 128):
            name = f"pool{pool}_eblk{e_blk}"
            try:
                def run(K):
                    f, e, a, c = pallas_policy_vision_rollout(
                        venv.acro, venv.rig, cols, worlds, w, K, 7,
                        venv.max_depth, frame_width=venv.frame_width,
                        e_blk=e_blk, compute_dtype=jnp.bfloat16,
                        patch_pool=pool)
                    return a[..., 4].sum()

                def timed(K):
                    jax.block_until_ready(run(K))
                    ts = []
                    for _ in range(3):
                        t0 = time.perf_counter()
                        jax.block_until_ready(run(K))
                        ts.append(time.perf_counter() - t0)
                    return min(ts)

                t1, t2 = timed(T), timed(T * 8)
                per_step = (t2 - t1) / (T * 7)
                out[name] = {
                    "us_per_step": per_step * 1e6,
                    "rollout_steps_per_s": envs / per_step,
                }
            except Exception as e:
                out[name] = {"error": repr(e)[:300]}
            print("EBLK", name, json.dumps(out[name]), flush=True)
    _save("kernel_eblk", out)


def learner_probe2(iters=40, envs=1024):
    """Follow-up throughput ladder (the pool arms LOST in learner_probe —
    the learned pool layer's own FLOPs ate the fc saving): minibatch-count
    arms (fewer, larger minibatches amortize weight reloads and raise MXU
    row occupancy), the no-recompute kernel logprob, and e1 without pool."""
    from fpyv_tpu.apps.train import train_vision

    # NOTE: measured before the round-5 kernel_exact_logprob default flip;
    # exact=True is pinned on the non-fastlp arms so re-runs reproduce them
    E = {"kernel_exact_logprob": True}
    arms = {
        "base_e2": {**E},
        "mb4_e2": {**E, "num_minibatches": 4},
        "mb2_e2": {**E, "num_minibatches": 2},
        "mb4_mu_e2": {**E, "num_minibatches": 4, "adam_mu_dtype": "bf16"},
        "fastlp_e2": {"kernel_exact_logprob": False},
        "mb4_fastlp_e2": {"num_minibatches": 4,
                          "kernel_exact_logprob": False},
        "mu_e1": {**E, "adam_mu_dtype": "bf16", "update_epochs": 1},
        "mb4_mu_e1": {**E, "num_minibatches": 4, "adam_mu_dtype": "bf16",
                      "update_epochs": 1},
    }
    out = {}
    for name, kw in arms.items():
        res = train_vision(num_envs=envs, num_iterations=iters,
                           scan_chunk=10, print_every=10**9, **kw)
        out[name] = {"steps_per_s": res.steps_per_second,
                     "reward_last": res.mean_reward_last}
        print("ARM", name, json.dumps(out[name]), flush=True)
    _save("learner_probe2", out)


def race_kernel_probe(iters=50, envs=1024):
    """VERDICT r4 #2 receipts, throughput half: the race policy-in-kernel
    rollout (ops/pallas_race) vs the XLA scan at the FLAGSHIP recipes
    (frame-stacked onehot racer / pixels-only racer)."""
    from fpyv_tpu.apps.train import train_vision_race

    arms = {
        "scan_k4_onehot": {"rollout": "scan", "frame_stack": 4},
        "kernel_k4_onehot": {"rollout": "kernel", "frame_stack": 4},
        "scan_k4_pixels": {"rollout": "scan", "frame_stack": 4,
                           "gate_onehot": False},
        "kernel_k4_pixels": {"rollout": "kernel", "frame_stack": 4,
                             "gate_onehot": False},
        "scan_k1_onehot": {"rollout": "scan"},
        "kernel_k1_onehot": {"rollout": "kernel"},
    }
    out = {}
    for name, kw in arms.items():
        try:
            res = train_vision_race(num_envs=envs, num_iterations=iters,
                                    gate_size=7.0, scan_chunk=10,
                                    print_every=10**9, **kw)
            out[name] = {"steps_per_s": res.steps_per_second,
                         "reward_last": res.mean_reward_last}
        except Exception as e:
            out[name] = {"error": repr(e)[:300]}
        print("ARM", name, json.dumps(out[name]), flush=True)
    _save("race_kernel_probe", out)


def race_kernel_ab(iters=600, envs=1024, seeds=2, seed_start=0):
    """VERDICT r4 #2, convergence half: seed-matched A/B of the race
    kernel rollout vs the scan at the frame-stacked onehot recipe
    (phase-1 budget, 7 m gates). Gate metric AUC decides the auto flip.
    Seeds 0-1 measured BIMODAL take-off (scan last50: 1.95 vs 25.2), so
    the verdict needs 4 seeds — run again with seed_start=2 and merge."""
    from fpyv_tpu.apps.train import train_vision_race

    out = {}
    for name, kw in (("scan", {"rollout": "scan"}),
                     ("kernel", {"rollout": "kernel"})):
        per_seed = {}
        for seed in range(seed_start, seed_start + seeds):
            d = RUNS / "race_kernel_ab" / f"{name}_s{seed}"
            res = train_vision_race(
                num_envs=envs, num_iterations=iters, gate_size=7.0,
                frame_stack=4, seed=seed, log_dir=str(d),
                print_every=200, **kw)
            per_seed[seed] = dict(
                _curve_stats(d, key="mean_gates_passed"),
                steps_per_s=res.steps_per_second)
            print("AB", name, seed, json.dumps(per_seed[seed]), flush=True)
        out[name] = per_seed
    tag = "race_kernel_ab" if seed_start == 0 else f"race_kernel_ab_s{seed_start}"
    _save(tag, out)


def ma4_fair(p1=1500, p2=2500, races=256):
    """VERDICT r4 #4: break the 4-agent role lock-in. Same two-phase
    curriculum + total budget as round 4's ma4 (1500 @ 7 m + 2500 @ 5 m =
    4000 iters, 256 races) with permute_spawns=True — agents are randomly
    assigned to spawn-ring slots every episode, so self-play roles cannot
    attach to spawn positions. Eval at FIXED slots (the honest test: agent
    i always in slot i — equalization must come from slot-robust policy,
    not statistical averaging) and at permuted slots for reference.
    Round-4 table to beat: [16.4, 3.5, 53.8, 19.4] (max/min 15x, mean
    23.3); done = max/min <= 2x at mean >= 23."""
    from fpyv_tpu.apps.train import train_vision_race

    d = RUNS / "ma4_fair"
    common = dict(num_envs=races, n_agents=4, permute_spawns=True,
                  checkpoint_dir=str(d / "ck"), checkpoint_every=100,
                  log_dir=str(d / "log"), print_every=50)
    train_vision_race(num_iterations=p1, gate_size=7.0, **common)
    res = train_vision_race(num_iterations=p2, gate_size=5.0, resume=True,
                            **common)
    total = p1 + p2
    ev_fixed = _eval_vision_race(str(d / "ck"), total, agents=4,
                                 gate_size=5.0, num_envs=32)
    from fpyv_tpu.apps.play import play_policy

    ev_perm = play_policy(
        checkpoint_dir=str(d / "ck"), env_name="vision_race", steps=2000,
        num_envs=32, seed=7, n_agents=4, gate_size=5.0,
        permute_spawns=True, step_checkpoint=total, chunk=500)
    _save("ma4_fair", {
        "total_iters": total,
        "train_steps_per_s": res.steps_per_second,
        "eval_fixed_slots": ev_fixed,
        "eval_permuted_slots": ev_perm})


def gru_ab(iters=1500, races=512, gru=128, seed=0):
    """VERDICT r4 #6: give multi-agent a temporal mechanism that works.
    Seed-matched fixed-budget A/B on the 2-agent pixel race (round 4's
    ma2_baseline recipe: 512 races, 1500 iters, 7 m gates): single-frame
    feedforward vs single-frame + GRU-128 recurrent PPO (frame stacking
    measured NEGATIVE at 4 agents, runs/r4/ma4_fs4)."""
    from fpyv_tpu.apps.train import train_vision_race

    out = {}
    for name, kw in (("ff", {}), (f"gru{gru}", {"gru": gru})):
        d = RUNS / "gru_ab" / (name if seed == 0 else f"{name}_s{seed}")
        res = train_vision_race(
            num_envs=races, n_agents=2, num_iterations=iters, gate_size=7.0,
            seed=seed, checkpoint_dir=str(d / "ck"), checkpoint_every=300,
            log_dir=str(d / "log"), print_every=50, **kw)
        ev = _eval_vision_race(str(d / "ck"), iters, agents=2,
                               gate_size=7.0, num_envs=32)
        out[name] = {
            "train_steps_per_s": res.steps_per_second,
            **_curve_stats(d / "log", key="mean_gates_passed"),
            "eval": ev}
        print("ARM", name, json.dumps(out[name], default=str), flush=True)
    _save("gru_ab" if seed == 0 else f"gru_ab_s{seed}", out)


def _rig(w, h):
    from fpyv_tpu.vision.camera import CameraRig

    return CameraRig(pitch_deg=35.0, rel_position=(0.1, 0.0, 0.0),
                     fov_deg=120.0, resolution=(w, h))


def lowres_probe(iters=40, envs=1024):
    """The round-5 attribution puts the RENDER at the rollout's floor
    (34.5 ms, insensitive to matmul shape) and the pixels dominate the
    learner's activations — so the retina is the biggest untouched
    lever. Throughput ladder at 64x48 (2.25x fewer rays) and 48x40
    (3.6x) vs the 96x72 default on the kernel-fastlp-e2 recipe."""
    from fpyv_tpu.apps.train import train_vision

    arms = {
        "r96x72": {},
        "r64x48": {"rig": _rig(64, 48)},
        "r48x40": {"rig": _rig(48, 40)},
    }
    out = {}
    for name, kw in arms.items():
        try:
            res = train_vision(num_envs=envs, num_iterations=iters,
                               scan_chunk=10, print_every=10**9, **kw)
            out[name] = {"steps_per_s": res.steps_per_second,
                         "reward_last": res.mean_reward_last}
        except Exception as e:
            out[name] = {"error": repr(e)[:300]}
        print("ARM", name, json.dumps(out[name]), flush=True)
    _save("lowres_probe", out)


def lowres_ab(iters=400, envs=1024, seeds=3, w=64, h=48):
    """Convergence half: does the task survive the smaller retina? The
    chased target subtends ~3 px at 96x72 from across the default world;
    halving the retina halves that. Seed-matched AUC/last-50 vs the
    default resolution."""
    from fpyv_tpu.apps.train import train_vision

    out = {}
    for name, kw in (("r96x72", {}), (f"r{w}x{h}", {"rig": _rig(w, h)})):
        per_seed = {}
        for seed in range(seeds):
            d = RUNS / "lowres_ab" / f"{name}_s{seed}"
            res = train_vision(num_envs=envs, num_iterations=iters,
                               seed=seed, log_dir=str(d), print_every=200,
                               **kw)
            per_seed[seed] = dict(_curve_stats(d),
                                  steps_per_s=res.steps_per_second)
            print("AB", name, seed, json.dumps(per_seed[seed]), flush=True)
        out[name] = per_seed
    _save("lowres_ab", out)


def ma4_gru(p1=1500, p2=2500, races=256, gru=128):
    """The 4-agent temporal-mechanism capstone: frame stacking measured
    NEGATIVE at 4 agents (runs/r4/ma4_fs4) and the 2-agent GRU A/B showed
    a stall-or-brilliance profile (runs/r5/gru_ab*). Run GRU-128 +
    permuted spawns at ma4_fair's exact two-phase budget and eval against
    its 64.7 gates/agent fixed-slot table."""
    from fpyv_tpu.apps.train import train_vision_race

    d = RUNS / "ma4_gru"
    common = dict(num_envs=races, n_agents=4, permute_spawns=True,
                  gru=gru, checkpoint_dir=str(d / "ck"),
                  checkpoint_every=100, log_dir=str(d / "log"),
                  print_every=50)
    train_vision_race(num_iterations=p1, gate_size=7.0, **common)
    res = train_vision_race(num_iterations=p2, gate_size=5.0, resume=True,
                            **common)
    total = p1 + p2
    ev = _eval_vision_race(str(d / "ck"), total, agents=4, gate_size=5.0,
                           num_envs=32)
    _save("ma4_gru", {
        "gru": gru, "total_iters": total,
        "train_steps_per_s": res.steps_per_second,
        "eval_fixed_slots": ev})


def gru_gem_ext(extra=1000, races=512, gru=128):
    """Extension receipt for the best racer in the repo: gru_ab seed 1's
    GRU-128 2-agent arm (87.2 gates/agent, 14x fewer crashes at 1500
    iterations). Resume +extra at the same recipe and locate its ceiling
    like every other flagship lane."""
    import shutil

    from fpyv_tpu.apps.train import train_vision_race

    src = RUNS / "gru_ab" / "gru128_s1"
    d = RUNS / "gru_gem_ext"
    if not (d / "ck").exists():
        d.mkdir(parents=True, exist_ok=True)
        shutil.copytree(src / "ck", d / "ck")
        shutil.copytree(src / "log", d / "log")
    from fpyv_tpu.utils.checkpoint import latest_step

    start = latest_step(str(d / "ck"))
    res = train_vision_race(
        num_envs=races, n_agents=2, num_iterations=extra, gate_size=7.0,
        gru=gru, seed=1, resume=True, checkpoint_dir=str(d / "ck"),
        checkpoint_every=250, log_dir=str(d / "log"), print_every=50)
    total = start + extra
    # only steps that actually saved: checkpoint cadence quantizes to the
    # scan-chunk boundary, so enumerate the ck dir instead of assuming
    saved = sorted(int(q.name.split("_")[1])
                   for q in (d / "ck").glob("step_*"))
    peak, peak_train = _peak_step(d / "log", saved)
    evals = {}
    for tag, step in (("peak", peak), ("final", total)):
        evals[tag] = dict(
            _eval_vision_race(str(d / "ck"), step, agents=2,
                              gate_size=7.0), step=step)
    _save("gru_gem_ext", {
        "total_iters": total,
        "train_steps_per_s": res.steps_per_second,
        "peak_step": peak, "peak_train_gates": peak_train,
        "eval": evals})


def race_lowres(iters=600, envs=1024):
    """Does the retina dial transfer to the RACE lane? Risk: at 64x48 the
    0.35 m gate band subtends ~0.9 px from across the 12 m track (the
    frame_width lesson of VERDICT r2 #8), so one arm widens the band to
    compensate. Single-seed exploratory vs race_kernel_ab's kernel_s0
    (same recipe at 96x72: last50 8.39)."""
    from fpyv_tpu.apps.train import train_vision_race

    arms = {
        "r64x48_fw035": {"rig": _rig(64, 48)},
        "r64x48_fw050": {"rig": _rig(64, 48), "frame_width": 0.5},
    }
    out = {}
    for name, kw in arms.items():
        d = RUNS / "race_lowres" / name
        try:
            res = train_vision_race(
                num_envs=envs, num_iterations=iters, gate_size=7.0,
                frame_stack=4, seed=0, log_dir=str(d), print_every=200,
                **kw)
            out[name] = dict(_curve_stats(d, key="mean_gates_passed"),
                             steps_per_s=res.steps_per_second)
        except Exception as e:
            out[name] = {"error": repr(e)[:300]}
        print("ARM", name, json.dumps(out[name]), flush=True)
    _save("race_lowres", out)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("experiment")
    p.add_argument("kwargs", nargs="*", help="k=v overrides (ints)")
    a = p.parse_args()
    fn = getattr(sys.modules[__name__], a.experiment)
    kw = {}
    for item in a.kwargs:
        k, v = item.split("=")
        kw[k] = int(v)
    fn(**kw)
