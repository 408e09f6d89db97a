"""Round-5 experiment campaign (VERDICT r4): learner speed A/Bs, frontier
convergence, 4-agent fairness, race-kernel receipts.

Evidence scripts, not library code — same shape as tools/experiments_r4.py:

    PYTHONPATH=/root/repo:/root/.axon_site python tools/experiments_r5.py hardest_ext
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
RUNS = REPO / "runs" / "r5"
R4 = REPO / "runs" / "r4"


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


def _continue_from_r4(src_name, dst_name):
    """Copy an r4 checkpoint+log tree into r5 so the extension resumes
    without touching the round-4 artifacts."""
    d = RUNS / dst_name
    if not (d / "ck").exists():
        d.mkdir(parents=True, exist_ok=True)
        shutil.copytree(R4 / src_name / "ck", d / "ck")
        shutil.copytree(R4 / src_name / "log", d / "log")
    return d


# ---------------------------------------------------------------------------
# Experiments
# ---------------------------------------------------------------------------


def hardest_ext(extra=4000, races=1024):
    """VERDICT r4 #5: converge the frontier config (pixels + IMU + 4-frame
    memory + 3 moving obstacles, NO gate onehot). Round 4 stopped at 2000
    iterations / 6.4 gates with the curve still climbing; every sibling
    lane kept improving with budget. Extend to 2000+extra at the 5 m gates
    and locate the ceiling like onehot_memory_k4_ext did."""
    from fpyv_tpu.apps.train import train_vision_race

    from fpyv_tpu.utils.checkpoint import latest_step

    d = _continue_from_r4("hardest_vision", "hardest_ext")
    start = latest_step(str(d / "ck")) or 2000
    res = train_vision_race(
        num_envs=races, n_agents=1, num_iterations=extra, gate_size=5.0,
        gate_onehot=False, frame_stack=4, n_obstacles=3, resume=True,
        checkpoint_dir=str(d / "ck"), checkpoint_every=200,
        log_dir=str(d / "log"), print_every=50)
    total = start + extra
    saved = list(range(2200, total + 1, 200))
    peak, peak_train = _peak_step(d / "log", saved)
    evals = {}
    for tag, step in (("peak", peak), ("final", total)):
        evals[tag] = dict(
            _eval_vision_race(str(d / "ck"), step, agents=1, gate_size=5.0,
                              frame_stack=4, gate_onehot=False,
                              n_obstacles=3), step=step)
    _save("hardest_ext", {
        "total_iters": total,
        "train_steps_per_s": res.steps_per_second,
        "peak_step": peak, "peak_train_gates": peak_train,
        "eval": evals})


def hardest_ext_eval(total=6000, train_sps=0):
    """Eval-only recovery for hardest_ext (the training finished and saved
    every checkpoint; the in-process eval died on a mid-run source edit)."""
    d = RUNS / "hardest_ext"
    saved = list(range(2200, total + 1, 200))
    peak, peak_train = _peak_step(d / "log", saved)
    evals = {}
    for tag, step in (("peak", peak), ("final", total)):
        evals[tag] = dict(
            _eval_vision_race(str(d / "ck"), step, agents=1, gate_size=5.0,
                              frame_stack=4, gate_onehot=False,
                              n_obstacles=3), step=step)
    _save("hardest_ext", {
        "total_iters": total,
        "train_steps_per_s": train_sps or None,
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

    arms = {
        "base_e2": {},
        "mu_e2": {"adam_mu_dtype": "bf16"},
        "pool2_e2": {"patch_pool": 2},
        "pool4_e2": {"patch_pool": 4},
        "pool4_mu_e2": {"patch_pool": 4, "adam_mu_dtype": "bf16"},
        "pool4_mu_e1": {"patch_pool": 4, "adam_mu_dtype": "bf16",
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


def learner_ab(iters=400, envs=1024, seeds=3, arm="pool4_mu_e2"):
    """VERDICT r4 #1 step 2: seed-matched convergence A/B of the winning
    learner arm vs the round-4 kernel-e2 default (AUC + last-50 + crash)."""
    from fpyv_tpu.apps.train import train_vision

    arms = {
        "base_e2": {},
        "pool4_e2": {"patch_pool": 4},
        "pool4_mu_e2": {"patch_pool": 4, "adam_mu_dtype": "bf16"},
        "pool4_mu_e1": {"patch_pool": 4, "adam_mu_dtype": "bf16",
                        "update_epochs": 1},
    }
    out = {}
    for name in ("base_e2", arm):
        per_seed = {}
        for seed in range(seeds):
            d = RUNS / "learner_ab" / f"{name}_s{seed}"
            res = train_vision(num_envs=envs, num_iterations=iters,
                               seed=seed, log_dir=str(d), print_every=200,
                               **arms[name])
            per_seed[seed] = dict(_curve_stats(d),
                                  steps_per_s=res.steps_per_second)
            print("AB", name, seed, json.dumps(per_seed[seed]), flush=True)
        out[name] = per_seed
    _save("learner_ab", out)


def kernel_eblk(envs=1024, T=32):
    """VERDICT r4 #3: e_blk > 32 for the policy kernel. The round-4 blocker
    was the scoped-VMEM budget — dominated by the VMEM-resident fc weights
    (13952 x 256 bf16 = 7.2 MB); patch_pool=4 shrinks them to 1.8 MB, so
    sweep e_blk x pool and record every arm (even the losers)."""
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
