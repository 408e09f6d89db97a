"""Round-4 experiment campaign: multi-agent stability, pixel memory,
opponent-aware racing (VERDICT r3 #3/#4/#6).

Each experiment trains on the real chip, keeps periodic checkpoints + a
metrics JSONL, then runs DETERMINISTIC evals (actor mean, fixed seed)
at the peak-of-training checkpoint and the final checkpoint, writing
runs/r4/<name>/result.json. Evidence scripts, not library code:

    PYTHONPATH=/root/repo:/root/.axon_site python tools/experiments_r4.py ma2_baseline
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

RUNS = Path(__file__).resolve().parents[1] / "runs" / "r4"


def _read_metric(log_dir, key="mean_gates_passed"):
    rows = []
    with open(Path(log_dir) / "metrics.jsonl") as f:
        for line in f:
            r = json.loads(line)
            if key in r:
                rows.append((r["step"], r[key]))
    return rows


def _peak_step(log_dir, saved_steps, key="mean_gates_passed", window=100):
    """Saved checkpoint whose trailing-`window` training mean of `key`
    is highest (point samples are too noisy to call a 'peak')."""
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


def _eval_race(ck, step, *, agents, gate_size, num_envs=64, steps=2000,
               seed=7):
    from fpyv_tpu.apps.play import play_policy

    return play_policy(
        checkpoint_dir=ck, env_name="race", steps=steps, num_envs=num_envs,
        seed=seed, n_agents=agents, gate_size=gate_size,
        step_checkpoint=step, chunk=500)


def _save(name, obj):
    out = RUNS / name / "result.json"
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(obj, indent=1))
    print("RESULT", name, json.dumps(obj))


# ---------------------------------------------------------------------------
# Experiments
# ---------------------------------------------------------------------------


def ma2_baseline(iters=1500, races=512):
    """Round-3 repro with receipts: 2-agent vision race, eval table at the
    peak checkpoint vs the final one — is the 32 -> 15 settle a policy
    degradation (peak ckpt evals much better) or a training-metric artifact
    (collision-pressure equilibrium of the STOCHASTIC rollout)?"""
    from fpyv_tpu.apps.train import train_vision_race

    d = RUNS / "ma2_baseline"
    res = train_vision_race(
        num_envs=races, n_agents=2, num_iterations=iters, gate_size=7.0,
        checkpoint_dir=str(d / "ck"), checkpoint_every=100,
        log_dir=str(d / "log"), print_every=50)
    saved = list(range(100, iters + 1, 100))
    peak, peak_train = _peak_step(d / "log", saved)
    evals = {}
    for tag, step in (("peak", peak), ("final", iters)):
        evals[tag] = dict(_eval_vision_race(str(d / "ck"), step, agents=2,
                                            gate_size=7.0), step=step)
    _save("ma2_baseline", {
        "train_steps_per_s": res.steps_per_second,
        "peak_step": peak, "peak_train_gates": peak_train,
        "eval": evals})


def ma2_collision_curriculum(p1=800, p2=700, races=512):
    """The stabilizer ROADMAP suggested: learn the racing line with
    inter-agent contact OFF, then resume under the standard 0.35 m
    collision radius."""
    from fpyv_tpu.apps.train import train_vision_race

    d = RUNS / "ma2_curriculum"
    common = dict(num_envs=races, n_agents=2, gate_size=7.0,
                  checkpoint_dir=str(d / "ck"), checkpoint_every=100,
                  log_dir=str(d / "log"), print_every=50)
    train_vision_race(num_iterations=p1, agent_collision_radius=0.0,
                      **common)
    res = train_vision_race(num_iterations=p2, agent_collision_radius=0.35,
                            resume=True, **common)
    total = p1 + p2
    saved = list(range(100, total + 1, 100))
    peak, peak_train = _peak_step(d / "log", saved)
    evals = {}
    for tag, step in (("peak", peak), ("final", total)):
        evals[tag] = dict(_eval_vision_race(str(d / "ck"), step, agents=2,
                                            gate_size=7.0), step=step)
    _save("ma2_curriculum", {
        "phase1_no_collision_iters": p1, "phase2_iters": p2,
        "train_steps_per_s": res.steps_per_second,
        "peak_step": peak, "peak_train_gates": peak_train,
        "eval": evals})


def ma4(iters=1500, races=256):
    """Scale-up: 4-agent pixel race (4 FPV renders per race step)."""
    from fpyv_tpu.apps.train import train_vision_race

    d = RUNS / "ma4"
    res = train_vision_race(
        num_envs=races, n_agents=4, num_iterations=iters, gate_size=7.0,
        checkpoint_dir=str(d / "ck"), checkpoint_every=100,
        log_dir=str(d / "log"), print_every=50)
    saved = list(range(100, iters + 1, 100))
    peak, peak_train = _peak_step(d / "log", saved)
    evals = {}
    for tag, step in (("peak", peak), ("final", iters)):
        evals[tag] = dict(_eval_vision_race(str(d / "ck"), step, agents=4,
                                            gate_size=7.0, num_envs=32),
                          step=step)
    _save("ma4", {
        "train_steps_per_s": res.steps_per_second,
        "peak_step": peak, "peak_train_gates": peak_train,
        "eval": evals})


def pixels_memory(k=4, p1=800, p2=2700, races=1024):
    """VERDICT r3 #3: pure pixels + IMU (gate_onehot OFF) with a K-frame
    stack, same 2-phase gate curriculum as the round-3 ablation (which
    plateaued at ~2 laps with a single frame)."""
    from fpyv_tpu.apps.train import train_vision_race

    d = RUNS / f"pixels_memory_k{k}"
    common = dict(num_envs=races, n_agents=1, gate_onehot=False,
                  frame_stack=k,
                  checkpoint_dir=str(d / "ck"), checkpoint_every=200,
                  log_dir=str(d / "log"), print_every=50)
    train_vision_race(num_iterations=p1, gate_size=7.0, **common)
    res = train_vision_race(num_iterations=p2, gate_size=5.0, resume=True,
                            **common)
    total = p1 + p2
    saved = list(range(200, total + 1, 200))
    peak, peak_train = _peak_step(d / "log", saved, window=200)
    evals = {}
    for tag, step in (("peak", peak), ("final", total)):
        evals[tag] = dict(
            _eval_vision_race(str(d / "ck"), step, agents=1, gate_size=5.0,
                              frame_stack=k, gate_onehot=False), step=step)
    _save(f"pixels_memory_k{k}", {
        "frame_stack": k,
        "train_steps_per_s": res.steps_per_second,
        "peak_step": peak, "peak_train_gates": peak_train,
        "eval": evals})


def opponent_ablation(iters=1000, races=1024, agents=4):
    """VERDICT r3 #6, state-obs race at fixed seed: (a) baseline,
    (b) others-relpos block zeroed, (c) + overtake reward. Deterministic
    eval reports gates + contact + overtakes per agent for each arm."""
    from fpyv_tpu.apps.train import train_race

    arms = {
        "baseline": {},
        "no_others_obs": {"others_in_obs": False},
        "overtake_reward": {"w_overtake": 0.5},
    }
    out = {}
    for name, kw in arms.items():
        d = RUNS / "opponent_ablation" / name
        res = train_race(
            num_envs=races, n_agents=agents, num_iterations=iters,
            gate_size=7.0, seed=0, checkpoint_dir=str(d / "ck"),
            checkpoint_every=iters, log_dir=str(d / "log"),
            print_every=100, **kw)
        ev = _eval_race(str(d / "ck"), iters, agents=agents, gate_size=7.0)
        rows = _read_metric(d / "log")
        out[name] = {
            "train_steps_per_s": res.steps_per_second,
            "train_gates_last100": (
                sum(v for _, v in rows[-100:]) / max(len(rows[-100:]), 1)),
            "eval": ev}
    _save("opponent_ablation", out)




def onehot_memory(k=4, p1=800, p2=2700, races=1024):
    """Frame stack ON TOP of the onehot-informed racer: does temporal
    memory push past round 3's 88.9-gate flagship?"""
    from fpyv_tpu.apps.train import train_vision_race

    d = RUNS / f"onehot_memory_k{k}"
    common = dict(num_envs=races, n_agents=1, gate_onehot=True,
                  frame_stack=k,
                  checkpoint_dir=str(d / "ck"), checkpoint_every=200,
                  log_dir=str(d / "log"), print_every=50)
    train_vision_race(num_iterations=p1, gate_size=7.0, **common)
    res = train_vision_race(num_iterations=p2, gate_size=5.0, resume=True,
                            **common)
    total = p1 + p2
    saved = list(range(200, total + 1, 200))
    peak, peak_train = _peak_step(d / "log", saved, window=200)
    evals = {}
    for tag, step in (("peak", peak), ("final", total)):
        evals[tag] = dict(
            _eval_vision_race(str(d / "ck"), step, agents=1, gate_size=5.0,
                              frame_stack=k), step=step)
    _save(f"onehot_memory_k{k}", {
        "frame_stack": k,
        "train_steps_per_s": res.steps_per_second,
        "peak_step": peak, "peak_train_gates": peak_train,
        "eval": evals})


def ma4_phase2(p2=1000, races=256):
    """Resume the 4-agent pixel race at the standard 5 m gates (the same
    two-phase curriculum the solo racers use)."""
    from fpyv_tpu.apps.train import train_vision_race

    d = RUNS / "ma4"  # continues the ma4 checkpoints
    res = train_vision_race(
        num_envs=races, n_agents=4, num_iterations=p2, gate_size=5.0,
        resume=True, checkpoint_dir=str(d / "ck"), checkpoint_every=100,
        log_dir=str(d / "log"), print_every=50)
    total = 1500 + p2
    ev = _eval_vision_race(str(d / "ck"), total, agents=4, gate_size=5.0,
                           num_envs=32)
    _save("ma4_phase2", {
        "train_steps_per_s": res.steps_per_second,
        "eval_final_gate5": ev})



def obstacle_race(n=3, k=4, p1=800, p2=1700, races=1024):
    """Dodge-while-racing: moving obstacle spheres orbit the gate circle,
    rendered in the FPV frame (contact = crash). Frame-stacked onehot
    recipe; eval WITH the obstacles and (ablation) the same checkpoint on
    a clean track."""
    from fpyv_tpu.apps.train import train_vision_race

    d = RUNS / f"obstacle_race_n{n}"
    common = dict(num_envs=races, n_agents=1, frame_stack=k, n_obstacles=n,
                  checkpoint_dir=str(d / "ck"), checkpoint_every=200,
                  log_dir=str(d / "log"), print_every=50)
    train_vision_race(num_iterations=p1, gate_size=7.0, **common)
    res = train_vision_race(num_iterations=p2, gate_size=5.0, resume=True,
                            **common)
    total = p1 + p2
    ev = dict(
        with_obstacles=_eval_vision_race(
            str(d / "ck"), total, agents=1, gate_size=5.0, frame_stack=k,
            n_obstacles=n),
        clean_track=_eval_vision_race(
            str(d / "ck"), total, agents=1, gate_size=5.0, frame_stack=k,
            n_obstacles=0),
    )
    _save(f"obstacle_race_n{n}", {
        "n_obstacles": n, "frame_stack": k,
        "train_steps_per_s": res.steps_per_second,
        "eval": ev})



def ma4_framestack(k=4, iters=1500, races=256):
    """4-agent pixel race WITH temporal memory (every other config gained
    from the stack; ma4 trained single-frame)."""
    from fpyv_tpu.apps.train import train_vision_race

    d = RUNS / f"ma4_fs{k}"
    res = train_vision_race(
        num_envs=races, n_agents=4, num_iterations=iters, gate_size=7.0,
        frame_stack=k,
        checkpoint_dir=str(d / "ck"), checkpoint_every=100,
        log_dir=str(d / "log"), print_every=50)
    saved = list(range(100, iters + 1, 100))
    peak, peak_train = _peak_step(d / "log", saved)
    evals = {}
    for tag, step in (("peak", peak), ("final", iters)):
        evals[tag] = dict(_eval_vision_race(str(d / "ck"), step, agents=4,
                                            gate_size=7.0, frame_stack=k,
                                            num_envs=32), step=step)
    _save(f"ma4_fs{k}", {
        "frame_stack": k,
        "train_steps_per_s": res.steps_per_second,
        "peak_step": peak, "peak_train_gates": peak_train,
        "eval": evals})


def distributed_race_smoke(iters=60, races=256):
    """Real-chip compile + run of the distributed shared-policy race
    program (the CPU-mesh tests cover 8-way sharding; this receipts the
    TPU lowering of the shard_map race iteration)."""
    from fpyv_tpu.apps.train import train_race

    res = train_race(num_envs=races, n_agents=4, num_iterations=iters,
                     distributed=True, gate_size=7.0, scan_chunk=20,
                     print_every=20)
    _save("distributed_race_smoke", {
        "train_steps_per_s": res.steps_per_second,
        "reward_first": res.mean_reward_first,
        "reward_last": res.mean_reward_last})


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
