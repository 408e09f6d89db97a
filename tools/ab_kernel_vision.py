"""400-iteration seed-matched A/B: scan rollout vs policy-in-kernel rollout
(VERDICT r3 #1's done-criterion run). Arms share task, seed and learner
config; only the rollout engine (and the epoch count, the measured learner
lever) differ.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/ab_kernel_vision.py [iters]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

OUT = Path(__file__).resolve().parents[1] / "runs" / "r4"


def main(iters=400):
    from fpyv_tpu.apps.train import train_vision

    arms = {
        "scan_e2": dict(rollout="scan", update_epochs=2),
        "kernel_e2": dict(rollout="kernel", update_epochs=2),
        "scan_e1": dict(rollout="scan", update_epochs=1),
        "kernel_e1": dict(rollout="kernel", update_epochs=1),
        "kernel_e1_fast": dict(rollout="kernel", update_epochs=1,
                               kernel_exact_logprob=False),
    }
    results = {}
    for tag, kw in arms.items():
        log = OUT / "ab_kernel" / tag
        res = train_vision(num_envs=1024, num_iterations=iters, seed=0,
                           scan_chunk=20, print_every=50,
                           log_dir=str(log), **kw)
        rows = [json.loads(l) for l in open(log / "metrics.jsonl")]
        r = np.asarray([x["mean_reward"] for x in rows], np.float64)
        d = np.asarray([x["mean_episode_done"] for x in rows], np.float64)
        results[tag] = {
            "steps_per_s": res.steps_per_second,
            "reward_first": float(r[0]),
            "reward_last50": float(r[-50:].mean()),
            "reward_auc": float(r.mean()),
            "done_rate_last100": float(d[-100:].mean()),
        }
        print("ARM", tag, json.dumps(results[tag]), flush=True)
    (OUT / "ab_kernel" / "result.json").write_text(
        json.dumps(results, indent=1))
    print("RESULT", json.dumps(results), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 400)
