"""Ship a params-only flagship checkpoint for bench.py's racing eval key.

Full training checkpoints carry the whole PpoState (optimizer moments, the
env bank with frame stacks, RNG keys) — hundreds of MB that don't belong in
the repo. This extracts JUST the policy parameters from a training
checkpoint into runs/flagship/ck plus a meta.json naming the recipe, so
``bench.py`` (measure_flagship_gates) can deterministically evaluate the
shipped racer on any machine.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/make_flagship.py \
        runs/r5/hardest_ext/ck --step 5600 \
        --recipe "pixels+IMU, frame_stack=4, 3 moving obstacles, 5 m gates" \
        --play '{"gate_onehot": false, "frame_stack": 4, "n_obstacles": 3}'
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("src", help="training checkpoint dir (step_* subdirs)")
    p.add_argument("--step", type=int, default=None, help="default: latest")
    p.add_argument("--recipe", default="", help="human-readable recipe line")
    p.add_argument("--play", default="{}",
                   help="JSON play_policy kwargs for the eval")
    p.add_argument("--out", default=str(REPO / "runs" / "flagship"))
    a = p.parse_args()

    from fpyv_tpu.utils.checkpoint import (latest_step, restore_checkpoint,
                                           save_checkpoint)

    step = a.step if a.step is not None else latest_step(a.src)
    raw = restore_checkpoint(a.src, step)
    out = Path(a.out)
    save_checkpoint(out / "ck", step, {"params": raw["params"]})
    meta = {"recipe": a.recipe, "source": str(a.src), "step": step,
            "play_kwargs": json.loads(a.play)}
    (out / "meta.json").write_text(json.dumps(meta, indent=1))
    print("flagship written:", out, json.dumps(meta))


if __name__ == "__main__":
    main()
