"""Checkpoint/resume: orbax persistence of full training state.

The reference has no sim/training persistence (SURVEY.md §5 — only joystick
calibration JSON). Here any pytree — typically the PpoState carrying
(params, opt_state, env_state, RNG keys) — round-trips through orbax so PPO
runs resume deterministically, including the per-env RNG keys that make
multi-host trajectories reproducible.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional

import jax


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(directory, step: int, state: Any) -> Path:
    """Save a pytree under directory/step_{step}. Overwrites that step."""
    path = Path(directory).absolute() / f"step_{step:010d}"
    cp = _checkpointer()
    cp.save(path, state, force=True)
    return path


def latest_step(directory) -> Optional[int]:
    d = Path(directory)
    if not d.exists():
        return None
    steps = sorted(
        int(p.name.split("_")[1]) for p in d.glob("step_*") if p.is_dir()
    )
    return steps[-1] if steps else None


def restore_checkpoint(directory, step: Optional[int] = None,
                       template: Any = None) -> Any:
    """Restore the given (or latest) step. `template` (an abstract pytree of
    like-shaped arrays) restores typed/sharded leaves when provided."""
    if step is None:
        step = latest_step(directory)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {directory}")
    path = Path(directory).absolute() / f"step_{step:010d}"
    cp = _checkpointer()
    if template is not None:
        import orbax.checkpoint as ocp

        return cp.restore(path, item=template)
    return cp.restore(path)
