"""On-demand build of the native joystick adapter shared library."""

from __future__ import annotations

import subprocess
from pathlib import Path
from typing import Optional

_REPO_ROOT = Path(__file__).resolve().parents[2]
_SRC = _REPO_ROOT / "native" / "joystick" / "fpyv_joystick.cpp"
_LIB = _REPO_ROOT / "native" / "joystick" / "libfpyv_joystick.so"


def build_joystick_lib(force: bool = False) -> Optional[Path]:
    """Compile the adapter with g++ if needed. Returns the .so path, or None
    when the toolchain/headers are unavailable (callers degrade to no-device)."""
    if _LIB.exists() and not force:
        if _LIB.stat().st_mtime >= _SRC.stat().st_mtime:
            return _LIB
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", str(_SRC), "-o", str(_LIB)],
            check=True, capture_output=True, text=True, timeout=120,
        )
        return _LIB
    except (subprocess.CalledProcessError, FileNotFoundError,
            subprocess.TimeoutExpired):
        return None
