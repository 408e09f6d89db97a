"""Test config: run on CPU with 8 virtual devices so sharding/collective
logic is exercised without TPU hardware (SURVEY.md §4: fake-mesh strategy).

Must set env vars BEFORE jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the ambient env may pin a TPU platform
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# jax may be pre-imported by the environment's sitecustomize with a TPU
# platform pinned — the config update (unlike the env var) always wins.
jax.config.update("jax_platforms", "cpu")
# x64 on for tests: parity tests compare against the float64 oracle exactly;
# float32 behavior is exercised via explicit dtype casts where relevant.
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the suite is compile-bound (vision-PPO /
# distributed programs take 10-20 s each to build), so repeat runs drop to
# a fraction of the cold time. Safe to share across workers; keyed by HLO.
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/fpyv_tpu_jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 virtual CPU devices, got {len(devs)}"
    return devs
