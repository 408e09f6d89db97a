"""Aux subsystems: checkpointing, profiling, metrics (SURVEY.md §5)."""

from fpyv_tpu.utils.profiling import timeit, Throughput, trace  # noqa: F401
from fpyv_tpu.utils.metrics import MetricsLogger  # noqa: F401
from fpyv_tpu.utils.checkpoint import (  # noqa: F401
    restore_checkpoint,
    save_checkpoint,
    latest_step,
)
from fpyv_tpu.utils.debug import assert_finite, finite_mask  # noqa: F401
