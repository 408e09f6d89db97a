"""Controllers: scalar PID, attitude rates controller, pixel-guidance autopilots."""

from fpyv_tpu.control.pid import PidParams, PidState, pid_init, pid_step  # noqa: F401
from fpyv_tpu.control.rates_controller import (  # noqa: F401
    RatesControllerParams,
    RatesControllerState,
    rates_controller_init,
    rates_controller_step,
)
