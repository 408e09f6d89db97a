"""Self-level flight modes: ANGLE and HORIZON on top of the acro stack.

The reference flies acro only (rates sticks, components.py:179-196); these
are the standard self-level modes every FPV firmware layers on the same
rates loop (Betaflight-style semantics):

- **ANGLE**: roll/pitch sticks command *attitude angles* (stick x
  max_angle); yaw stick stays a rate. A P-law on the attitude error (via
  the reference-parity rates controller, control/rates_controller.py)
  produces body rates.
- **HORIZON**: blends ANGLE and acro per step — self-level at stick
  center, raw acro rates at full deflection; blend = max(|roll|, |pitch|)
  stick magnitude.

Both return an *acro-compatible action* (..., 4) so they drop in front of
any env/app built on ``drone_step``: the output's rate channels encode the
commanded rates through the drone's own mapping
``rates_cmd = clip(-action[:3] * max_rates)`` (components.py:185 — note the
negation), throttle passes through. Stick sign convention matches acro:
full +roll stick rotates the same direction in every mode.

All functions batch over leading dims and are jit/vmap/scan-safe.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
from flax import struct

from fpyv_tpu.control.rates_controller import (
    RatesControllerParams,
    RatesControllerState,
    rates_controller_init,
    rates_controller_step,
)
from fpyv_tpu.ops import rotations as rot


@dataclass(frozen=True)
class FlightModeParams:
    max_angle_deg: float = 45.0  # full stick = this roll/pitch angle
    max_yaw_rate: float = 200.0  # deg/s, yaw stick stays a rate in ANGLE
    max_rates: float = 200.0  # acro rates ceiling (params.yaml max_rates)
    controller: RatesControllerParams = field(
        default_factory=lambda: RatesControllerParams(
            gain=8.0, max_rates=200.0,
            # self-level wants a crisper loop than the hover demo tuning
            state_transition_coef=1.0, goal_transition_coef=1.0,
            error_transition_coef=1.0,
        ))


@struct.dataclass
class FlightModeState:
    controller: RatesControllerState


def flight_mode_init(batch_shape=(), dtype=jnp.float32) -> FlightModeState:
    return FlightModeState(controller=rates_controller_init(batch_shape, dtype))


def rates_to_action(rates_deg: jnp.ndarray, max_rates: float) -> jnp.ndarray:
    """Invert the drone's ``rates_cmd = -action * max_rates`` mapping
    (components.py:185) so commanded rates survive action2force exactly
    (up to the low-pass)."""
    return jnp.clip(-rates_deg / max_rates, -1.0, 1.0)


def _level_rates(params: FlightModeParams, state: FlightModeState,
                 R_current: jnp.ndarray, sticks: jnp.ndarray):
    """Body rates (deg/s) that drive attitude toward the stick-commanded
    roll/pitch at the current yaw. sticks: (..., 4) acro-layout."""
    euler = rot.rotmat_to_euler(R_current)  # (..., 3) roll, pitch, yaw
    max_angle = jnp.deg2rad(params.max_angle_deg)
    # acro +stick nets a POSITIVE angle (the action negation and the
    # transposed rotation composition cancel — measured through drone_step),
    # so the self-level target keeps that sign and mode switches don't flip
    # the airframe
    tgt_roll = sticks[..., 0] * max_angle
    tgt_pitch = sticks[..., 1] * max_angle
    goal = jnp.stack([tgt_roll, tgt_pitch, euler[..., 2]], axis=-1)
    R_goal = rot.euler_to_rotmat(goal)
    ctrl, rates, _err = rates_controller_step(
        params.controller, state.controller, R_current, R_goal)
    # yaw stays a rate channel with acro's sign convention: the commanded
    # rate is -stick * max (the drone's mapping applies that sign when this
    # passes back through rates_to_action -> action2force)
    rates = rates.at[..., 2].set(-sticks[..., 2] * params.max_yaw_rate)
    return FlightModeState(controller=ctrl), rates


def angle_mode_action(
    params: FlightModeParams,
    state: FlightModeState,
    R_current: jnp.ndarray,  # (..., 3, 3) current attitude
    sticks: jnp.ndarray,  # (..., 4) [roll, pitch, yaw, throttle] in [-1, 1]
):
    """ANGLE mode: returns (state, acro_action) — sticks command angles."""
    state, rates = _level_rates(params, state, R_current, sticks)
    action = jnp.concatenate(
        [rates_to_action(rates, params.max_rates), sticks[..., 3:4]], axis=-1)
    return state, action


def horizon_mode_action(
    params: FlightModeParams,
    state: FlightModeState,
    R_current: jnp.ndarray,
    sticks: jnp.ndarray,
):
    """HORIZON mode: returns (state, acro_action) — self-level at center
    stick, pure acro at full deflection."""
    state, level_rates = _level_rates(params, state, R_current, sticks)
    level_part = rates_to_action(level_rates, params.max_rates)
    acro_part = sticks[..., :3]
    blend = jnp.clip(
        jnp.maximum(jnp.abs(sticks[..., 0]), jnp.abs(sticks[..., 1])), 0.0, 1.0
    )[..., None]
    mixed = blend * acro_part + (1.0 - blend) * level_part
    action = jnp.concatenate([mixed, sticks[..., 3:4]], axis=-1)
    return state, action
