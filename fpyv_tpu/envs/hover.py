"""Hover env + rates-PID pilot: BASELINE config #1.

"single drone, rates-PID hover, state-vector obs, fixed seed" — the drone
must hold a target position/attitude. The scripted :class:`HoverPilot`
closes the loop the way the reference's rotation_pid.py main does: the
RotationRatesController turns the attitude error into body-rate commands
(rates/max_rates = the action's first three channels, with the sign flip
the drone's action mapping expects), while a PID on altitude error drives
throttle through the thrust curve's inverse.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from fpyv_tpu.control.pid import PidParams, PidState, pid_init, pid_step
from fpyv_tpu.control.rates_controller import (
    RatesControllerParams,
    RatesControllerState,
    rates_controller_init,
    rates_controller_step,
)
from fpyv_tpu.envs.base import tree_where
from fpyv_tpu.ops import rotations as rot
from fpyv_tpu.physics.drone import (
    DroneParams,
    DroneState,
    _att_to_rotmat,
    drone_reset,
    drone_step,
)
from fpyv_tpu.physics.world import World, empty_world


@struct.dataclass
class HoverState:
    drone: DroneState
    target_pos: jnp.ndarray  # (..., 3)
    t: jnp.ndarray
    key: jnp.ndarray


@dataclass(frozen=True)
class HoverEnv:
    params: DroneParams = field(default_factory=DroneParams)
    spawn_height: Tuple[float, float] = (4.0, 12.0)
    spawn_jitter: float = 2.0
    max_episode_steps: int = 1000
    pos_tolerance: float = 0.25
    dtype: type = jnp.float32

    def default_world(self) -> World:
        return empty_world(ground=True, dtype=self.dtype)

    @property
    def obs_dim(self) -> int:
        att = 9 if self.params.att_mode == "rotmat" else 4
        return 3 + 3 + att + 3 + 1

    def _obs(self, state: HoverState):
        d = state.drone
        att = d.att
        if self.params.att_mode == "rotmat":
            att = att.reshape(att.shape[:-2] + (9,))
        return jnp.concatenate(
            [state.target_pos - d.pos, d.vel, att,
             d.rates / self.params.max_rates,
             d.thrust[..., None] / self.params.thrust_curve.max_force],
            axis=-1).astype(self.dtype)

    def reset(self, key):
        key, kp, kt = jax.random.split(key, 3)
        target = jnp.array([0.0, 0.0, 0.0], self.dtype).at[2].set(
            jax.random.uniform(kt, (), self.dtype, *self.spawn_height))
        pos = target + self.spawn_jitter * jax.random.normal(kp, (3,), self.dtype)
        pos = pos.at[2].set(jnp.maximum(pos[2], 1.0))
        drone = drone_reset(self.params, pos, jnp.zeros(3, self.dtype),
                            jnp.zeros(3, self.dtype))
        state = HoverState(drone=drone, target_pos=target,
                           t=jnp.zeros((), jnp.int32), key=key)
        return state, self._obs(state)

    def step(self, state: HoverState, action, world: Optional[World] = None):
        world = self.default_world() if world is None else world
        drone, _ = drone_step(self.params, state.drone, action, world)
        err = jnp.linalg.norm(state.target_pos - drone.pos, axis=-1)
        reward = (-err - 10.0 * drone.done.astype(self.dtype)
                  + (err < self.pos_tolerance).astype(self.dtype))
        t = state.t + 1
        done = drone.done | (t >= self.max_episode_steps)
        next_state = state.replace(drone=drone, t=t)
        key, kr = jax.random.split(state.key)
        reset_state, _ = self.reset(kr)
        next_state = tree_where(done, reset_state, next_state.replace(key=key))
        return next_state, self._obs(next_state), reward, done, {"pos_err": err}


# ---------------------------------------------------------------------------
# Scripted rates-PID hover pilot
# ---------------------------------------------------------------------------


@struct.dataclass
class HoverPilotState:
    rates: RatesControllerState
    alt_pid: PidState


@dataclass(frozen=True)
class HoverPilot:
    """Attitude via RotationRatesController + altitude via PID -> acro action."""

    drone_params: DroneParams
    rates: RatesControllerParams = field(default_factory=lambda:
                                         RatesControllerParams(gain=8.0,
                                                               max_rates=200.0))
    # PID outputs a thrust in Newtons around hover
    alt_pid: PidParams = field(default_factory=lambda: PidParams(
        kP=6.0, kI=2.0, kD=3.0, dt=1 / 60, integral_clip=5.0,
        min_output=1.0, max_output=28.0, derivative_transition_rate=0.5))

    def init(self, batch_shape=(), dtype=jnp.float32) -> HoverPilotState:
        return HoverPilotState(
            rates=rates_controller_init(batch_shape, dtype),
            alt_pid=pid_init(batch_shape, dtype),
        )

    def act(self, pstate: HoverPilotState, drone: DroneState, target_pos):
        p = self.drone_params
        R = _att_to_rotmat(p, drone.att)
        # goal attitude: level, tilted slightly toward the lateral error
        lateral = target_pos[..., :2] - drone.pos[..., :2]
        lateral = jnp.clip(lateral - 0.8 * drone.vel[..., :2], -3.0, 3.0)
        # desired roll/pitch (small angles): pitch toward +x err, roll toward -y err
        pitch = jnp.clip(0.08 * lateral[..., 0], -0.35, 0.35)
        roll = jnp.clip(-0.08 * lateral[..., 1], -0.35, 0.35)
        goal_euler = jnp.stack([roll, pitch, jnp.zeros_like(roll)], axis=-1)
        R_goal = rot.euler_to_rotmat(goal_euler)
        rstate, rates_cmd, _ = rates_controller_step(self.rates, pstate.rates,
                                                     R, R_goal)
        # the drone negates action[:3] (components.py:185): feed -rates/max
        act_rates = -rates_cmd / p.max_rates

        # altitude: PID(error) gives desired thrust in N; note PID error sign
        # is (current - target), so target force rises when below target.
        alt_state, thrust_n = pid_step(self.alt_pid, pstate.alt_pid,
                                       target_pos[..., 2], drone.pos[..., 2])
        throttle = p.thrust_curve.thrust_to_throttle(thrust_n)
        action = jnp.concatenate([act_rates, throttle[..., None]], axis=-1)
        return HoverPilotState(rates=rstate, alt_pid=alt_state), action
