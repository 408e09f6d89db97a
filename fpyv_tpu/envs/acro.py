"""Acro-mode drone env: the vectorized rebuild of the reference's sim loop.

The reference's "env" is the ``__main__`` loop of src/core/simulator.py:83-177
(world build → target update → step → crash check) plus the Drone physics.
Here it's a functional env over the fused physics step, built for
``vmap``/``shard_map`` over thousands of envs (BASELINE config #2:
"4096-env vmapped acro-mode racer ... random resets").

Features:
- full drone physics (motor curve, quadratic drag, motor-point collisions,
  double-rotation parity quirk) via fpyv_tpu.physics.drone
- shared SoA world (targets on circular paths, cylinders, ground)
- random resets from configurable position/velocity/attitude ranges
- per-env domain randomization of mass/drag/thrust (BASELINE config #3)
- auto-reset on crash (the vectorized analog of simulator.py:92-93's break)
- state-vector observation; camera-pixel observations are provided by
  fpyv_tpu.vision wrappers
- reward: target-chase progress + alive bonus - crash penalty (the
  reference has no reward; this mirrors its point-and-shoot chase task)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from fpyv_tpu.envs.base import tree_where
from fpyv_tpu.ops import rotations as rot
from fpyv_tpu.physics.drone import (
    DomainRand,
    DroneParams,
    DroneState,
    drone_reset,
    drone_step,
)
from fpyv_tpu.physics.world import World, empty_world, update_targets


@struct.dataclass
class AcroState:
    drone: DroneState
    domain_rand: DomainRand
    t: jnp.ndarray  # (...,) int32 steps since episode start
    prev_dist: jnp.ndarray  # (...,) distance to chased target at prev step
    key: jnp.ndarray  # per-env PRNG key
    episode_return: jnp.ndarray  # (...,) running return (metrics)
    wind: jnp.ndarray  # (..., 3) world-frame wind (simulator.py:63's vector,
    #                    per-env; resampled at reset when the env randomizes)


@dataclass(frozen=True)
class AcroEnv:
    params: DroneParams = field(default_factory=DroneParams)
    # reset distributions (uniform ranges)
    pos_low: Tuple[float, float, float] = (-5.0, -5.0, 4.0)
    pos_high: Tuple[float, float, float] = (5.0, 5.0, 12.0)
    vel_scale: float = 1.0
    ypr_range_deg: float = 30.0
    # episode
    max_episode_steps: int = 1000
    # reward weights
    w_progress: float = 1.0
    w_alive: float = 0.01
    w_crash: float = 10.0
    w_rates: float = 0.0001  # action smoothness penalty on commanded rates
    # domain randomization (BASELINE config #3); None disables
    randomize: bool = False
    mass_range: Tuple[float, float] = (0.8, 1.2)
    drag_range: Tuple[float, float] = (0.7, 1.3)
    thrust_range: Tuple[float, float] = (0.85, 1.15)
    # wind: constant world-frame base vector (the reference's
    # wind_velocity_vector, simulator.py:63) + optional per-env N(0, scale)
    # gusts resampled every episode (enters drag, kinematics.py:33-38)
    wind: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    wind_scale: float = 0.0
    dtype: type = jnp.float32

    # ---- world ------------------------------------------------------------

    def default_world(self) -> World:
        """One target circling at radius 25 over ground (params.yaml targets block)."""
        w = empty_world(n_spheres=1, n_cylinders=0, ground=True, dtype=self.dtype)
        center = jnp.asarray([0.0, 0.0, 3.0], self.dtype)
        return w.replace(
            sphere_center=center[None, :],
            sphere_radius=jnp.asarray([1.0], self.dtype),
            sphere_path_center=center[None, :],
            sphere_path_radius=jnp.asarray([25.0], self.dtype),
            sphere_path_res=jnp.asarray([5500], jnp.int32),
            sphere_has_path=jnp.asarray([True]),
        )

    # ---- obs --------------------------------------------------------------

    @property
    def obs_dim(self) -> int:
        att = 9 if self.params.att_mode == "rotmat" else 4
        return 3 + 3 + att + 3 + 1 + 3  # pos vel att rates thrust rel_target

    def _obs(self, state: AcroState, world: World):
        d = state.drone
        att_flat = (
            d.att.reshape(d.att.shape[:-2] + (9,))
            if self.params.att_mode == "rotmat"
            else d.att
        )
        target = world.sphere_center[..., 0, :]  # chased target (first sphere)
        rel = target - d.pos
        return jnp.concatenate(
            [
                d.pos,
                d.vel,
                att_flat,
                d.rates / self.params.max_rates,
                d.thrust[..., None] / self.params.thrust_curve.max_force,
                rel,
            ],
            axis=-1,
        ).astype(self.dtype)

    # ---- reset ------------------------------------------------------------

    def _sample_drone(self, key) -> DroneState:
        kp, kv, ka = jax.random.split(key, 3)
        pos = jax.random.uniform(
            kp, (3,), self.dtype,
            minval=jnp.asarray(self.pos_low, self.dtype),
            maxval=jnp.asarray(self.pos_high, self.dtype),
        )
        vel = self.vel_scale * jax.random.normal(kv, (3,), self.dtype)
        ypr = jax.random.uniform(
            ka, (3,), self.dtype, minval=-self.ypr_range_deg, maxval=self.ypr_range_deg
        )
        return drone_reset(self.params, pos, vel, ypr)

    def _sample_dr(self, key) -> DomainRand:
        if not self.randomize:
            return DomainRand.nominal((), self.dtype)
        return DomainRand.sample(
            key, (), self.mass_range, self.drag_range, self.thrust_range, self.dtype
        )

    def _sample_wind(self, key) -> jnp.ndarray:
        base = jnp.asarray(self.wind, self.dtype)
        if self.wind_scale <= 0.0:
            return base
        return base + self.wind_scale * jax.random.normal(key, (3,), self.dtype)

    def reset(self, key, world: Optional[World] = None):
        world = self.default_world() if world is None else world
        key, kd, kr, kw = jax.random.split(key, 4)
        drone = self._sample_drone(kd)
        dr = self._sample_dr(kr)
        target = world.sphere_center[..., 0, :]
        dist = jnp.linalg.norm(target - drone.pos, axis=-1)
        state = AcroState(
            drone=drone,
            domain_rand=dr,
            t=jnp.zeros((), jnp.int32),
            prev_dist=dist,
            key=key,
            episode_return=jnp.zeros((), self.dtype),
            wind=self._sample_wind(kw),
        )
        return state, self._obs(state, world)

    # ---- step -------------------------------------------------------------

    def step(self, state: AcroState, action, world: Optional[World] = None,
             wind: Optional[jnp.ndarray] = None):
        """Returns (state, obs, reward, done, info). World is stepped by the
        caller when targets move (see ``rollout`` helpers) or passed static."""
        world = self.default_world() if world is None else world
        drone, imu = drone_step(
            self.params, state.drone, action, world,
            wind=state.wind if wind is None else wind,
            domain_rand=state.domain_rand,
        )
        target = world.sphere_center[..., 0, :]
        dist = jnp.linalg.norm(target - drone.pos, axis=-1)

        crashed = drone.done
        truncated = state.t + 1 >= self.max_episode_steps
        done = crashed | truncated

        progress = state.prev_dist - dist
        rates_pen = jnp.sum((action[..., :3]) ** 2, axis=-1)
        reward = (
            self.w_progress * progress
            + self.w_alive
            - self.w_crash * crashed.astype(self.dtype)
            - self.w_rates * rates_pen
        ).astype(self.dtype)

        ep_ret = state.episode_return + reward
        next_state = state.replace(
            drone=drone, t=state.t + 1, prev_dist=dist, episode_return=ep_ret
        )

        # auto-reset (branch-free)
        key, kd, kr, kw, knext = jax.random.split(state.key, 5)
        drone_r = self._sample_drone(kd)
        dr_r = self._sample_dr(kr)
        dist_r = jnp.linalg.norm(target - drone_r.pos, axis=-1)
        reset_state = AcroState(
            drone=drone_r, domain_rand=dr_r, t=jnp.zeros((), jnp.int32),
            prev_dist=dist_r, key=knext,
            episode_return=jnp.zeros((), self.dtype),
            wind=self._sample_wind(kw),
        )
        live_state = next_state.replace(key=knext)
        next_state = tree_where(done, reset_state, live_state)

        info = {
            "crashed": crashed,
            "truncated": truncated,
            "dist_to_target": dist,
            "episode_return": ep_ret,
            "imu": imu,
            # the PRE-reset successor observation: off-policy learners must
            # bootstrap time-limit truncations from the TRUE next state, not
            # the respawn the auto-reset hands back (rl/sac.py); unused
            # consumers lose it to DCE
            "final_obs": self._obs(live_state, world),
        }
        return next_state, self._obs(next_state, world), reward, done, info


# ---------------------------------------------------------------------------
# Vectorized rollout helpers
# ---------------------------------------------------------------------------


def vector_reset(env: AcroEnv, key, n_envs: int, world: Optional[World] = None):
    keys = jax.random.split(key, n_envs)
    return jax.vmap(lambda k: env.reset(k, world))(keys)


def vector_step(env: AcroEnv, state, actions, world: Optional[World] = None):
    return jax.vmap(lambda s, a: env.step(s, a, world))(state, actions)


def rollout(env: AcroEnv, state, world: World, policy_fn, steps: int,
             move_targets: bool = True):
    """scan a vectorized rollout: policy_fn(obs) -> actions. Targets advance
    once per step (simulator.py:87)."""

    def body(carry, _):
        st, w = carry
        if move_targets:
            w = update_targets(w)
        obs = jax.vmap(lambda s: env._obs(s, w))(st)
        actions = policy_fn(obs)
        st, obs, reward, done, info = jax.vmap(
            lambda s, a: env.step(s, a, w)
        )(st, actions)
        return (st, w), (reward, done)

    (state, world), (rewards, dones) = jax.lax.scan(
        body, (state, world), None, length=steps
    )
    return state, world, rewards, dones
