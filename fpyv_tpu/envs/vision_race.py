"""Vision gate racing: single-drone race through the gate track on PIXELS.

BASELINE config #4 names "camera-projection pixel observations (gate/track
markers) for vision-based RL" — this env is that clause literally: the
observation is the FPV depth view of the GATE TRACK (gate frames + ground
through the analytic raycast, the same geometry as the reference's
render_depth_image of the world, /root/reference/src/core/simulator.py:122
with the track in the object list, :85), and the task is the race
(sequential gate passing, fpyv_tpu.envs.multi_race's rules with one agent).

Gate visibility at training resolution is why ``frame_width`` is a real
parameter (VERDICT r2 #8): at 96x72 with a 120 deg fov, a 5 m gate's
default 0.08 m band subtends well under a pixel from across the 12 m
track — this env defaults to a 0.35 m band (~1-2 px) so the markers
actually land on the sensor.

Obs dict mirrors VisionAcroEnv: {pixels, rates, accel_z, thrust} plus a
``gate_onehot`` block (which gate is next — the racing analog of the
reference pilot knowing which target it chases; the pixels alone are
ambiguous on a rotationally symmetric track).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Union

import jax
import jax.numpy as jnp
from flax import struct

from fpyv_tpu.envs.multi_race import MultiRaceEnv, MultiRaceState
from fpyv_tpu.physics.drone import DroneParams, _att_to_rotmat
from fpyv_tpu.physics.world import World
from fpyv_tpu.vision.camera import CameraRig, camera_pose
from fpyv_tpu.vision.raycast import render_depth_raycast


def default_race_rig() -> CameraRig:
    return CameraRig(pitch_deg=35.0, rel_position=(0.1, 0.0, 0.0),
                     fov_deg=120.0, resolution=(96, 72))


@struct.dataclass
class VisionRaceState:
    """Race state + the frame-stack history (``frame_stack > 1`` only).

    ``frames`` holds the K-1 PREVIOUS depth frames per agent (newest last);
    the observation stacks them under the frame just rendered, giving the
    policy ego-motion cues one frame cannot carry (VERDICT r3 #3: the
    pixels-only racer needs temporal memory on a rotationally symmetric
    track). With frame_stack == 1 the env keeps the bare MultiRaceState —
    single-frame checkpoints and callers are untouched."""

    race: MultiRaceState
    frames: jnp.ndarray  # (n_races, A, K-1, H, W)


@dataclass(frozen=True)
class VisionRaceEnv:
    """Single-agent MultiRaceEnv whose observation is the rendered track."""

    race: MultiRaceEnv = field(default_factory=lambda: MultiRaceEnv(
        n_agents=1, max_episode_steps=2000))
    rig: CameraRig = field(default_factory=default_race_rig)
    max_depth: float = 40.0  # the far gates must stay above level 0
    frame_width: float = 0.35
    pixel_dtype: str = "u8"
    # With False the gate_onehot obs block is zeroed — the policy must
    # race from the PIXELS + IMU alone (same obs pytree/net shapes, so
    # the ablation is a data change, not an architecture change).
    gate_onehot: bool = True
    # Multi-agent (race.n_agents > 1): every agent renders its OWN FPV view
    # and the OTHER drones appear in it as spheres of this radius — the
    # sphere centers are per-step traced data (opponent positions), so
    # visible opponents cost no extra machinery beyond the sphere raycast.
    opponent_radius: float = 0.3
    # Ablation switch (VERDICT r3 #6): False removes the opponents from the
    # rendered frame (the track still shows) — does SEEING the others change
    # behavior, or only colliding with them?
    show_opponents: bool = True
    # Temporal memory: stack the last K depth frames as the pixel obs
    # (newest last). 1 = single frame (original shapes/state).
    frame_stack: int = 1

    @property
    def params(self) -> DroneParams:
        return self.race.params

    @property
    def n_gates(self) -> int:
        return self.race.n_gates

    def default_world(self) -> World:
        return self.race.default_world()

    # -- observation ---------------------------------------------------------

    def _obs(self, state: MultiRaceState, world: World):
        """Per-AGENT obs dict; every leaf keeps the (..., A, ...) axes."""
        import numpy as np

        A = self.race.n_agents
        pos = state.drones.pos  # (..., A, 3)
        att = state.drones.att
        R = _att_to_rotmat(self.params, att)  # (..., A, 3, 3)
        cam_pos, cam_R = camera_pose(self.rig, pos, R)
        rworld = world
        include = ("gates", "ground")
        # live sphere bank for the frame: opponents at their traced
        # positions and/or the track's moving obstacles at episode time t
        # (both ride the existing sphere raycast; per-agent axes kept)
        sph_c, sph_r = [], []
        if A > 1 and self.show_opponents:
            # opponents as spheres (static gather drops self, like
            # multi_race._obs's others block)
            idx = np.asarray(
                [[j for j in range(A) if j != i] for i in range(A)], np.int32)
            others = pos[..., idx, :]  # (..., A, A-1, 3)
            sph_c.append(others)
            sph_r.append(jnp.full(others.shape[:-1], self.opponent_radius,
                                  jnp.float32))
        if self.race.n_obstacles:
            obs_c = jax.vmap(lambda t: self.race._obstacles_at(world, t))(
                state.t)  # (R, S, 3)
            obs_c = jnp.broadcast_to(obs_c[..., None, :, :],
                                     obs_c.shape[:-2] + (A,)
                                     + obs_c.shape[-2:])
            sph_c.append(obs_c)
            sph_r.append(jnp.broadcast_to(
                world.sphere_radius.astype(jnp.float32),
                obs_c.shape[:-1]))
        if sph_c:
            centers = jnp.concatenate(sph_c, axis=-2)
            rworld = world.replace(
                sphere_center=centers,
                sphere_radius=jnp.concatenate(sph_r, axis=-1),
                sphere_active=jnp.ones(centers.shape[:-1], bool),
            )
            include = ("spheres", "gates", "ground")
        img = render_depth_raycast(
            self.rig, cam_pos, cam_R, rworld, max_depth=self.max_depth,
            include=include, frame_width=self.frame_width)
        if self.pixel_dtype == "u8":
            pixels = img  # already uint8 levels
        else:
            pixels = img.astype(jnp.float32) / 255.0
        onehot = jax.nn.one_hot(state.next_gate, self.n_gates,
                                dtype=jnp.float32)  # (..., A, G)
        if not self.gate_onehot:
            onehot = jnp.zeros_like(onehot)
        return {
            "pixels": pixels,
            "rates": state.drones.rates / self.params.max_rates,
            "accel_z": state.drones.accel[..., 2:3] / 30.0,
            "thrust": state.drones.thrust[..., None]
            / self.params.thrust_curve.max_force,
            "gate_onehot": onehot,
        }

    # -- batched API (the trainer entry points). The learner sees a FLAT
    # (n_races * A) agent batch (shared policy, like
    # multi_race.make_shared_policy_env_step); A == 1 reduces to the
    # original single-agent shapes.

    def _flat(self, obs):
        return jax.tree.map(
            lambda x: x.reshape((-1,) + x.shape[2:]), obs)

    def _stack(self, obs, frames):
        """obs['pixels'] (R, A, H, W) + history (R, A, K-1, H, W) ->
        stacked pixels (R, A, K, H, W) and the shifted history."""
        cur = obs["pixels"][..., None, :, :]
        stacked = jnp.concatenate([frames, cur], axis=-3)
        return dict(obs, pixels=stacked), stacked[..., 1:, :, :]

    def reset_batched(self, keys, world: World):
        state, _ = jax.vmap(lambda k: self.race.reset(k, world))(keys)
        obs = self._obs(state, world)
        if self.frame_stack > 1:
            # history = K-1 copies of the first frame (standard stack init)
            frames = jnp.repeat(obs["pixels"][..., None, :, :],
                                self.frame_stack - 1, axis=-3)
            obs, frames = self._stack(obs, frames)
            return (VisionRaceState(race=state, frames=frames),
                    self._flat(obs))
        return state, self._flat(obs)

    def step_batched(self, state: Union[MultiRaceState, "VisionRaceState"],
                     action, world: World):
        """action (n_races * A, 4) flat over agents."""
        A = self.race.n_agents
        stacked = isinstance(state, VisionRaceState)
        race_state = state.race if stacked else state
        st, _, reward, done, info = jax.vmap(
            lambda s, a: self.race.step(s, a, world))(
                race_state, action.reshape(-1, A, action.shape[-1]))
        obs = self._obs(st, world)
        if stacked:
            # whole-race resets flush the history to the respawn frame —
            # stale pre-reset frames must not leak across episodes
            cur = obs["pixels"][..., None, :, :]
            fresh = jnp.repeat(cur, self.frame_stack - 1, axis=-3)
            frames = jnp.where(done[:, None, None, None, None],
                               fresh, state.frames)
            obs, frames = self._stack(obs, frames)
            st = VisionRaceState(race=st, frames=frames)
        obs = self._flat(obs)
        # per-agent termination: own crash OR the whole-race reset
        # (bootstrapping across the respawn would corrupt GAE)
        info = dict(info,
                    gates_passed=info["gates_passed"].reshape(-1),
                    crashed=(info["crashed"] | done[:, None]).reshape(-1))
        return st, obs, reward.reshape(-1), done, info
