"""Multi-agent drone race env: A drones per world racing a gate track.

BASELINE config #5: "multi-agent race env (ma_com scale-up) sharded across
>=2 hosts feeding PPO learner". The reference's only multi-agent artifact is
the toy 2-agent gridworld (tests/ma_com_simple_env.py, ported in
fpyv_tpu.envs.gridworld); this env is its scale-up onto the full drone
physics: A agents share one gate track (fpyv_tpu.world.generators
generate_track layout), race through gates in order, and see each other.

Gate-passing rule: an agent passes its next gate when the signed distance to
the gate plane (normal = R[:,0], components.py:811-822) crosses from
negative to positive between consecutive steps while the crossing point is
within the gate's half-size laterally. Rewards: gate bonus + progress toward
the next gate + alive bonus - crash penalty - proximity penalty between
agents (inter-agent contact = crash for both, the vectorized analog of
motor-point collisions between airframes).

Per-env state batches over A agents; the whole env vmaps over thousands of
race instances and shards over the mesh env axis like any other env.
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
    DroneParams,
    DroneState,
    drone_reset,
    drone_step,
)
from fpyv_tpu.physics.world import World, empty_world


@struct.dataclass
class MultiRaceState:
    drones: DroneState  # fields have leading dim (..., A)
    next_gate: jnp.ndarray  # (..., A) int32
    prev_gate_dist: jnp.ndarray  # (..., A) signed plane distance to next gate
    prev_center_dist: jnp.ndarray  # (..., A) distance to next gate CENTER
    gates_passed: jnp.ndarray  # (..., A) int32 total
    prev_rank: jnp.ndarray  # (..., A) int32 race position (0 = leader)
    t: jnp.ndarray  # (...,) int32
    key: jnp.ndarray
    episode_return: jnp.ndarray  # (..., A)


@dataclass(frozen=True)
class MultiRaceEnv:
    params: DroneParams = field(default_factory=lambda: DroneParams(att_mode="quat"))
    n_agents: int = 4
    n_gates: int = 6
    track_radius: float = 12.0
    gate_size: float = 5.0
    gate_height: float = 3.0
    spawn_radius: float = 2.0
    spawn_height: float = 3.0
    agent_collision_radius: float = 0.35  # ~2 arm radii
    max_episode_steps: int = 2000
    # Moving obstacles (ROADMAP r3 #4's remaining depth): n_obstacles
    # spheres ORBIT the gate circle on the reference's CircularPath
    # (components.py:743-751 machinery), sweeping through the racing line.
    # Their position is a pure function of episode time (state.t), so no
    # world state rides the carry and resets rewind them with the episode;
    # phases spread evenly so the track is never obstacle-free.
    n_obstacles: int = 0
    obstacle_radius: float = 0.8
    obstacle_period: int = 600  # steps per revolution (10 s at 60 fps)
    # reward weights
    w_gate: float = 10.0
    w_progress: float = 1.0
    w_alive: float = 0.005
    w_crash: float = 10.0
    # opponent-conditioned reward (VERDICT r3 #6): per step each agent earns
    # w_overtake * (positions gained) — signed, so the term is zero-sum
    # across the race (pure competition shaping; gate passage remains the
    # only renewable absolute reward source). 0 disables.
    w_overtake: float = 0.0
    # Ablation switch: False zeroes the others-relpos obs block (shapes
    # unchanged, like vision_race.gate_onehot) — measures whether the
    # policy reads its opponents at all.
    others_in_obs: bool = True
    # Per-episode random assignment of agents to spawn-ring slots
    # (VERDICT r4 #4): with fixed slots, 4-agent self-play locks into
    # spawn roles — agent index i always starts at ring angle 2*pi*i/A, so
    # the shared policy learns slot-conditioned behaviors (measured r4:
    # per-agent gates [16.4, 3.5, 53.8, 19.4] after 4500 iters). Permuting
    # the slot assignment every episode decouples identity from position;
    # roles can no longer attach to spawn slots during training. Off by
    # default (exact round-4 reset semantics; eval keeps fixed slots so
    # the per-agent table measures slot robustness, not averaging).
    permute_spawns: bool = False
    dtype: type = jnp.float32

    # ---- track ------------------------------------------------------------

    def default_world(self) -> World:
        """A clean circular track (no generator quirks: gates actually on the
        circle at gate_size size — the raceable layout)."""
        import numpy as np

        theta = np.linspace(0, 2 * np.pi, self.n_gates + 1)[:-1]
        pos = np.stack(
            [np.cos(theta) * self.track_radius,
             np.sin(theta) * self.track_radius,
             np.full_like(theta, self.gate_height)], axis=-1)
        rots = np.stack([
            np.array([[np.cos(t + np.pi / 2), -np.sin(t + np.pi / 2), 0],
                      [np.sin(t + np.pi / 2), np.cos(t + np.pi / 2), 0],
                      [0, 0, 1.0]]) for t in theta], axis=0)
        w = empty_world(n_spheres=self.n_obstacles, n_cylinders=0,
                        n_gates=self.n_gates, ground=True, dtype=self.dtype)
        w = w.replace(
            gate_pos=jnp.asarray(pos, self.dtype),
            gate_rotmat=jnp.asarray(rots, self.dtype),
            gate_size=jnp.full((self.n_gates,), self.gate_size, self.dtype),
        )
        if self.n_obstacles:
            S = self.n_obstacles
            center = jnp.asarray([0.0, 0.0, self.gate_height], self.dtype)
            # phase-spread initial counts around the revolution
            phases = (np.arange(S) * self.obstacle_period) // max(S, 1)
            w = w.replace(
                sphere_radius=jnp.full((S,), self.obstacle_radius,
                                       self.dtype),
                sphere_active=jnp.ones((S,), bool),
                sphere_path_center=jnp.broadcast_to(center, (S, 3)),
                sphere_path_radius=jnp.full((S,), self.track_radius,
                                            self.dtype),
                sphere_path_res=jnp.full((S,), self.obstacle_period,
                                         jnp.int32),
                sphere_path_count=jnp.asarray(phases, jnp.int32),
                sphere_has_path=jnp.ones((S,), bool),
            )
            w = w.replace(sphere_center=self._obstacles_at(
                w, jnp.zeros((), jnp.int32)))
        return w

    def _obstacles_at(self, world: World, t) -> jnp.ndarray:
        """Obstacle centers at episode step ``t`` (pure CircularPath
        arithmetic — position(count0 + t), physics/world.update_targets)."""
        res = jnp.maximum(world.sphere_path_res, 1)
        cnt = world.sphere_path_count + t
        theta = (2.0 * jnp.pi) * (
            jnp.mod(cnt, res).astype(self.dtype)
            / res.astype(self.dtype))
        offset = jnp.stack(
            [jnp.cos(theta) * world.sphere_path_radius,
             jnp.sin(theta) * world.sphere_path_radius,
             jnp.zeros_like(theta)], axis=-1)
        return jnp.where(world.sphere_has_path[..., None],
                         world.sphere_path_center + offset,
                         world.sphere_center)

    def _world_at(self, world: World, t) -> World:
        """The world as agents experience it at step ``t`` of the episode
        (moving obstacles advanced; everything else static)."""
        if not self.n_obstacles:
            return world
        return world.replace(sphere_center=self._obstacles_at(world, t))

    # ---- helpers ----------------------------------------------------------

    def _gate_info(self, world: World, next_gate, pos):
        """(signed plane distance, lateral offset, vector to gate center)."""
        gp = world.gate_pos[next_gate]  # (..., A, 3)
        gR = world.gate_rotmat[next_gate]  # (..., A, 3, 3)
        rel = pos - gp
        normal = gR[..., :, 0]
        plane_d = jnp.sum(rel * normal, axis=-1)
        lateral = jnp.linalg.norm(
            rel - plane_d[..., None] * normal, axis=-1)
        return plane_d, lateral, gp - pos

    def _rank(self, gates_passed, center_dist):
        """Race position per agent, 0 = leader: ordered by gates passed,
        ties broken by distance to the next gate center (the same bounded
        progress measure the reward shaping uses)."""
        score = gates_passed.astype(self.dtype) * 1e3 - center_dist
        return jnp.sum(
            score[..., None] < score[..., None, :], axis=-1).astype(jnp.int32)

    def _obs(self, state: MultiRaceState, world: World):
        d = state.drones
        att_flat = d.att  # quat (A, 4) (or rotmat flattened below)
        if self.params.att_mode == "rotmat":
            att_flat = d.att.reshape(d.att.shape[:-2] + (9,))
        plane_d, lateral, to_gate = self._gate_info(world, state.next_gate, d.pos)
        # relative positions of the other agents: (A, A, 3) -> drop self via a
        # static gather (boolean masks don't survive vmap tracing)
        import numpy as np

        rel_all = d.pos[..., None, :, :] - d.pos[..., :, None, :]
        A = self.n_agents
        # int dtype explicit: the A == 1 single-agent case (the vision race
        # env) produces an EMPTY index list, which numpy defaults to float64
        idx = np.asarray(
            [[j for j in range(A) if j != i] for i in range(A)], np.int32)
        others = rel_all[..., np.arange(A)[:, None], idx, :].reshape(
            rel_all.shape[:-3] + (A, (A - 1) * 3))
        if not self.others_in_obs:
            others = jnp.zeros_like(others)
        return jnp.concatenate(
            [
                d.pos, d.vel, att_flat,
                d.rates / self.params.max_rates,
                d.thrust[..., None] / self.params.thrust_curve.max_force,
                to_gate,
                plane_d[..., None],
                lateral[..., None],
                others,
            ],
            axis=-1,
        ).astype(self.dtype)

    @property
    def obs_dim(self) -> int:
        att = 4 if self.params.att_mode == "quat" else 9
        return 3 + 3 + att + 3 + 1 + 3 + 1 + 1 + (self.n_agents - 1) * 3

    # ---- reset ------------------------------------------------------------

    def _sample_drones(self, key) -> DroneState:
        A = self.n_agents
        kp, ka = jax.random.split(key)
        angles = jnp.arange(A, dtype=self.dtype) / A * 2 * jnp.pi
        # spawn ring fully BEHIND gate 0's plane (normal +y at y=0): every
        # agent starts with plane_d < 0 so its first crossing counts
        base = jnp.stack(
            [self.track_radius + jnp.cos(angles) * self.spawn_radius,
             -3.0 - self.spawn_radius + jnp.sin(angles) * self.spawn_radius,
             jnp.full((A,), self.spawn_height, self.dtype)], axis=-1)
        if self.permute_spawns:
            base = base[jax.random.permutation(ka, A)]
        jitter = 0.3 * jax.random.normal(kp, (A, 3), self.dtype)
        ypr = jnp.zeros((A, 3), self.dtype).at[:, 2].set(90.0)  # face +y
        return drone_reset(self.params, base + jitter,
                           jnp.zeros((A, 3), self.dtype), ypr)

    def reset(self, key, world: Optional[World] = None):
        world = self.default_world() if world is None else world
        key, kd = jax.random.split(key)
        drones = self._sample_drones(kd)
        next_gate = jnp.zeros((self.n_agents,), jnp.int32)
        plane_d, _, to_gate = self._gate_info(world, next_gate, drones.pos)
        gates0 = jnp.zeros((self.n_agents,), jnp.int32)
        center_d0 = jnp.linalg.norm(to_gate, axis=-1)
        state = MultiRaceState(
            drones=drones, next_gate=next_gate, prev_gate_dist=plane_d,
            prev_center_dist=center_d0,
            gates_passed=gates0,
            prev_rank=self._rank(gates0, center_d0),
            t=jnp.zeros((), jnp.int32), key=key,
            episode_return=jnp.zeros((self.n_agents,), self.dtype),
        )
        return state, self._obs(state, world)

    # ---- step -------------------------------------------------------------

    def step(self, state: MultiRaceState, actions,
             world: Optional[World] = None, wind=None):
        """actions: (..., A, 4). Returns (state, obs, reward (..., A),
        done (...,) env-level, info)."""
        world = self.default_world() if world is None else world
        # obstacles advance with episode time BEFORE the physics step
        # (the reference's target.update() -> drone.step() order,
        # simulator.py:87/110); collisions see the moved spheres
        drones, _ = drone_step(self.params, state.drones, actions,
                               self._world_at(world, state.t + 1),
                               wind=wind)

        # inter-agent contact = crash for both (pairwise centers)
        A = self.n_agents
        diff = drones.pos[..., None, :, :] - drones.pos[..., :, None, :]
        pair_d = jnp.linalg.norm(diff + jnp.eye(A)[..., None] * 1e3, axis=-1)
        contact = jnp.any(pair_d < self.agent_collision_radius, axis=-1)
        crashed = drones.done | contact
        # penalize only the crash TRANSITION: done is sticky until the env
        # resets, and a per-step penalty stream would swamp the advantages
        newly_crashed = crashed & ~state.drones.done
        drones = drones.replace(done=crashed)

        # gate passing
        plane_d, lateral, to_gate = self._gate_info(
            world, state.next_gate, drones.pos)
        passed = (
            (state.prev_gate_dist < 0) & (plane_d >= 0)
            & (lateral < world.gate_size[state.next_gate] / 2.0)
            & ~crashed
        )
        next_gate = jnp.where(
            passed, (state.next_gate + 1) % self.n_gates, state.next_gate)
        gates_passed = state.gates_passed + passed.astype(jnp.int32)
        # recompute distances for the (possibly new) gate
        plane_d_new, _, to_gate_new = self._gate_info(world, next_gate, drones.pos)
        center_d_new = jnp.linalg.norm(to_gate_new, axis=-1)

        # progress = decrease in distance to the next gate CENTER. Bounded
        # by the leg length (unlike signed plane distance, which a policy
        # can farm forever by crossing the plane OUTSIDE the gate and
        # flying away — observed: reward 0.004 -> 0.71/step while
        # gates_passed fell; this shaping makes gate passage the only
        # renewable reward source).
        center_d = jnp.linalg.norm(to_gate, axis=-1)
        progress = jnp.where(
            passed, 0.0, state.prev_center_dist - center_d)
        # race position change: overtakes earn, being overtaken costs
        # (zero-sum across agents; w_overtake = 0 disables)
        rank = self._rank(gates_passed, center_d_new)
        positions_gained = (state.prev_rank - rank).astype(self.dtype)
        reward = (
            self.w_gate * passed.astype(self.dtype)
            + self.w_progress * progress.astype(self.dtype)
            + self.w_alive * (~crashed).astype(self.dtype)
            - self.w_crash * newly_crashed.astype(self.dtype)
            + self.w_overtake * positions_gained
        )

        t = state.t + 1
        env_done = jnp.all(crashed, axis=-1) | (t >= self.max_episode_steps)
        ep_ret = state.episode_return + reward

        next_state = MultiRaceState(
            drones=drones, next_gate=next_gate, prev_gate_dist=plane_d_new,
            prev_center_dist=center_d_new,
            gates_passed=gates_passed, prev_rank=rank, t=t, key=state.key,
            episode_return=ep_ret,
        )

        # env-level auto-reset
        key, kr = jax.random.split(state.key)
        reset_state, _ = self.reset(kr, world)
        next_state = next_state.replace(key=key)
        next_state = tree_where(env_done, reset_state, next_state)

        info = {
            "gates_passed": gates_passed,
            "crashed": crashed,
            # inter-agent contact TRANSITIONS (collision events) and
            # positions gained this step — the per-agent eval counters the
            # multi-agent table reports (apps/play.py)
            "contact": contact & ~state.drones.done,
            "overtakes": jnp.maximum(
                state.prev_rank - rank, 0).astype(jnp.int32),
            "episode_return": ep_ret,
        }
        return next_state, self._obs(next_state, world), reward, env_done, info


def make_shared_policy_env_step(env: MultiRaceEnv, world: Optional[World] = None,
                                n_envs: int = 64):
    """Adapter feeding the race env to a single shared-policy learner.

    BASELINE config #5: the multi-agent race env "feeding PPO learner". All
    agents share one policy: the learner sees a flat (n_envs * n_agents)
    batch; env-level done broadcasts to every agent of that env (the race
    resets as a whole). Returns (env_step, reset_fn) matching
    fpyv_tpu.rl.ppo's env_step contract.
    """
    world = env.default_world() if world is None else world
    A = env.n_agents

    def reset_fn(key):
        keys = jax.random.split(key, n_envs)
        state, obs = jax.vmap(lambda k: env.reset(k, world))(keys)
        return state, obs.reshape(n_envs * A, -1)

    def env_step(env_state, action, key):
        # shape-agnostic over the race count: under a sharded mesh each
        # device runs this on its LOCAL slice of the race bank (the flat
        # agent batch is race-major, so contiguous env-axis shards stay
        # aligned with whole races)
        actions = action.reshape(-1, A, action.shape[-1])
        st, obs, reward, done, info = jax.vmap(
            lambda s, a: env.step(s, a, world))(env_state, actions)
        # termination per agent: its own crash (absorbing state — value
        # bootstraps to 0 there) OR the whole-env reset (obs jumps to the
        # respawn; bootstrapping across it would corrupt GAE)
        done_flat = (info["crashed"] | done[:, None]).reshape(-1)
        return (st, obs.reshape(obs.shape[0] * A, -1), reward.reshape(-1),
                done_flat)

    return env_step, reset_fn
