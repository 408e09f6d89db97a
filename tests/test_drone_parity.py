"""Golden-trajectory parity: the jax drone step vs the float64 NumPy oracle.

BASELINE.json: "fixed-seed trajectory (position, quaternion attitude, motor
RPM/thrust) matches the CPU reference bitwise-to-tolerance".

Three layers of checking:
- x64 jax vs oracle: near-bitwise (atol 1e-9 over 300 steps)
- f32 jax vs oracle: tolerance drift bound over 300 steps
- quat mode vs rotmat mode: equivalent trajectories
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fpyv_tpu.config import FpyvConfig
from fpyv_tpu.ops import rotations as rot
from fpyv_tpu.physics.drone import DroneParams, DroneState, drone_reset, drone_step
from fpyv_tpu.physics.world import World, empty_world, update_targets
from tools.oracle.sim import (
    OracleCylinder,
    OracleDrone,
    OracleGround,
    OracleTarget,
)


def make_world_pair(seed=0, n_targets=1, n_cyl=2, moving=False):
    """Build matched oracle object list + jax SoA world."""
    rng = np.random.default_rng(seed)
    t_pos = rng.uniform(-3, 3, (n_targets, 3)) + np.array([0, 0, 5.0])
    t_rad = rng.uniform(0.5, 1.5, n_targets)
    c_pos = rng.uniform(-8, 8, (n_cyl, 3)) * np.array([1, 1, 0])
    c_rad = rng.uniform(1, 2.5, n_cyl)
    c_h = rng.uniform(5, 12, n_cyl)
    path = {"radius": 25.0, "resolution": 5500} if moving else None

    oracle_objs = [OracleTarget(t_pos[i], t_rad[i], path=dict(path) if path else None)
                   for i in range(n_targets)]
    oracle_objs += [OracleCylinder(c_pos[i], c_rad[i], c_h[i]) for i in range(n_cyl)]
    oracle_objs += [OracleGround()]

    w = empty_world(n_spheres=n_targets, n_cylinders=n_cyl, ground=True,
                    dtype=jnp.float64)
    w = w.replace(
        sphere_center=jnp.asarray(t_pos),
        sphere_radius=jnp.asarray(t_rad),
        sphere_path_center=jnp.asarray(t_pos),
        sphere_path_radius=jnp.full((n_targets,), 25.0) if moving else jnp.zeros(n_targets),
        sphere_path_res=jnp.full((n_targets,), 5500, jnp.int32),
        sphere_has_path=jnp.full((n_targets,), bool(moving)),
        cyl_center=jnp.asarray(c_pos),
        cyl_radius=jnp.asarray(c_rad),
        cyl_height=jnp.asarray(c_h),
    )
    return oracle_objs, w


def run_oracle(cfg, objs, actions, wind, update_objs=False):
    drone = OracleDrone(cfg)
    drone.reset(cfg.drone.initial_position, cfg.drone.initial_velocity,
                cfg.drone.initial_orientation)
    traj = []
    for a in actions:
        if update_objs:
            for o in objs:
                if isinstance(o, OracleTarget):
                    o.update()
        drone.step(a, wind, objs)
        traj.append((drone.pos.copy(), drone.R.copy(), drone.vel.copy(),
                     drone.prev_thrust, drone.done))
    return traj


def run_jax(params, world, cfg, actions, wind, dtype, update_objs=False):
    state = drone_reset(
        params,
        jnp.asarray(cfg.drone.initial_position, dtype),
        jnp.asarray(cfg.drone.initial_velocity, dtype),
        jnp.asarray(cfg.drone.initial_orientation, dtype),
    )
    wind_j = jnp.asarray(wind, dtype)

    def body(carry, action):
        st, w = carry
        if update_objs:
            w = update_targets(w)
        st, _ = drone_step(params, st, action, w, wind_j)
        return (st, w), (st.pos, st.att, st.vel, st.thrust, st.done)

    world = jax.tree.map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x, world
    )
    (_, _), ys = jax.lax.scan(body, (state, world), jnp.asarray(actions, dtype))
    return jax.tree.map(np.asarray, ys)


@pytest.fixture(scope="module")
def cfg():
    return FpyvConfig()


@pytest.fixture(scope="module")
def actions():
    rng = np.random.default_rng(42)
    T = 300
    a = rng.uniform(-1, 1, (T, 4)) * np.array([0.3, 0.3, 0.2, 1.0])
    a[:, 3] = rng.uniform(-0.6, 0.3, T)  # throttle band that keeps it airborne-ish
    return a


class TestX64Parity:
    def test_free_flight_trajectory(self, cfg, actions):
        objs, world = make_world_pair(n_targets=1, n_cyl=2)
        wind = np.array([0.5, -0.3, 0.1])
        ref = run_oracle(cfg, objs, actions, wind)
        params = DroneParams.from_config(cfg)
        pos, att, vel, thrust, done = run_jax(params, world, cfg, actions, wind,
                                              jnp.float64)
        for t in [0, 1, 10, 100, 299]:
            np.testing.assert_allclose(pos[t], ref[t][0], atol=1e-9,
                                       err_msg=f"pos step {t}")
            np.testing.assert_allclose(att[t], ref[t][1], atol=1e-9,
                                       err_msg=f"R step {t}")
            np.testing.assert_allclose(vel[t], ref[t][2], atol=1e-9)
            np.testing.assert_allclose(thrust[t], ref[t][3], atol=1e-9)
        # done flags must match step-for-step
        np.testing.assert_array_equal(done, [r[4] for r in ref])

    def test_moving_target_and_collisions(self, cfg, actions):
        """Parity holds up to and including the first crash step. Beyond a
        crash the reference's collision early-return (components.py:207-210)
        skips later objects' forces while we always sum — the post-crash
        trajectory is unobservable (env auto-resets), so comparison stops."""
        objs, world = make_world_pair(seed=3, n_targets=2, n_cyl=3, moving=True)
        wind = np.zeros(3)
        ref = run_oracle(cfg, objs, actions, wind, update_objs=True)
        params = DroneParams.from_config(cfg)
        pos, att, vel, thrust, done = run_jax(params, world, cfg, actions, wind,
                                              jnp.float64, update_objs=True)
        ref_done = np.array([r[4] for r in ref])
        first_crash = int(np.argmax(ref_done)) if ref_done.any() else len(ref) - 1
        assert bool(done[first_crash]) == bool(ref_done[first_crash])
        np.testing.assert_array_equal(done[: first_crash + 1],
                                      ref_done[: first_crash + 1])
        for t in range(first_crash + 1):
            np.testing.assert_allclose(pos[t], ref[t][0], atol=1e-8,
                                       err_msg=f"pos step {t}")
            np.testing.assert_allclose(att[t], ref[t][1], atol=1e-8)

    def test_moving_target_no_crash_long_parity(self, cfg, actions):
        """Moving targets far from the flight path: full 300-step parity with
        CircularPath motion exercised and no crash."""
        objs, world = make_world_pair(seed=12, n_targets=2, n_cyl=0, moving=True)
        # push targets far below/away so the path circle never intersects flight
        for o in objs:
            if isinstance(o, OracleTarget):
                o.path_center = o.path_center + np.array([0.0, 0.0, 200.0])
                o.position = o.position + np.array([0.0, 0.0, 200.0])
        world = world.replace(
            sphere_center=world.sphere_center + jnp.asarray([0.0, 0.0, 200.0]),
            sphere_path_center=world.sphere_path_center + jnp.asarray([0.0, 0.0, 200.0]),
        )
        wind = np.array([0.2, 0.1, 0.0])
        ref = run_oracle(cfg, objs, actions, wind, update_objs=True)
        params = DroneParams.from_config(cfg)
        pos, att, vel, thrust, done = run_jax(params, world, cfg, actions, wind,
                                              jnp.float64, update_objs=True)
        ref_done = np.array([r[4] for r in ref])
        np.testing.assert_array_equal(done, ref_done)
        stop = int(np.argmax(ref_done)) if ref_done.any() else len(ref) - 1
        np.testing.assert_allclose(pos[stop], ref[stop][0], atol=1e-8)
        np.testing.assert_allclose(att[stop], ref[stop][1], atol=1e-8)

    def test_ground_contact_spring(self, cfg):
        """Start low over the ground: exercise the spring contact force path."""
        cfg_low = FpyvConfig.from_dict({
            "drone": {"initial_position": [0, 0, 0.15],
                      "initial_velocity": [0, 0, 0],
                      "initial_orientation": [0, 0, 0]}})
        objs = [OracleGround()]
        world = empty_world(ground=True, dtype=jnp.float64)
        T = 40
        acts = np.zeros((T, 4))
        acts[:, 3] = -0.5  # low throttle: sag onto the spring
        ref = run_oracle(cfg_low, objs, acts, np.zeros(3))
        params = DroneParams.from_config(cfg_low)
        pos, att, vel, thrust, done = run_jax(params, world, cfg_low, acts,
                                              np.zeros(3), jnp.float64)
        np.testing.assert_allclose(pos[-1], ref[-1][0], atol=1e-9)
        np.testing.assert_array_equal(done, [r[4] for r in ref])
        # the spring must actually have fired (drone started inside contact range)
        assert np.any(np.abs(vel[:, 2]) > 0)


class TestF32Parity:
    def test_f32_drift_bounded(self, cfg, actions):
        objs, world = make_world_pair(n_targets=1, n_cyl=2)
        wind = np.array([0.5, -0.3, 0.1])
        ref = run_oracle(cfg, objs, actions, wind)
        params = DroneParams.from_config(cfg)
        pos, att, *_ = run_jax(params, world, cfg, actions, wind, jnp.float32)
        # tolerance drift after 300 chaotic steps in f32
        assert np.max(np.abs(pos[50] - ref[50][0])) < 1e-3
        assert np.max(np.abs(att[50] - ref[50][1])) < 1e-3


class TestQuatMode:
    def test_quat_matches_rotmat_trajectory(self, cfg, actions):
        objs, world = make_world_pair(n_targets=1, n_cyl=2)
        wind = np.array([0.5, -0.3, 0.1])
        p_rot = DroneParams.from_config(cfg, att_mode="rotmat")
        p_quat = DroneParams.from_config(cfg, att_mode="quat")
        pos_r, att_r, *_ = run_jax(p_rot, world, cfg, actions, wind, jnp.float64)
        pos_q, att_q, *_ = run_jax(p_quat, world, cfg, actions, wind, jnp.float64)
        np.testing.assert_allclose(pos_q[-1], pos_r[-1], atol=1e-8)
        R_from_q = np.asarray(rot.quat_to_rotmat(jnp.asarray(att_q[-1])))
        np.testing.assert_allclose(R_from_q, att_r[-1], atol=1e-8)


class TestBatching:
    def test_batched_step_matches_loop(self, cfg):
        """The batch-agnostic step over N drones == N single-drone steps."""
        params = DroneParams.from_config(cfg)
        _, world = make_world_pair(n_targets=1, n_cyl=2)
        rng = np.random.default_rng(7)
        N, T = 8, 50
        pos0 = jnp.asarray(rng.uniform(-2, 2, (N, 3)) + np.array([0, 0, 10.0]))
        vel0 = jnp.asarray(rng.uniform(-1, 1, (N, 3)))
        ypr0 = jnp.asarray(rng.uniform(-30, 30, (N, 3)))
        acts = jnp.asarray(rng.uniform(-0.4, 0.4, (T, N, 4)))

        state = drone_reset(params, pos0, vel0, ypr0)

        def body(st, a):
            st, _ = drone_step(params, st, a, world)
            return st, st.pos

        _, pos_batched = jax.lax.scan(body, state, acts)

        for i in range(N):
            st_i = drone_reset(params, pos0[i], vel0[i], ypr0[i])

            def body_i(st, a):
                st, _ = drone_step(params, st, a, world)
                return st, st.pos

            _, pos_i = jax.lax.scan(body_i, st_i, acts[:, i])
            np.testing.assert_allclose(np.asarray(pos_batched[:, i]),
                                       np.asarray(pos_i), atol=1e-12)


def test_thrust_curve_matches_oracle(cfg):
    params = DroneParams.from_config(cfg)
    drone = OracleDrone(cfg)
    x = np.linspace(-1, 1, 41)
    np.testing.assert_allclose(
        np.asarray(params.thrust_curve.throttle_to_thrust(jnp.asarray(x))),
        drone.throttle2thrust(x), rtol=1e-12)
    f = np.linspace(1.0, 80.0, 41)
    np.testing.assert_allclose(
        np.asarray(params.thrust_curve.thrust_to_throttle(jnp.asarray(f))),
        drone.thrust2throttle(f), rtol=1e-10, atol=1e-12)
    assert params.thrust_curve.min_force == pytest.approx(drone.min_force)
    assert params.thrust_curve.max_force == pytest.approx(drone.max_force)
    assert params.thrust_curve.min_force > 0


class TestActionDomainClipping:
    """RL policies emit unbounded Gaussian actions; the reference's inputs
    are calibrated sticks confined to [-1, 1] (get_sticks.py:254-265).
    The thrust cubic must see the stick domain — unclipped, it explodes on
    out-of-range throttle and the physics NaNs (measured divergence of the
    vision racer at ~70M env-steps, round 3)."""

    def _step(self, throttle, pallas=False):
        params = DroneParams(att_mode="quat")
        world = empty_world(n_spheres=0, ground=True)
        n = 8  # pallas path wants sublane multiples
        state = drone_reset(params,
                            jnp.broadcast_to(
                                jnp.asarray([0.0, 0.0, 10.0], jnp.float32),
                                (n, 3)),
                            jnp.zeros((n, 3), jnp.float32),
                            jnp.zeros((n, 3), jnp.float32))
        a = jnp.broadcast_to(
            jnp.asarray([0.2, -0.1, 0.05, throttle], jnp.float32), (n, 4))
        if pallas:
            from fpyv_tpu.ops.pallas_step import pallas_drone_step

            return pallas_drone_step(params, state, a, world, interpret=True)
        return drone_step(params, state, a, world)[0]

    def test_xla_step_clips_throttle(self):
        hi = self._step(1e4)
        one = self._step(1.0)
        np.testing.assert_allclose(np.asarray(hi.thrust),
                                   np.asarray(one.thrust))
        assert np.isfinite(np.asarray(hi.vel)).all()

    def test_pallas_step_clips_throttle(self):
        hi = self._step(1e4, pallas=True)
        one = self._step(1.0, pallas=True)
        np.testing.assert_allclose(np.asarray(hi.thrust),
                                   np.asarray(one.thrust))

    def test_log_std_is_bounded(self):
        """The Gaussian heads clamp log_std at use (entropy farming cannot
        push sigma past exp(log_std_max))."""
        from fpyv_tpu.models.policy import ActorCritic, PixelActorCritic

        net = ActorCritic(action_dim=4, hidden=(8,))
        obs = jnp.zeros((1, 6), jnp.float32)
        params = net.init(jax.random.key(0), obs)
        params = jax.tree.map(
            lambda x: jnp.full_like(x, 50.0) if x.shape == (4,) else x,
            params)
        _, log_std, _ = net.apply(params, obs)
        assert float(jnp.max(log_std)) <= net.log_std_max + 1e-6

        pnet = PixelActorCritic(action_dim=4, torso="patch", patch=8,
                                embed=8, hidden=(8,), compute_dtype=None)
        px = jnp.zeros((1, 8, 16), jnp.float32)
        pr = jnp.zeros((1, 5), jnp.float32)
        pparams = pnet.init(jax.random.key(1), px, pr)
        pparams = jax.tree.map(
            lambda x: jnp.full_like(x, 50.0) if x.shape == (4,) else x,
            pparams)
        _, plog_std, _ = pnet.apply(pparams, px, pr)
        assert float(jnp.max(plog_std)) <= pnet.log_std_max + 1e-6
