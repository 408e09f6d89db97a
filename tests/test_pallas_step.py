"""Pallas megastep parity vs the XLA drone_step (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fpyv_tpu.ops.pallas_step import (
    matrix_to_state,
    pallas_drone_step,
    pallas_rollout,
    state_to_matrix,
)
from fpyv_tpu.physics.drone import DroneParams, drone_reset, drone_step
from fpyv_tpu.physics.world import empty_world


@pytest.fixture(scope="module")
def setup():
    params = DroneParams(att_mode="quat")
    world = empty_world(n_spheres=2, ground=True)
    world = world.replace(
        sphere_center=jnp.asarray([[3.0, 0.0, 5.0], [-4.0, 2.0, 8.0]],
                                  jnp.float32),
        sphere_radius=jnp.asarray([1.0, 1.5], jnp.float32),
    )
    rng = np.random.default_rng(0)
    N = 128
    pos = jnp.asarray(rng.uniform(-3, 3, (N, 3)) + np.array([0, 0, 8.0]),
                      jnp.float32)
    vel = jnp.asarray(rng.uniform(-2, 2, (N, 3)), jnp.float32)
    ypr = jnp.asarray(rng.uniform(-40, 40, (N, 3)), jnp.float32)
    state = drone_reset(params, pos, vel, ypr)
    actions = jnp.asarray(rng.uniform(-0.5, 0.5, (N, 4)), jnp.float32)
    return params, world, state, actions


class TestMatrixRoundTrip:
    def test_state_matrix(self, setup):
        params, world, state, actions = setup
        mat = state_to_matrix(state)
        back = matrix_to_state(mat, state)
        np.testing.assert_allclose(np.asarray(back.pos), np.asarray(state.pos))
        np.testing.assert_allclose(np.asarray(back.att), np.asarray(state.att))
        np.testing.assert_array_equal(np.asarray(back.done),
                                      np.asarray(state.done))


class TestSingleStepParity:
    def test_matches_drone_step(self, setup):
        params, world, state, actions = setup
        ref, _ = drone_step(params, state, actions, world)
        out = pallas_drone_step(params, state, actions, world, interpret=True)
        np.testing.assert_allclose(np.asarray(out.pos), np.asarray(ref.pos),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.vel), np.asarray(ref.vel),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.att), np.asarray(ref.att),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(out.rates), np.asarray(ref.rates),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(out.thrust),
                                   np.asarray(ref.thrust), atol=1e-4)
        np.testing.assert_array_equal(np.asarray(out.done), np.asarray(ref.done))

    def test_collision_case(self, setup):
        """Drones spawned low must pick up ground contact + crash flags."""
        params, world, state, actions = setup
        low = state.replace(pos=state.pos.at[:, 2].set(0.08))
        ref, _ = drone_step(params, low, actions, world)
        out = pallas_drone_step(params, low, actions, world, interpret=True)
        np.testing.assert_allclose(np.asarray(out.vel), np.asarray(ref.vel),
                                   atol=1e-4)
        np.testing.assert_array_equal(np.asarray(out.done), np.asarray(ref.done))
        assert np.asarray(ref.done).any()


class TestRolloutParity:
    def test_multi_step(self, setup):
        params, world, state, actions = setup
        action = jnp.zeros_like(actions).at[:, 3].set(-0.6)
        K = 20

        def body(st, _):
            st, _o = drone_step(params, st, action, world)
            return st, None

        ref, _ = jax.lax.scan(body, state, None, length=K)
        out = pallas_rollout(params, state, action, world, K, interpret=True)
        np.testing.assert_allclose(np.asarray(out.pos), np.asarray(ref.pos),
                                   atol=2e-4)
        np.testing.assert_allclose(np.asarray(out.att), np.asarray(ref.att),
                                   atol=1e-4)


class TestCylinderParity:
    """Cylinder collisions in-kernel vs the XLA path (both reference quirks:
    sqrt distance outside the band, relative-z band for the normal)."""

    def _world(self):
        w = empty_world(n_spheres=1, n_cylinders=3, ground=True)
        return w.replace(
            sphere_center=jnp.asarray([[30.0, 0.0, 5.0]], jnp.float32),
            cyl_center=jnp.asarray(
                [[0.0, 0.0, 0.0], [2.0, 1.0, 0.0], [-2.5, -1.0, 3.0]],
                jnp.float32),
            cyl_radius=jnp.asarray([1.0, 0.8, 1.5], jnp.float32),
            cyl_height=jnp.asarray([10.0, 6.0, 2.0], jnp.float32),
            cyl_active=jnp.asarray([True, True, True]),
        )

    def test_free_flight_and_contact(self):
        params = DroneParams(att_mode="quat")
        world = self._world()
        rng = np.random.default_rng(5)
        N = 256
        # spawn a band of drones crossing the cylinder shells: many in
        # contact, some crashed, some free
        pos = jnp.asarray(np.stack([
            rng.uniform(-4, 4, N), rng.uniform(-3, 3, N),
            rng.uniform(0.5, 8.0, N)], -1), jnp.float32)
        vel = jnp.asarray(rng.uniform(-2, 2, (N, 3)), jnp.float32)
        ypr = jnp.asarray(rng.uniform(-30, 30, (N, 3)), jnp.float32)
        state = drone_reset(params, pos, vel, ypr)
        actions = jnp.asarray(rng.uniform(-0.4, 0.4, (N, 4)), jnp.float32)

        ref, _ = drone_step(params, state, actions, world)
        out = pallas_drone_step(params, state, actions, world, interpret=True)
        np.testing.assert_allclose(np.asarray(out.pos), np.asarray(ref.pos),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.vel), np.asarray(ref.vel),
                                   atol=2e-4)
        np.testing.assert_allclose(np.asarray(out.att), np.asarray(ref.att),
                                   atol=1e-6)
        np.testing.assert_array_equal(np.asarray(out.done),
                                      np.asarray(ref.done))
        # premise: the band actually exercises contact + crash + free
        assert np.asarray(ref.done).any()
        assert not np.asarray(ref.done).all()

    def test_multi_step_trajectory(self):
        """Free flight AMONG cylinders over K steps (contact parity is the
        exact single-step test above — spring bounces are stiff, so a 1-step
        shift in a contact event amplifies exponentially and multi-step
        trajectory comparison through bounces is meaningless in f32)."""
        params = DroneParams(att_mode="quat")
        world = self._world()
        rng = np.random.default_rng(7)
        N = 64
        # ring of drones clear of the cylinder shells, high enough not to
        # reach the ground within K steps
        theta = rng.uniform(0, 2 * np.pi, N)
        radius = rng.uniform(5.0, 8.0, N)
        pos = jnp.asarray(np.stack([
            radius * np.cos(theta), radius * np.sin(theta),
            rng.uniform(15.0, 20.0, N)], -1), jnp.float32)
        state = drone_reset(params, pos,
                            jnp.asarray(rng.uniform(-1, 1, (N, 3)), jnp.float32),
                            jnp.zeros((N, 3), jnp.float32))
        actions = jnp.asarray(rng.uniform(-0.3, 0.3, (N, 4)), jnp.float32)

        K = 40

        @jax.jit
        def roll(st):
            def body(st, _):
                st, _ = drone_step(params, st, actions, world)
                return st, None

            return jax.lax.scan(body, st, None, length=K)[0]

        ref = roll(state)
        out = pallas_rollout(params, state, actions, world, K, interpret=True)
        assert not np.asarray(ref.done).any()
        np.testing.assert_allclose(np.asarray(out.pos), np.asarray(ref.pos),
                                   atol=5e-4)
        np.testing.assert_array_equal(np.asarray(out.done),
                                      np.asarray(ref.done))


class TestDomainRandAndWindMath:
    """_step_math's optional dr/wind rows vs drone_step's DomainRand/wind —
    the same math the env kernel runs (dr is threaded there)."""

    def test_dr_and_wind_parity(self):
        from fpyv_tpu.ops.pallas_step import SUBLANES, _pack, _step_math
        from fpyv_tpu.ops.pallas_step import cylinder_matrix, _world_matrix
        from fpyv_tpu.physics.drone import DomainRand

        params = DroneParams(att_mode="quat")
        world = empty_world(n_spheres=1, n_cylinders=1, ground=True)
        world = world.replace(
            sphere_center=jnp.asarray([[3.0, 0.0, 5.0]], jnp.float32),
            cyl_center=jnp.asarray([[1.0, 1.0, 0.0]], jnp.float32),
            cyl_radius=jnp.asarray([1.0], jnp.float32),
            cyl_height=jnp.asarray([8.0], jnp.float32),
            cyl_active=jnp.asarray([True]),
        )
        rng = np.random.default_rng(11)
        N = 128
        pos = jnp.asarray(rng.uniform(-3, 3, (N, 3)) + np.array([0, 0, 6.0]),
                          jnp.float32)
        vel = jnp.asarray(rng.uniform(-3, 3, (N, 3)), jnp.float32)
        state = drone_reset(params, pos, vel,
                            jnp.asarray(rng.uniform(-30, 30, (N, 3)), jnp.float32))
        actions = jnp.asarray(rng.uniform(-0.5, 0.5, (N, 4)), jnp.float32)
        dr = DomainRand(
            mass_scale=jnp.asarray(rng.uniform(0.8, 1.2, N), jnp.float32),
            drag_scale=jnp.asarray(rng.uniform(0.7, 1.3, N), jnp.float32),
            thrust_scale=jnp.asarray(rng.uniform(0.85, 1.15, N), jnp.float32),
        )
        wind = jnp.asarray(rng.uniform(-3, 3, (N, 3)), jnp.float32)

        ref, _ = drone_step(params, state, actions, world, wind=wind,
                            domain_rand=dr)

        from fpyv_tpu.ops.pallas_step import matrix_to_state, state_to_matrix

        sphere_mat, _ = _world_matrix(world)
        out_mat = _step_math(
            params, sphere_mat[0:3], sphere_mat[3], sphere_mat[4],
            state_to_matrix(state),
            jnp.concatenate([_pack(actions[:, i]) for i in range(4)], axis=0),
            cyl=cylinder_matrix(world),
            dr=(_pack(dr.mass_scale), _pack(dr.drag_scale),
                _pack(dr.thrust_scale)),
            wind=(_pack(wind[:, 0]), _pack(wind[:, 1]), _pack(wind[:, 2])),
        )
        out = matrix_to_state(out_mat, state)
        np.testing.assert_allclose(np.asarray(out.pos), np.asarray(ref.pos),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.vel), np.asarray(ref.vel),
                                   atol=2e-4)
        np.testing.assert_allclose(np.asarray(out.thrust),
                                   np.asarray(ref.thrust), atol=1e-4)
        np.testing.assert_array_equal(np.asarray(out.done),
                                      np.asarray(ref.done))
