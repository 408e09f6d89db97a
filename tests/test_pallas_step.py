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
