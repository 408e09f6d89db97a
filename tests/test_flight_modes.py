"""ANGLE / HORIZON flight modes: closed-loop behavior through drone_step."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fpyv_tpu.control.flight_modes import (
    FlightModeParams,
    angle_mode_action,
    flight_mode_init,
    horizon_mode_action,
)
from fpyv_tpu.ops import rotations as rot
from fpyv_tpu.physics.drone import DroneParams, drone_reset, drone_step
from fpyv_tpu.physics.world import empty_world


HOVER_THROTTLE = -0.646  # thrust ~= weight for the default F80 curve


@pytest.fixture(scope="module")
def setup():
    params = DroneParams(att_mode="rotmat")
    world = empty_world(ground=True)
    fm = FlightModeParams(max_rates=params.max_rates)
    return params, world, fm


def fly(params, world, fm, mode_fn, sticks, ypr0, steps):
    """Closed loop: mode -> drone physics, N steps. Returns final state."""
    N = sticks.shape[0]
    pos = jnp.tile(jnp.asarray([0.0, 0.0, 30.0], jnp.float32), (N, 1))
    vel = jnp.zeros((N, 3), jnp.float32)
    state = drone_reset(params, pos, vel, jnp.asarray(ypr0, jnp.float32))
    fm_state = flight_mode_init((N,))

    @jax.jit
    def run(state, fm_state):
        def body(carry, _):
            st, fs = carry
            fs, action = mode_fn(fm, fs, st.att, sticks)
            st, _ = drone_step(params, st, action, world)
            return (st, fs), None

        (state, fm_state), _ = jax.lax.scan(
            body, (state, fm_state), None, length=steps)
        return state, fm_state

    return run(state, fm_state)[0]


class TestAngleMode:
    def test_self_levels_from_tilt(self, setup):
        params, world, fm = setup
        sticks = jnp.zeros((4, 4), jnp.float32).at[:, 3].set(HOVER_THROTTLE)
        ypr0 = [[35.0, -20.0, 10.0], [-40.0, 30.0, 0.0],
                [10.0, 44.0, -90.0], [-25.0, -35.0, 170.0]]
        st = fly(params, world, fm, angle_mode_action, sticks, ypr0, 240)
        euler = np.rad2deg(np.asarray(rot.rotmat_to_euler(st.att)))
        assert np.abs(euler[:, 0]).max() < 2.0, euler
        assert np.abs(euler[:, 1]).max() < 2.0, euler
        assert not np.asarray(st.done).any()

    def test_full_stick_holds_max_angle(self, setup):
        params, world, fm = setup
        sticks = jnp.zeros((1, 4), jnp.float32).at[0, 0].set(1.0) \
            .at[0, 3].set(HOVER_THROTTLE)
        st = fly(params, world, fm, angle_mode_action, sticks, [[0.0, 0, 0]], 300)
        euler = np.rad2deg(np.asarray(rot.rotmat_to_euler(st.att)))
        # acro-sign: +stick nets a positive roll angle (see flight_modes.py)
        assert 40.0 < euler[0, 0] < 50.0, euler

    def test_yaw_stick_is_a_rate(self, setup):
        params, world, fm = setup
        sticks = jnp.zeros((1, 4), jnp.float32).at[0, 2].set(0.5) \
            .at[0, 3].set(HOVER_THROTTLE)
        st = fly(params, world, fm, angle_mode_action, sticks, [[0.0, 0, 0]], 60)
        # steady commanded yaw rate = -0.5 * max_yaw_rate (acro sign)
        np.testing.assert_allclose(np.asarray(st.rates)[0, 2],
                                   -0.5 * fm.max_yaw_rate, rtol=0.05)
        euler = np.rad2deg(np.asarray(rot.rotmat_to_euler(st.att)))
        assert abs(euler[0, 2]) > 30.0  # yaw actually moved
        assert abs(euler[0, 0]) < 2 and abs(euler[0, 1]) < 2  # still level


class TestHorizonMode:
    def test_centered_sticks_level(self, setup):
        params, world, fm = setup
        sticks = jnp.zeros((1, 4), jnp.float32).at[0, 3].set(HOVER_THROTTLE)
        st = fly(params, world, fm, horizon_mode_action, sticks,
                 [[30.0, -25.0, 45.0]], 240)
        euler = np.rad2deg(np.asarray(rot.rotmat_to_euler(st.att)))
        assert np.abs(euler[0, :2]).max() < 2.0, euler

    def test_full_stick_matches_acro(self, setup):
        params, world, fm = setup
        sticks = jnp.zeros((1, 4), jnp.float32).at[0, 0].set(1.0) \
            .at[0, 3].set(HOVER_THROTTLE)
        st = fly(params, world, fm, horizon_mode_action, sticks, [[0.0, 0, 0]], 40)
        # at full deflection the blend is pure acro: rates saturate at
        # -max_rates like components.py:185
        np.testing.assert_allclose(np.asarray(st.rates)[0, 0],
                                   -params.max_rates, rtol=1e-3)

    def test_blend_is_continuous(self, setup):
        """Half stick commands rates between pure level and pure acro."""
        params, world, fm = setup
        st_state = flight_mode_init((1,))
        R = rot.euler_to_rotmat(jnp.zeros((1, 3), jnp.float32))
        half = jnp.zeros((1, 4), jnp.float32).at[0, 0].set(0.5)
        _, a_half = horizon_mode_action(fm, st_state, R, half)
        full = jnp.zeros((1, 4), jnp.float32).at[0, 0].set(1.0)
        _, a_full = horizon_mode_action(fm, st_state, R, full)
        assert 0.0 < float(a_half[0, 0]) < float(a_full[0, 0]) == 1.0
