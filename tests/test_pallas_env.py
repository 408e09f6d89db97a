"""Full-env pallas megaloop parity vs the XLA AcroEnv (interpret mode, CPU).

The kernel's RNG stream differs from the XLA path's threefry keys, so exact
parity is asserted on segments with no reset events; reset behavior is
checked statistically (distribution ranges, zeroed memories, unit quats).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fpyv_tpu.envs.acro import AcroEnv
from fpyv_tpu.ops.pallas_env import (
    env_state_to_matrix,
    matrix_to_env_state,
    pallas_env_rollout,
)
from fpyv_tpu.physics.drone import DroneParams
from fpyv_tpu.physics.world import update_targets


@pytest.fixture(scope="module")
def setup():
    # spawn high with long episodes so no env resets during short segments
    env = AcroEnv(
        params=DroneParams(att_mode="quat"),
        pos_low=(-5.0, -5.0, 30.0),
        pos_high=(5.0, 5.0, 40.0),
        max_episode_steps=10_000,
        dtype=jnp.float32,
    )
    world = env.default_world()
    N = 64
    keys = jax.random.split(jax.random.key(3), N)
    state, obs = jax.vmap(lambda k: env.reset(k, world))(keys)
    # f32 state everywhere (conftest enables x64; reset may produce f64 keys)
    action = jnp.zeros((N, 4), jnp.float32).at[:, 3].set(-0.55)
    return env, world, state, action


def xla_rollout(env, state, world, action, steps):
    def body(carry, _):
        st, w = carry
        w = update_targets(w)
        st, obs, reward, done, _ = jax.vmap(
            lambda s, a: env.step(s, a, w))(st, action)
        return (st, w), (reward, done)

    (st, w), (rewards, dones) = jax.lax.scan(body, (state, world), None,
                                             length=steps)
    return st, w, rewards, dones


class TestEnvMatrixRoundTrip:
    def test_round_trip(self, setup):
        env, world, state, action = setup
        mat = env_state_to_matrix(state)
        back = matrix_to_env_state(mat, state)
        np.testing.assert_allclose(np.asarray(back.drone.pos),
                                   np.asarray(state.drone.pos))
        np.testing.assert_array_equal(np.asarray(back.t), np.asarray(state.t))
        np.testing.assert_allclose(np.asarray(back.prev_dist),
                                   np.asarray(state.prev_dist))


class TestNoResetParity:
    def test_matches_xla_env(self, setup):
        env, world, state, action = setup
        K = 25
        ref_st, ref_w, ref_r, ref_d = xla_rollout(env, state, world, action, K)
        assert not np.asarray(ref_d).any(), "test premise: no resets"

        out_st, out_w, rsum = pallas_env_rollout(
            env, state, action, world, K, seed=0, interpret=True)

        np.testing.assert_allclose(np.asarray(out_st.drone.pos),
                                   np.asarray(ref_st.drone.pos), atol=2e-4)
        np.testing.assert_allclose(np.asarray(out_st.drone.vel),
                                   np.asarray(ref_st.drone.vel), atol=2e-4)
        np.testing.assert_allclose(np.asarray(out_st.drone.att),
                                   np.asarray(ref_st.drone.att), atol=1e-4)
        np.testing.assert_allclose(np.asarray(out_st.prev_dist),
                                   np.asarray(ref_st.prev_dist), atol=2e-4)
        np.testing.assert_array_equal(np.asarray(out_st.t), np.asarray(ref_st.t))
        # reward sum == episode return == scan reward sum
        np.testing.assert_allclose(np.asarray(rsum),
                                   np.asarray(ref_r).sum(axis=0), atol=2e-3)
        np.testing.assert_allclose(np.asarray(out_st.episode_return),
                                   np.asarray(ref_st.episode_return), atol=2e-3)
        # world target advanced identically
        np.testing.assert_array_equal(np.asarray(out_w.sphere_path_count),
                                      np.asarray(ref_w.sphere_path_count))

    def test_moving_target_affects_reward(self, setup):
        """The in-kernel CircularPath must actually move: a static-target run
        diverges from the moving-target run."""
        env, world, state, action = setup
        static_world = world.replace(sphere_has_path=jnp.asarray([False]))
        _, _, r_move = pallas_env_rollout(env, state, action, world, 20,
                                          interpret=True)
        _, _, r_stat = pallas_env_rollout(env, state, action, static_world, 20,
                                          interpret=True)
        assert np.abs(np.asarray(r_move) - np.asarray(r_stat)).max() > 1e-4


class TestAutoReset:
    def test_truncation_resets(self, setup):
        env, world, state, action = setup
        env_short = AcroEnv(
            params=env.params, pos_low=env.pos_low, pos_high=env.pos_high,
            max_episode_steps=10, dtype=jnp.float32,
        )
        K = 15  # every env truncates at t=10, then runs 5 more steps
        out_st, _, _ = pallas_env_rollout(env_short, state, action, world, K,
                                          seed=7, interpret=True)
        t = np.asarray(out_st.t)
        np.testing.assert_array_equal(t, np.full_like(t, 5))
        pos = np.asarray(out_st.drone.pos)
        # 5 post-reset steps of gentle throttle can't leave the spawn box by far
        assert (pos[:, 2] > 20.0).all() and (pos[:, 2] < 45.0).all()
        assert (np.abs(pos[:, :2]) < 12.0).all()
        q = np.asarray(out_st.drone.att)
        np.testing.assert_allclose(np.linalg.norm(q, axis=-1), 1.0, atol=1e-5)
        assert not np.asarray(out_st.drone.done).any()
        np.testing.assert_allclose(np.asarray(out_st.episode_return),
                                   5 * 0.01
                                   + np.asarray(out_st.prev_dist) * 0.0,
                                   atol=5.0)  # loose: progress term varies

    def test_reset_distributions(self, setup):
        """Exactly-at-truncation state samples the reset distributions."""
        env, world, state, action = setup
        env_short = AcroEnv(
            params=env.params, pos_low=env.pos_low, pos_high=env.pos_high,
            vel_scale=1.0, ypr_range_deg=30.0,
            max_episode_steps=8, dtype=jnp.float32,
        )
        out_st, _, _ = pallas_env_rollout(env_short, state, action, world, 8,
                                          seed=11, interpret=True)
        t = np.asarray(out_st.t)
        np.testing.assert_array_equal(t, np.zeros_like(t))
        pos = np.asarray(out_st.drone.pos)
        assert (pos[:, 0] >= -5).all() and (pos[:, 0] <= 5).all()
        assert (pos[:, 2] >= 30).all() and (pos[:, 2] <= 40).all()
        vel = np.asarray(out_st.drone.vel)
        assert np.abs(vel).max() < 6.0  # ~N(0,1), 64x3 samples
        assert np.abs(vel.mean()) < 0.5
        assert 0.5 < vel.std() < 1.6
        rates = np.asarray(out_st.drone.rates)
        np.testing.assert_array_equal(rates, np.zeros_like(rates))
        thrust = np.asarray(out_st.drone.thrust)
        np.testing.assert_array_equal(thrust, np.zeros_like(thrust))

    def test_seed_determinism(self, setup):
        env, world, state, action = setup
        env_short = AcroEnv(params=env.params, pos_low=env.pos_low,
                            pos_high=env.pos_high, max_episode_steps=5,
                            dtype=jnp.float32)
        a = pallas_env_rollout(env_short, state, action, world, 12, seed=3,
                               interpret=True)[0]
        b = pallas_env_rollout(env_short, state, action, world, 12, seed=3,
                               interpret=True)[0]
        c = pallas_env_rollout(env_short, state, action, world, 12, seed=4,
                               interpret=True)[0]
        np.testing.assert_array_equal(np.asarray(a.drone.pos),
                                      np.asarray(b.drone.pos))
        assert np.abs(np.asarray(a.drone.pos)
                      - np.asarray(c.drone.pos)).max() > 1e-3
