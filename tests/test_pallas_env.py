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


class TestReferenceShapedWorld:
    """The params.yaml-shaped world (targets + cylinders + gate track +
    ground, config/params.yaml:6-35) runs IN-KERNEL: parity vs the XLA env
    until the first reset event."""

    def _setup(self):
        env = AcroEnv(
            params=DroneParams(att_mode="quat"),
            pos_low=(-5.0, -5.0, 30.0),
            pos_high=(5.0, 5.0, 40.0),
            max_episode_steps=10_000,
            dtype=jnp.float32,
        )
        from fpyv_tpu.config import FpyvConfig
        from fpyv_tpu.world.generators import WorldSpec, build_world

        spec = WorldSpec.from_config(FpyvConfig().simulator, seed=2)
        world = build_world(spec, dtype=jnp.float32)
        assert world.num_cylinders >= 1 and world.num_gates >= 1
        N = 64
        keys = jax.random.split(jax.random.key(9), N)
        state, _ = jax.vmap(lambda k: env.reset(k, world))(keys)
        action = jnp.zeros((N, 4), jnp.float32).at[:, 3].set(-0.55)
        return env, world, state, action

    def test_matches_xla_env(self):
        env, world, state, action = self._setup()
        K = 20
        ref_st, ref_w, ref_r, ref_d = xla_rollout(env, state, world, action, K)
        assert not np.asarray(ref_d).any(), "test premise: no resets"
        out_st, out_w, rsum = pallas_env_rollout(
            env, state, action, world, K, seed=0, interpret=True)
        np.testing.assert_allclose(np.asarray(out_st.drone.pos),
                                   np.asarray(ref_st.drone.pos), atol=2e-4)
        np.testing.assert_allclose(np.asarray(out_st.drone.att),
                                   np.asarray(ref_st.drone.att), atol=1e-4)
        np.testing.assert_allclose(np.asarray(rsum),
                                   np.asarray(ref_r).sum(axis=0), atol=2e-3)

    def test_cylinder_crash_parity(self):
        """Drones dropped into the obstacle field: crash flags + auto-reset
        fire identically step-for-step until the first reset."""
        env, world, state, action = self._setup()
        # teleport the bank into a low band crossing the cylinders
        drone = state.drone
        pos = drone.pos.at[:, 2].set(
            jnp.linspace(0.3, 3.0, pos_n := drone.pos.shape[0],
                         dtype=jnp.float32))
        cylx = world.cyl_center[0, 0]
        pos = pos.at[:, 0].set(
            cylx + jnp.linspace(-3, 3, pos_n, dtype=jnp.float32))
        pos = pos.at[:, 1].set(world.cyl_center[0, 1])
        state = state.replace(drone=drone.replace(pos=pos),
                              prev_dist=jnp.linalg.norm(
                                  world.sphere_center[0] - pos, axis=-1))
        ref_st, _, ref_r, ref_d = xla_rollout(env, state, world, action, 1)
        out_st, _, rsum = pallas_env_rollout(env, state, action, world, 1,
                                             interpret=True)
        ref_d = np.asarray(ref_d)[0]
        assert ref_d.any(), "premise: some drones crash into cylinders"
        np.testing.assert_allclose(np.asarray(rsum), np.asarray(ref_r)[0],
                                   atol=2e-3)
        # non-crashed envs advanced identically
        ok = ~ref_d
        np.testing.assert_allclose(np.asarray(out_st.drone.pos)[ok],
                                   np.asarray(ref_st.drone.pos)[ok], atol=2e-4)


class TestDomainRandInKernel:
    def _setup(self, randomize=True):
        env = AcroEnv(
            params=DroneParams(att_mode="quat"),
            pos_low=(-5.0, -5.0, 30.0),
            pos_high=(5.0, 5.0, 40.0),
            max_episode_steps=10_000,
            randomize=randomize,
            dtype=jnp.float32,
        )
        world = env.default_world()
        N = 64
        keys = jax.random.split(jax.random.key(5), N)
        state, _ = jax.vmap(lambda k: env.reset(k, world))(keys)
        action = jnp.zeros((N, 4), jnp.float32).at[:, 3].set(-0.55)
        return env, world, state, action

    def test_initial_dr_parity_no_reset(self):
        """With the SAME initial DomainRand (sampled by the XLA reset), the
        kernel's randomized physics matches the XLA env until a reset."""
        env, world, state, action = self._setup()
        # sanity: the reset sampled non-nominal scales
        ms = np.asarray(state.domain_rand.mass_scale)
        assert ms.std() > 0.02
        K = 20
        ref_st, _, ref_r, ref_d = xla_rollout(env, state, world, action, K)
        assert not np.asarray(ref_d).any()
        out_st, _, rsum = pallas_env_rollout(env, state, action, world, K,
                                             interpret=True)
        np.testing.assert_allclose(np.asarray(out_st.drone.pos),
                                   np.asarray(ref_st.drone.pos), atol=3e-4)
        np.testing.assert_allclose(np.asarray(rsum),
                                   np.asarray(ref_r).sum(axis=0), atol=2e-3)
        # DR rows round-trip unchanged (no reset happened)
        np.testing.assert_allclose(np.asarray(out_st.domain_rand.mass_scale),
                                   ms, atol=1e-6)

    def test_dr_resampled_on_reset(self):
        env, world, state, action = self._setup()
        env_short = AcroEnv(
            params=env.params, pos_low=env.pos_low, pos_high=env.pos_high,
            max_episode_steps=6, randomize=True, dtype=jnp.float32,
        )
        ms0 = np.asarray(state.domain_rand.mass_scale)
        out_st, _, _ = pallas_env_rollout(env_short, state, action, world, 10,
                                          seed=13, interpret=True)
        ms = np.asarray(out_st.domain_rand.mass_scale)
        ds = np.asarray(out_st.domain_rand.drag_scale)
        ts = np.asarray(out_st.domain_rand.thrust_scale)
        # resampled: inside the configured ranges, different from initial,
        # and non-degenerate across envs
        assert (ms >= 0.8).all() and (ms <= 1.2).all()
        assert (ds >= 0.7).all() and (ds <= 1.3).all()
        assert (ts >= 0.85).all() and (ts <= 1.15).all()
        assert np.abs(ms - ms0).max() > 1e-3
        assert ms.std() > 0.02

    def test_nominal_env_keeps_ones(self):
        env, world, state, action = self._setup(randomize=False)
        env_short = AcroEnv(
            params=env.params, pos_low=env.pos_low, pos_high=env.pos_high,
            max_episode_steps=6, randomize=False, dtype=jnp.float32,
        )
        out_st, _, _ = pallas_env_rollout(env_short, state, action, world, 10,
                                          interpret=True)
        np.testing.assert_array_equal(
            np.asarray(out_st.domain_rand.mass_scale),
            np.ones_like(np.asarray(out_st.domain_rand.mass_scale)))
