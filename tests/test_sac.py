"""SAC learner tests: replay buffer mechanics + learning on the reach task."""

import numpy as np
import jax
import jax.numpy as jnp

from fpyv_tpu.models.policy import SquashedGaussianActor, TwinQNetwork
from fpyv_tpu.rl.replay import replay_add_batch, replay_init, replay_sample
from fpyv_tpu.rl.sac import SacConfig, make_sac


class TestReplay:
    def test_ring_semantics(self):
        buf = replay_init(8, 2, 1)
        for i in range(3):
            obs = jnp.full((4, 2), float(i))
            buf = replay_add_batch(buf, obs, jnp.zeros((4, 1)),
                                   jnp.zeros(4), obs, jnp.zeros(4))
        assert int(buf.size) == 8  # capacity reached
        assert int(buf.ptr) == 4  # wrapped
        # newest batch (i=2) overwrote slots 0..3
        np.testing.assert_allclose(np.asarray(buf.obs[0]), [2.0, 2.0])
        np.testing.assert_allclose(np.asarray(buf.obs[4]), [1.0, 1.0])

    def test_sample_within_valid(self):
        buf = replay_init(100, 2, 1)
        obs = jnp.arange(10.0).reshape(5, 2)
        buf = replay_add_batch(buf, obs, jnp.zeros((5, 1)), jnp.ones(5),
                               obs, jnp.zeros(5))
        o, a, r, no, d = replay_sample(buf, jax.random.key(0), 64)
        assert o.shape == (64, 2)
        np.testing.assert_allclose(np.asarray(r), 1.0)  # only valid entries


class TestSacLearns:
    def test_reach_task(self):
        """Same stable task as the PPO sanity check: echo the observation."""
        N, obs_dim, act_dim = 64, 3, 3
        actor = SquashedGaussianActor(action_dim=act_dim, hidden=(64, 64))
        critic = TwinQNetwork(hidden=(64, 64))
        config = SacConfig(num_envs=N, buffer_capacity=20_000, batch_size=128,
                           updates_per_step=1)

        def env_step(env_state, action, key):
            target = env_state
            reward = -jnp.sum((action - target) ** 2, axis=-1)
            new_target = jax.random.uniform(key, target.shape, target.dtype,
                                            minval=-0.5, maxval=0.5)
            return new_target, new_target, reward, jnp.ones(N)

        obs0 = jax.random.uniform(jax.random.key(0), (N, obs_dim),
                                  minval=-0.5, maxval=0.5)
        a_params = actor.init(jax.random.key(1), obs0[:1])
        c_params = critic.init(jax.random.key(2), obs0[:1],
                               jnp.zeros((1, act_dim)))
        init, train_step = make_sac(actor.apply, critic.apply, env_step,
                                    config, obs_dim, act_dim)
        state = init(a_params, c_params, obs0, obs0, jax.random.key(3))

        warmup = jax.jit(lambda s: train_step(s, random_actions=True))
        learn = jax.jit(lambda s: train_step(s, random_actions=False))

        for _ in range(20):
            state, m = warmup(state)
        rewards = []
        for _ in range(250):
            state, m = learn(state)
            rewards.append(float(np.asarray(m["mean_reward"])))
        early = np.mean(rewards[:25])
        late = np.mean(rewards[-25:])
        assert late > early + 0.05, (early, late)
        assert np.isfinite(float(np.asarray(m["alpha"])))
