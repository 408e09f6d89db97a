"""Wrapper tests: obs normalization, frame stacking, action shaping, eval."""

import numpy as np
import jax
import jax.numpy as jnp

from fpyv_tpu.envs.wrappers import (
    evaluate_policy,
    frame_stack_init,
    frame_stack_push,
    frame_stack_reset_where,
    obs_norm_apply,
    obs_norm_init,
    obs_norm_update,
    scale_action,
    squash_action,
)


class TestObsNorm:
    def test_converges_to_batch_statistics(self):
        rng = np.random.default_rng(0)
        data = rng.normal(3.0, 2.0, (100, 64, 5))
        st = obs_norm_init(5, jnp.float64)
        for batch in data:
            st = obs_norm_update(st, jnp.asarray(batch))
        np.testing.assert_allclose(np.asarray(st.mean),
                                   data.reshape(-1, 5).mean(0), atol=0.01)
        np.testing.assert_allclose(np.sqrt(np.asarray(st.var)),
                                   data.reshape(-1, 5).std(0), atol=0.01)
        normed = obs_norm_apply(st, jnp.asarray(data[-1]))
        assert abs(float(jnp.mean(normed))) < 0.2

    def test_clip(self):
        st = obs_norm_init(2, jnp.float64)
        out = obs_norm_apply(st, jnp.asarray([[1e6, -1e6]]), clip=10.0)
        assert np.abs(np.asarray(out)).max() <= 10.0


class TestFrameStack:
    def test_push_and_reset(self):
        f0 = jnp.zeros((4, 8, 8))
        st = frame_stack_init(f0, k=3)
        assert st.frames.shape == (4, 3, 8, 8)
        f1 = jnp.ones((4, 8, 8))
        st = frame_stack_push(st, f1)
        assert float(st.frames[0, -1, 0, 0]) == 1.0
        assert float(st.frames[0, 0, 0, 0]) == 0.0
        done = jnp.asarray([True, False, False, False])
        f2 = 2.0 * jnp.ones((4, 8, 8))
        st = frame_stack_reset_where(st, done, f2)
        assert float(st.frames[0, 0, 0, 0]) == 2.0  # refilled
        assert float(st.frames[1, 0, 0, 0]) == 0.0  # untouched


class TestActionShaping:
    def test_squash_and_scale(self):
        a = jnp.asarray([-3.0, 0.0, 3.0])
        s = squash_action(a)
        assert np.abs(np.asarray(s)).max() <= 1.0
        out = scale_action(jnp.asarray([-1.0, 0.0, 1.0]), 0.0, 10.0)
        np.testing.assert_allclose(np.asarray(out), [0.0, 5.0, 10.0])


class TestEvaluate:
    def test_eval_rollout_stats(self):
        from fpyv_tpu.envs.acro import AcroEnv

        env = AcroEnv()
        world = env.default_world()

        def policy(obs):
            return jnp.zeros(obs.shape[:-1] + (4,)).at[..., 3].set(-0.6)

        stats = evaluate_policy(env, world, policy, jax.random.key(0),
                                n_envs=16, n_steps=50)
        assert np.isfinite(float(stats["mean_step_reward"]))
        assert float(stats["crash_rate_per_step"]) >= 0.0


class TestDebugGuards:
    def test_finite_mask_flags_poisoned_envs(self):
        from fpyv_tpu.utils.debug import finite_mask

        tree = {"a": jnp.ones((4, 3)), "b": jnp.zeros((4,)),
                "i": jnp.arange(4)}
        tree["a"] = tree["a"].at[2, 1].set(jnp.nan)
        tree["b"] = tree["b"].at[3].set(jnp.inf)
        mask = np.asarray(finite_mask(tree))
        np.testing.assert_array_equal(mask, [True, True, False, False])

    def test_finite_mask_under_jit(self):
        from fpyv_tpu.utils.debug import finite_mask

        f = jax.jit(lambda t: finite_mask(t))
        out = f({"x": jnp.ones((8, 2))})
        assert np.asarray(out).all()

    def test_assert_finite_names_leaves(self):
        import pytest as _pytest
        from fpyv_tpu.utils.debug import assert_finite

        assert_finite({"ok": jnp.ones(3)})
        with _pytest.raises(FloatingPointError, match="bad"):
            assert_finite({"bad": jnp.asarray([1.0, jnp.nan])}, name="state")
