"""Policy-in-kernel vision rollout (ops/pallas_policy): interpret-mode
parity vs the XLA vision env + policy, and the PPO integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fpyv_tpu.envs.acro import AcroEnv
from fpyv_tpu.envs.vision_acro import VisionAcroEnv
from fpyv_tpu.models.policy import PixelActorCritic
from fpyv_tpu.ops.pallas_policy import (
    acro_state_to_cols,
    build_policy_weights,
    cols_to_acro_state,
    make_kernel_vision_ppo_parts,
    pallas_policy_vision_rollout,
    prepatch_pixels,
)
from fpyv_tpu.physics.drone import DroneParams
from fpyv_tpu.vision.camera import CameraRig

RIG = CameraRig(pitch_deg=35.0, rel_position=(0.1, 0.0, 0.0),
                fov_deg=120.0, resolution=(32, 24))  # HW=768, NP=12
N = 16


def _setup(n_cylinders=2, seed=0, patch_pool=1):
    env = AcroEnv(params=DroneParams(att_mode="quat"))
    venv = VisionAcroEnv(acro=env, rig=RIG, renderer="raycast",
                         target_only=False, pixel_dtype="u8")
    worlds, bank = venv.make_randomized_worlds(jax.random.key(seed), N,
                                               n_cylinders=n_cylinders)
    keys = jax.random.split(jax.random.key(seed + 1), N)
    state, obs = venv.reset_batched(keys, worlds, bank)
    net = PixelActorCritic(action_dim=4, torso="patch", prepatched=True,
                           compute_dtype=None, patch_pool=patch_pool)
    px0 = prepatch_pixels(obs["pixels"][:1]).reshape(1, -1, 64)
    pr0 = jnp.concatenate([obs["rates"][:1], obs["accel_z"][:1],
                           obs["thrust"][:1]], axis=-1)
    params = net.init(jax.random.key(seed + 2), px0, pr0)
    return env, venv, worlds, bank, state, obs, net, params


class TestPrepatch:
    def test_prepatched_net_matches_standard(self):
        """Same params: standard (H, W) pixels through the patch torso ==
        prepatched patch-major pixels through prepatched=True."""
        env, venv, worlds, bank, state, obs, net, params = _setup()
        std_net = PixelActorCritic(action_dim=4, torso="patch",
                                   compute_dtype=None)
        pr = jnp.concatenate([obs["rates"], obs["accel_z"], obs["thrust"]],
                             axis=-1)
        m1, ls1, v1 = std_net.apply(params, obs["pixels"], pr)
        px = prepatch_pixels(obs["pixels"]).reshape(N, -1, 64)
        m2, ls2, v2 = net.apply(params, px, pr)
        np.testing.assert_allclose(np.asarray(m1), np.asarray(m2),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                                   atol=1e-6)


class TestPatchPool:
    def test_pooled_net_matches_prepatched(self):
        """patch_pool: the standard (H, W) path and the prepatched
        patch-major path produce identical outputs with shared params."""
        env, venv, worlds, bank, state, obs, net, params = _setup(
            patch_pool=4)
        std_net = PixelActorCritic(action_dim=4, torso="patch",
                                   compute_dtype=None, patch_pool=4)
        pr = jnp.concatenate([obs["rates"], obs["accel_z"], obs["thrust"]],
                             axis=-1)
        m1, _, v1 = std_net.apply(params, obs["pixels"], pr)
        px = prepatch_pixels(obs["pixels"]).reshape(N, -1, 64)
        m2, _, v2 = net.apply(params, px, pr)
        np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), atol=1e-6)
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-6)
        # the fc contraction really shrinks pool-fold (+ proprio rows)
        p = params["params"]
        assert p["fc0"]["kernel"].shape[0] == (12 // 4) * 128 + 5

    def test_pool_must_divide_patches(self):
        net = PixelActorCritic(action_dim=4, torso="patch", patch_pool=5,
                               compute_dtype=None)
        with pytest.raises(ValueError):
            net.init(jax.random.key(0), jnp.zeros((1, 24, 32)),
                     jnp.zeros((1, 5)))

    def test_kernel_pool_single_step_parity(self):
        """pool=4 in-kernel forward == the XLA pooled net (policy mean and
        value), plus the physics advance stays env-parity."""
        env, venv, worlds, bank, state, obs, net, params = _setup(
            patch_pool=4)
        w = build_policy_weights(params, n_patches=12, compute_dtype=None,
                                 patch_pool=4)
        w = w._replace(std=jnp.zeros_like(w.std))
        cols = acro_state_to_cols(state)
        frames, extra, aux, cols_out = pallas_policy_vision_rollout(
            env, RIG, cols, worlds, w, 1, 7, venv.max_depth,
            frame_width=venv.frame_width, e_blk=8, compute_dtype=None,
            patch_pool=4, interpret=True)
        pr = jnp.concatenate([obs["rates"], obs["accel_z"], obs["thrust"]],
                             axis=-1)
        px = prepatch_pixels(obs["pixels"]).reshape(N, -1, 64)
        mean, _, value = net.apply(params, px, pr)
        np.testing.assert_allclose(np.asarray(aux[0, :, :4]),
                                   np.asarray(mean), atol=5e-5)
        np.testing.assert_allclose(np.asarray(aux[0, :, 6]),
                                   np.asarray(value), atol=5e-5)
        a = aux[0, :, :4]
        st2, _, r2, d2, info2 = jax.vmap(
            lambda s, ac, wd: env.step(s, ac, wd))(state, a, worlds)
        np.testing.assert_allclose(np.asarray(aux[0, :, 4]),
                                   np.asarray(r2), atol=1e-5)

    def test_kernel_pool_ppo_iteration(self):
        from fpyv_tpu.rl.ppo import PpoConfig, make_ppo

        env, venv, worlds, bank, state, obs, net, params = _setup(
            patch_pool=4)
        apply_fn, make_rollout_fn, obs_from_cols = \
            make_kernel_vision_ppo_parts(venv, worlds, net, N, e_blk=8,
                                         interpret=True)
        config = PpoConfig(num_envs=N, num_steps=4, update_epochs=1,
                           num_minibatches=2, adam_mu_dtype="bf16")
        init, iteration = make_ppo(
            apply_fn, None, config,
            rollout_fn=make_rollout_fn(4, compute_dtype=None))
        cols = acro_state_to_cols(state)
        st = init(params, cols, obs_from_cols(cols), jax.random.key(0))
        st2, info = iteration(st)
        assert np.isfinite(float(np.asarray(info["loss"])))


class TestKernelRollout:
    def _weights(self, params, deterministic=True):
        w = build_policy_weights(params, n_patches=12, compute_dtype=None)
        if deterministic:
            w = w._replace(std=jnp.zeros_like(w.std))
        return w

    def test_single_step_parity(self):
        """T=1: the kernel's frame == the XLA obs exactly; its action ==
        the XLA policy mean; the state advance == AcroEnv physics fed the
        kernel's own action."""
        env, venv, worlds, bank, state, obs, net, params = _setup()
        cols = acro_state_to_cols(state)
        frames, extra, aux, cols_out = pallas_policy_vision_rollout(
            env, RIG, cols, worlds, self._weights(params), 1, 7,
            venv.max_depth, frame_width=venv.frame_width, e_blk=8,
            compute_dtype=None, interpret=True)
        # frame parity: integer levels == the uint8 obs, patch-major
        want = prepatch_pixels(obs["pixels"]).astype(np.float32)
        np.testing.assert_array_equal(np.asarray(frames[0], np.float32),
                                      np.asarray(want))
        # proprio parity
        pr = jnp.concatenate([obs["rates"], obs["accel_z"], obs["thrust"]],
                             axis=-1)
        np.testing.assert_allclose(np.asarray(extra[0, :, :5]),
                                   np.asarray(pr), atol=1e-6)
        # action == policy mean (std zeroed)
        px = prepatch_pixels(obs["pixels"]).reshape(N, -1, 64)
        mean, _, _ = net.apply(params, px, pr)
        np.testing.assert_allclose(np.asarray(aux[0, :, :4]),
                                   np.asarray(mean), atol=5e-5)
        # physics parity: XLA env stepped with the KERNEL's action
        a = aux[0, :, :4]
        st2, _, r2, d2, info2 = jax.vmap(
            lambda s, ac, w: env.step(s, ac, w))(state, a, worlds)
        live = ~(info2["crashed"] | info2["truncated"])
        # compare only live envs (reset draws use different RNG streams)
        k_pos = np.asarray(cols_out[:, 0:3])
        x_pos = np.asarray(st2.drone.pos)
        np.testing.assert_allclose(k_pos[np.asarray(live)],
                                   x_pos[np.asarray(live)], atol=1e-5)
        # reward parity (pre-reset, so comparable for every env)
        np.testing.assert_allclose(np.asarray(aux[0, :, 4]),
                                   np.asarray(r2), atol=1e-5)

    def test_rollout_trajectory_parity(self):
        """T=6 deterministic rollout vs an XLA loop running the same
        policy-mean + env step. Small drift tolerated (f32 matmul
        accumulation order differs)."""
        env, venv, worlds, bank, state, obs, net, params = _setup()
        cols = acro_state_to_cols(state)
        frames, extra, aux, cols_out = pallas_policy_vision_rollout(
            env, RIG, cols, worlds, self._weights(params), 6, 7,
            venv.max_depth, frame_width=venv.frame_width, e_blk=8,
            compute_dtype=None, interpret=True)

        def xla_body(carry, _):
            st = carry
            o = venv._obs(st, worlds, bank)
            px = prepatch_pixels(o["pixels"]).reshape(N, -1, 64)
            pr = jnp.concatenate([o["rates"], o["accel_z"], o["thrust"]],
                                 axis=-1)
            mean, _, _ = net.apply(params, px, pr)
            st, o2, r, d, info = jax.vmap(
                lambda s, a, w: env.step(s, a, w))(st, mean, worlds)
            return st, (r, info["crashed"])

        st_end, (rs, crashes) = jax.lax.scan(xla_body, state, None, length=6)
        k_r = np.asarray(aux[..., 4])
        x_r = np.asarray(rs)
        # no reset events -> exact comparability; else compare prefix
        if not np.asarray(crashes).any():
            np.testing.assert_allclose(k_r, x_r, atol=2e-3)
            np.testing.assert_allclose(np.asarray(cols_out[:, 0:3]),
                                       np.asarray(st_end.drone.pos),
                                       atol=2e-3)
        else:  # crash timing must agree
            np.testing.assert_array_equal(
                np.asarray(aux[..., 5] > 0.5), np.asarray(crashes))

    def test_crash_resets_within_bounds(self):
        """Force a crash (spawn at ground level, idle throttle): done fires
        and the respawn obeys AcroEnv._sample_drone's position box."""
        env, venv, worlds, bank, state, obs, net, params = _setup()
        low = state.drone.pos.at[:, 2].set(0.05)
        state = state.replace(
            drone=state.drone.replace(pos=low,
                                      vel=jnp.zeros_like(state.drone.vel)))
        cols = acro_state_to_cols(state)
        w = self._weights(params)
        frames, extra, aux, cols_out = pallas_policy_vision_rollout(
            env, RIG, cols, worlds, w, 8, 3, venv.max_depth,
            frame_width=venv.frame_width, e_blk=8, compute_dtype=None,
            interpret=True)
        crashed = np.asarray(aux[..., 5]) > 0.5
        assert crashed.any(), "no crash from ground-level idle spawn"
        pos = np.asarray(cols_out[:, 0:3])
        lo = np.asarray(env.pos_low) - 1.0
        hi = np.asarray(env.pos_high) + 1.0
        # every env that crashed at some point respawned inside the box
        # (and then integrated at most a few steps)
        ever = crashed.any(axis=0)
        assert (pos[ever] > lo).all() and (pos[ever] < hi).all()

    def test_stochastic_actions_distinct_per_env(self):
        env, venv, worlds, bank, state, obs, net, params = _setup()
        cols = acro_state_to_cols(state)
        w = self._weights(params, deterministic=False)
        _, _, aux, _ = pallas_policy_vision_rollout(
            env, RIG, cols, worlds, w, 2, 11, venv.max_depth,
            frame_width=venv.frame_width, e_blk=8, compute_dtype=None,
            interpret=True)
        a = np.asarray(aux[..., :4])
        # distinct noise across envs and steps
        assert len(np.unique(a.round(6))) > N


class TestPpoIntegration:
    def test_kernel_ppo_iteration_runs_and_ratio_is_one(self):
        from fpyv_tpu.rl.ppo import PpoConfig, make_ppo

        env, venv, worlds, bank, state, obs, net, params = _setup()
        apply_fn, make_rollout_fn, obs_from_cols = \
            make_kernel_vision_ppo_parts(venv, worlds, net, N, e_blk=8,
                                         interpret=True)
        config = PpoConfig(num_envs=N, num_steps=4, update_epochs=1,
                           num_minibatches=2)
        init, iteration = make_ppo(
            apply_fn, None, config,
            rollout_fn=make_rollout_fn(4, compute_dtype=None))
        cols = acro_state_to_cols(state)
        st = init(params, cols, obs_from_cols(cols), jax.random.key(0))
        st2, info = iteration(st)
        assert np.isfinite(float(np.asarray(info["loss"])))
        # epoch-0 exactness: recomputed log_prob == stored -> kl ~ 0 on the
        # FIRST minibatch of the first epoch (before any update)
        assert abs(float(np.asarray(info["approx_kl"]))) < 1.0
        assert st2.env_state.shape == cols.shape


class TestKernelTrainer:
    def test_train_vision_kernel_smoke(self):
        from fpyv_tpu.apps.train import train_vision

        rig = CameraRig(pitch_deg=35.0, rel_position=(0.1, 0.0, 0.0),
                        fov_deg=120.0, resolution=(32, 24))
        res = train_vision(num_envs=16, num_iterations=3, num_steps=4,
                           seed=0, rig=rig, rollout="kernel", scan_chunk=1,
                           num_minibatches=2, update_epochs=1,
                           compute_dtype="f32", print_every=100)
        assert np.isfinite(res.mean_reward_last)

    def test_kernel_rejects_bad_configs(self):
        from fpyv_tpu.apps.train import train_vision

        with pytest.raises(ValueError):
            train_vision(num_envs=8, num_iterations=1, rollout="kernel",
                         torso="conv")
        with pytest.raises(ValueError):
            train_vision(num_envs=8, num_iterations=1, rollout="kernel",
                         curriculum_iters=2)


class TestKernelEmissions:
    def test_kernel_value_logprob_match_recompute(self):
        """The kernel's in-loop value/log_prob emissions agree with the XLA
        recompute of the same weights over the stored obs (f32)."""
        from fpyv_tpu.rl.ppo import gaussian_log_prob

        env, venv, worlds, bank, state, obs, net, params = _setup()
        apply_fn, make_rollout_fn, obs_from_cols = \
            make_kernel_vision_ppo_parts(venv, worlds, net, N, e_blk=8,
                                         interpret=True)
        cols = acro_state_to_cols(state)
        w = build_policy_weights(params, n_patches=12, compute_dtype=None)
        frames, extra, aux, _ = pallas_policy_vision_rollout(
            env, RIG, cols, worlds, w, 3, 5, venv.max_depth,
            frame_width=venv.frame_width, e_blk=8, compute_dtype=None,
            interpret=True)
        obs_flat = {
            "pixels": frames.astype(jnp.uint8).reshape(-1, frames.shape[-1]),
            "proprio": extra[..., :5].reshape(-1, 5)}
        mean, log_std, value = apply_fn(params, obs_flat)
        lp = gaussian_log_prob(mean, log_std, aux[..., :4].reshape(-1, 4))
        np.testing.assert_allclose(np.asarray(aux[..., 6]).reshape(-1),
                                   np.asarray(value), atol=1e-3)
        np.testing.assert_allclose(np.asarray(aux[..., 7]).reshape(-1),
                                   np.asarray(lp), atol=1e-3)
