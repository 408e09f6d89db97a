"""Race policy-in-kernel rollout (ops/pallas_race): interpret-mode parity
vs the XLA vision-race env + policy, frame-stack semantics, and the PPO
integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fpyv_tpu.envs.multi_race import MultiRaceEnv
from fpyv_tpu.envs.vision_race import VisionRaceEnv
from fpyv_tpu.models.policy import PixelActorCritic
from fpyv_tpu.ops.pallas_policy import build_policy_weights, prepatch_pixels
from fpyv_tpu.ops.pallas_race import (
    RROWS,
    make_kernel_race_ppo_parts,
    pallas_race_vision_rollout,
    race_state_to_cols,
)
from fpyv_tpu.vision.camera import CameraRig

RIG = CameraRig(pitch_deg=35.0, rel_position=(0.1, 0.0, 0.0),
                fov_deg=120.0, resolution=(32, 24))  # HW=768, NP=12
N = 16


def _setup(frame_stack=1, gate_onehot=True, n_obstacles=0, patch_pool=1,
           seed=0):
    venv = VisionRaceEnv(
        race=MultiRaceEnv(n_agents=1, gate_size=5.0, max_episode_steps=500,
                          n_obstacles=n_obstacles),
        rig=RIG, gate_onehot=gate_onehot, frame_stack=frame_stack)
    world = venv.default_world()
    keys = jax.random.split(jax.random.key(seed), N)
    state, obs = venv.reset_batched(keys, world)
    net = PixelActorCritic(action_dim=4, torso="patch", prepatched=True,
                           compute_dtype=None, patch_pool=patch_pool)
    G = venv.n_gates
    px0 = obs["pixels"][:1]
    if frame_stack > 1:
        # (1, K, H, W) -> prepatched stacked (1, NP, K*64)
        K = frame_stack
        pp = prepatch_pixels(px0).reshape(1, K, -1, 64)
        px0 = jnp.moveaxis(pp, 1, 2).reshape(1, -1, K * 64)
    else:
        px0 = prepatch_pixels(px0).reshape(1, -1, 64)
    pr0 = jnp.concatenate([obs["rates"][:1], obs["accel_z"][:1],
                           obs["thrust"][:1], obs["gate_onehot"][:1]],
                          axis=-1)
    params = net.init(jax.random.key(seed + 2), px0, pr0)
    return venv, world, state, obs, net, params


def _weights(params, pool=1, deterministic=True):
    w = build_policy_weights(params, n_patches=12, compute_dtype=None,
                             patch_pool=pool)
    if deterministic:
        w = w._replace(std=jnp.zeros_like(w.std))
    return w


def _race_state(venv, state):
    return state.race if hasattr(state, "race") else state


def _carry_from_reset(venv, state, obs):
    """(cols, hist) carry matching the env's reset (fresh stack)."""
    rs = _race_state(venv, state)
    cols = race_state_to_cols(rs)
    K = venv.frame_stack
    if K > 1:
        # reset obs pixels are the first frame repeated K times
        first = obs["pixels"][:, -1]  # (N, H, W) newest
        cur = prepatch_pixels(first).reshape(N, -1, 1, 64)
        hist = jnp.broadcast_to(cur, (N, cur.shape[1], K - 1, 64))
        hist = hist.reshape(N, -1).astype(jnp.bfloat16)
        cols = cols.at[:, 21].set(0.0)
    else:
        hist = jnp.zeros((N, 8), jnp.bfloat16)
    return cols, hist


class TestRaceKernelParity:
    def test_single_step_frame_and_action_parity(self):
        """T=1: the kernel's frame == the env's obs pixels (patch-major),
        the onehot/proprio match, the action == the XLA policy mean, and
        reward/state advance match MultiRaceEnv fed the kernel's action."""
        venv, world, state, obs, net, params = _setup()
        cols, hist = _carry_from_reset(venv, state, obs)
        frames, extra, aux, cols_out = pallas_race_vision_rollout(
            venv, cols, hist, world, _weights(params), 1, 7, e_blk=8,
            compute_dtype=None, interpret=True)
        want = prepatch_pixels(obs["pixels"]).astype(np.float32)
        np.testing.assert_array_equal(np.asarray(frames[0], np.float32),
                                      np.asarray(want))
        pr = jnp.concatenate([obs["rates"], obs["accel_z"], obs["thrust"],
                              obs["gate_onehot"]], axis=-1)
        np.testing.assert_allclose(np.asarray(extra[0, :, :11]),
                                   np.asarray(pr), atol=1e-6)
        px = prepatch_pixels(obs["pixels"]).reshape(N, -1, 64)
        mean, _, value = net.apply(params, px, pr)
        np.testing.assert_allclose(np.asarray(aux[0, :, :4]),
                                   np.asarray(mean), atol=5e-5)
        np.testing.assert_allclose(np.asarray(aux[0, :, 6]),
                                   np.asarray(value), atol=5e-5)
        # env parity with the kernel's own action
        a = aux[0, :, :4]
        st2, _, r2, d2, info2 = jax.vmap(
            lambda s, ac: venv.race.step(s, ac[None], world))(state, a)
        np.testing.assert_allclose(np.asarray(aux[0, :, 4]),
                                   np.asarray(r2[:, 0]), atol=1e-5)
        live = ~np.asarray(d2)
        np.testing.assert_allclose(
            np.asarray(cols_out[:, 0:3])[live],
            np.asarray(st2.drones.pos[:, 0])[live], atol=1e-5)
        np.testing.assert_array_equal(
            np.asarray(cols_out[:, 16])[live],
            np.asarray(st2.next_gate[:, 0], np.float32)[live])

    def test_trajectory_gate_passing_parity(self):
        """T=40 deterministic rollout: gates_passed counters and rewards
        track the XLA env run with the same policy (small f32 drift)."""
        venv, world, state, obs, net, params = _setup()
        cols, hist = _carry_from_reset(venv, state, obs)
        T = 40
        frames, extra, aux, cols_out = pallas_race_vision_rollout(
            venv, cols, hist, world, _weights(params), T, 7, e_blk=8,
            compute_dtype=None, interpret=True)

        def xla_body(carry, _):
            st = carry
            o = venv._obs(st, world)
            px = prepatch_pixels(o["pixels"][:, 0]).reshape(N, -1, 64)
            pr = jnp.concatenate(
                [o["rates"], o["accel_z"], o["thrust"], o["gate_onehot"]],
                axis=-1)[:, 0]
            mean, _, _ = net.apply(params, px, pr)
            st, _, r, d, info = jax.vmap(
                lambda s, a: venv.race.step(s, a[None], world))(st, mean)
            return st, (r[:, 0], d, info["gates_passed"][:, 0])

        st_end, (rs, ds, gs) = jax.lax.scan(xla_body, state, None, length=T)
        if not np.asarray(ds).any():
            np.testing.assert_allclose(np.asarray(aux[..., 4]),
                                       np.asarray(rs), atol=2e-3)
            np.testing.assert_array_equal(
                np.asarray(cols_out[:, 19]),
                np.asarray(gs[-1], np.float32))
            assert np.asarray(gs[-1]).sum() >= 0
        else:
            np.testing.assert_array_equal(
                np.asarray(aux[..., 5] > 0.5), np.asarray(ds))

    def test_reset_respawns_at_ring(self):
        """Crash an env (spawn at ground): done fires and the respawn sits
        near the spawn ring with next_gate 0 and the flush flag set."""
        venv, world, state, obs, net, params = _setup()
        cols, hist = _carry_from_reset(venv, state, obs)
        low = cols.at[:, 2].set(0.02).at[:, 5].set(-5.0)
        frames, extra, aux, cols_out = pallas_race_vision_rollout(
            venv, low, hist, world, _weights(params), 6, 3, e_blk=8,
            compute_dtype=None, interpret=True)
        done = np.asarray(aux[..., 5]) > 0.5
        assert done.any(), "no reset from ground-level spawn"
        race = venv.race
        ever = done.any(axis=0)
        pos = np.asarray(cols_out[:, 0:3])
        base = np.array([race.track_radius + race.spawn_radius,
                         -3.0 - race.spawn_radius, race.spawn_height])
        # respawned envs integrated at most a few steps from the ring
        assert (np.abs(pos[ever] - base) < 4.0).all()

    def test_frame_stack_shift_and_flush(self):
        """K=3: the stack holds the last 3 frames (newest last) and resets
        flush the history to the respawn frame."""
        venv, world, state, obs, net, params = _setup(frame_stack=3)
        cols, hist = _carry_from_reset(venv, state, obs)
        T = 5
        frames, extra, aux, cols_out = pallas_race_vision_rollout(
            venv, cols, hist, world, _weights(params), T, 7, e_blk=8,
            compute_dtype=None, interpret=True)
        K, NP = 3, 12
        f = np.asarray(frames, np.float32).reshape(T, N, NP, K, 64)
        done = np.asarray(aux[..., 5]) > 0.5
        for t in range(1, T):
            for n in range(N):
                if done[:t, n].any():
                    continue  # reset flushed the history
                # slot K-2 at t == slot K-1 at t-1 (pure shift)
                np.testing.assert_array_equal(f[t, n, :, K - 2],
                                              f[t - 1, n, :, K - 1])
        # fresh-env init: all slots equal at t=0 (history = first frame)
        np.testing.assert_array_equal(f[0, :, :, 0], f[0, :, :, 1])
        np.testing.assert_array_equal(f[0, :, :, 1], f[0, :, :, 2])

    def test_frame_stack_policy_parity(self):
        """K=2 stacked kernel forward == the XLA stacked net on the same
        frames (shared params; the K*64 embed contraction)."""
        venv, world, state, obs, net, params = _setup(frame_stack=2)
        cols, hist = _carry_from_reset(venv, state, obs)
        frames, extra, aux, _ = pallas_race_vision_rollout(
            venv, cols, hist, world, _weights(params), 1, 7, e_blk=8,
            compute_dtype=None, interpret=True)
        px = frames[0].reshape(N, 12, 2 * 64)
        pr = extra[0, :, :11]
        mean, _, value = net.apply(params, px / 255.0, pr)
        np.testing.assert_allclose(np.asarray(aux[0, :, :4]),
                                   np.asarray(mean), atol=5e-5)

    def test_obstacles_move_and_kill(self):
        """Obstacle positions advance with episode time inside the kernel:
        the rendered frames differ across steps for a static drone, and
        obstacle contact crashes (env reset fires)."""
        venv, world, state, obs, net, params = _setup(n_obstacles=3)
        cols, hist = _carry_from_reset(venv, state, obs)
        # park env 0 ON the obstacle orbit (radius = track_radius, z =
        # gate_height) ahead of obstacle 0 and freeze it (zero action via
        # zero weights + zero std -> hover-ish; physics still moves it a
        # bit but the obstacle sweep reaches it)
        R = venv.race.track_radius
        cols = cols.at[:, 0].set(R).at[:, 1].set(0.0).at[:, 2].set(
            venv.race.gate_height)
        T = 30
        frames, extra, aux, cols_out = pallas_race_vision_rollout(
            venv, cols, hist, world, _weights(params), T, 3, e_blk=8,
            compute_dtype=None, interpret=True)
        f = np.asarray(frames, np.float32)
        assert (f[0] != f[10]).any(), "frames static despite moving spheres"

    def test_onehot_ablation_zeroes_block(self):
        venv, world, state, obs, net, params = _setup(gate_onehot=False)
        cols, hist = _carry_from_reset(venv, state, obs)
        frames, extra, aux, _ = pallas_race_vision_rollout(
            venv, cols, hist, world, _weights(params), 2, 7, e_blk=8,
            compute_dtype=None, interpret=True)
        np.testing.assert_array_equal(np.asarray(extra[..., 5:11]), 0.0)


class TestRacePpoIntegration:
    def test_kernel_race_ppo_iteration(self):
        from fpyv_tpu.rl.ppo import PpoConfig, make_ppo

        venv, world, state, obs, net, params = _setup(frame_stack=2)
        (apply_fn, make_rollout_fn, obs_from_carry, init_carry,
         race_metrics) = make_kernel_race_ppo_parts(
            venv, world, net, N, e_blk=8, interpret=True)
        carry = init_carry(jax.random.split(jax.random.key(0), N))
        obs0 = obs_from_carry(carry)
        config = PpoConfig(num_envs=N, num_steps=4, update_epochs=1,
                           num_minibatches=2)
        init, iteration = make_ppo(
            apply_fn, None, config,
            rollout_fn=make_rollout_fn(4, compute_dtype=None),
            metrics_fn=race_metrics)
        st = init(params, carry, obs0, jax.random.key(1))
        st2, info = iteration(st)
        assert np.isfinite(float(np.asarray(info["loss"])))
        assert "mean_gates_passed" in info
        assert st2.env_state[0].shape == (N, RROWS)

    def test_train_vision_race_kernel_smoke(self):
        from fpyv_tpu.apps.train import train_vision_race

        res = train_vision_race(
            num_envs=16, num_iterations=3, num_steps=4, seed=0,
            rollout="kernel", rig=RIG, scan_chunk=1, num_minibatches=2,
            update_epochs=1, compute_dtype="f32", frame_stack=2,
            print_every=100)
        assert np.isfinite(res.mean_reward_last)

    def test_kernel_rejects_multi_agent(self):
        from fpyv_tpu.apps.train import train_vision_race

        with pytest.raises(ValueError):
            train_vision_race(num_envs=8, num_iterations=1, n_agents=2,
                              rollout="kernel", rig=RIG)
