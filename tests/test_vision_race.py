"""Vision gate racing (BASELINE config #4's gate/track-marker pixels):
envs/vision_race.py + apps/train.train_vision_race."""

import jax
import jax.numpy as jnp
import numpy as np

from fpyv_tpu.envs.multi_race import MultiRaceEnv
from fpyv_tpu.envs.vision_race import VisionRaceEnv


class TestVisionRaceEnv:
    def _env(self, **kw):
        return VisionRaceEnv(race=MultiRaceEnv(n_agents=1, **kw))

    def test_gates_visible_in_pixels(self):
        """The gate markers themselves (not just ground) land on the
        96x72 sensor with the widened frame band."""
        env = self._env()
        world = env.default_world()
        st, obs = env.reset_batched(jax.random.split(jax.random.key(0), 2),
                                    world)
        from fpyv_tpu.physics.drone import _att_to_rotmat
        from fpyv_tpu.vision.camera import camera_pose
        from fpyv_tpu.vision.raycast import render_depth_raycast

        pos = st.drones.pos[..., 0, :]
        R = _att_to_rotmat(env.params, st.drones.att[..., 0, :])
        cam_pos, cam_R = camera_pose(env.rig, pos, R)
        gates_only = np.asarray(render_depth_raycast(
            env.rig, cam_pos, cam_R, world, max_depth=env.max_depth,
            include=("gates",), frame_width=env.frame_width))
        assert (gates_only > 0).reshape(2, -1).sum(axis=1).min() > 10
        # and at the DEFAULT 0.08 band the markers all but vanish — the
        # configurable width is load-bearing for this env
        thin = np.asarray(render_depth_raycast(
            env.rig, cam_pos, cam_R, world, max_depth=env.max_depth,
            include=("gates",), frame_width=0.08))
        assert (thin > 0).sum() < (gates_only > 0).sum()

    def test_obs_dict_shapes_and_dtypes(self):
        env = self._env()
        world = env.default_world()
        st, obs = env.reset_batched(jax.random.split(jax.random.key(1), 3),
                                    world)
        assert obs["pixels"].shape == (3, 72, 96)
        assert obs["pixels"].dtype == jnp.uint8
        assert obs["gate_onehot"].shape == (3, env.n_gates)
        np.testing.assert_allclose(np.asarray(obs["gate_onehot"][:, 0]), 1.0)

    def test_gate_pass_updates_onehot_and_reward(self):
        """Teleport the drone through gate 0's plane inside the opening:
        gates_passed increments, the onehot flips to gate 1, and the gate
        bonus lands in the reward."""
        env = self._env()
        world = env.default_world()
        st, obs = env.reset_batched(jax.random.split(jax.random.key(2), 1),
                                    world)
        # gate 0 sits at (track_radius, 0, gate_height) with normal +y;
        # place the drone just before the plane, flying +y through center
        gp = np.asarray(world.gate_pos[0])
        pos = jnp.asarray([[[gp[0], gp[1] - 0.05, gp[2]]]], jnp.float32)
        vel = jnp.asarray([[[0.0, 10.0, 0.0]]], jnp.float32)
        st = st.replace(
            drones=st.drones.replace(pos=pos, vel=vel),
            prev_gate_dist=jnp.asarray([[-0.05]], jnp.float32),
            # zero the progress term so the reward check isolates the
            # gate bonus (prev_center_dist is from the distant spawn)
            prev_center_dist=jnp.asarray([[0.05]], jnp.float32))
        a = jnp.zeros((1, 4), jnp.float32)
        st2, obs2, r, d, info = env.step_batched(st, a, world)
        assert int(np.asarray(info["gates_passed"])[0]) == 1
        np.testing.assert_allclose(np.asarray(obs2["gate_onehot"][0, 1]), 1.0)
        assert float(np.asarray(r)[0]) > env.race.w_gate * 0.5


class TestTrainVisionRace:
    def test_smoke(self):
        from fpyv_tpu.apps.train import train_vision_race

        res = train_vision_race(num_envs=8, num_iterations=4, num_steps=4,
                                scan_chunk=2, num_minibatches=2,
                                compute_dtype="f32", print_every=100)
        assert np.isfinite(res.mean_reward_last)

    def test_checkpoint_play_roundtrip(self, tmp_path):
        """train -> checkpoint -> deterministic playback (cli play
        --env vision_race) with the patch-torso net."""
        from fpyv_tpu.apps.play import play_policy
        from fpyv_tpu.apps.train import train_vision_race

        ck = str(tmp_path / "ck")
        train_vision_race(num_envs=8, num_iterations=2, num_steps=4,
                          scan_chunk=1, num_minibatches=2,
                          compute_dtype="f32", checkpoint_dir=ck,
                          checkpoint_every=2, print_every=100)
        out = play_policy(checkpoint_dir=ck, env_name="vision_race",
                          steps=8, num_envs=4, chunk=4)
        assert out["env"] == "vision_race"
        assert np.isfinite(out["mean_reward_per_step"])
        assert "final_gates_passed_mean" in out


class TestPurePixels:
    def test_gate_onehot_off_zeroes_block(self):
        from fpyv_tpu.envs.multi_race import MultiRaceEnv
        from fpyv_tpu.envs.vision_race import VisionRaceEnv

        env = VisionRaceEnv(race=MultiRaceEnv(n_agents=1), gate_onehot=False)
        world = env.default_world()
        st, obs = env.reset_batched(jax.random.split(jax.random.key(0), 2),
                                    world)
        np.testing.assert_allclose(np.asarray(obs["gate_onehot"]), 0.0)
        # same shapes as the informed variant: pure ablation, no net change
        env2 = VisionRaceEnv(race=MultiRaceEnv(n_agents=1))
        _, obs2 = env2.reset_batched(jax.random.split(jax.random.key(0), 2),
                                     world)
        assert obs["gate_onehot"].shape == obs2["gate_onehot"].shape


class TestMultiAgentVision:
    """Multi-agent vision racing: per-agent FPV views with the OTHER
    drones rendered as spheres at their live positions."""

    def _env(self, **kw):
        from fpyv_tpu.envs.multi_race import MultiRaceEnv

        return VisionRaceEnv(race=MultiRaceEnv(n_agents=2), **kw)

    def test_flat_shapes(self):
        env = self._env()
        world = env.default_world()
        st, obs = env.reset_batched(jax.random.split(jax.random.key(0), 3),
                                    world)
        assert obs["pixels"].shape == (6, 72, 96)  # 3 races x 2 agents
        assert obs["gate_onehot"].shape == (6, env.n_gates)
        a = jnp.zeros((6, 4), jnp.float32)
        st2, obs2, r, d, info = env.step_batched(st, a, world)
        assert r.shape == (6,)
        assert info["crashed"].shape == (6,)
        assert d.shape == (3,)  # env-level done stays per race

    def test_opponent_visible_in_fpv(self):
        env = self._env()
        world = env.default_world()
        st, _ = env.reset_batched(jax.random.split(jax.random.key(0), 1),
                                  world)
        p0 = np.asarray(st.drones.pos)[0, 0]
        # opponent 2.5 m ahead (+y, the spawn heading) of agent 0, just
        # under its camera height so the 35-deg-down rig centers it
        newpos = jnp.asarray([[[p0[0], p0[1], 3.0],
                               [p0[0], p0[1] + 2.5, 2.5]]], jnp.float32)
        st = st.replace(drones=st.drones.replace(pos=newpos))
        obs = env._obs(st, world)
        ghost = self._env(opponent_radius=1e-6)  # same scene, no opponent
        obs_g = ghost._obs(st, world)
        delta = np.abs(np.asarray(obs["pixels"], np.int32)
                       - np.asarray(obs_g["pixels"], np.int32))
        assert (delta[0, 0] > 0).sum() > 3  # agent 0 sees the opponent

    def test_trainer_smoke(self):
        from fpyv_tpu.apps.train import train_vision_race

        res = train_vision_race(num_envs=4, n_agents=2, num_iterations=4,
                                num_steps=4, scan_chunk=2, num_minibatches=2,
                                compute_dtype="f32", print_every=100)
        assert np.isfinite(res.mean_reward_last)
