"""Vision gate racing (BASELINE config #4's gate/track-marker pixels):
envs/vision_race.py + apps/train.train_vision_race."""

import jax
import jax.numpy as jnp
import numpy as np

from fpyv_tpu.envs.multi_race import MultiRaceEnv, MultiRaceState
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


class TestFrameStack:
    """Temporal memory for the pixel racer (VERDICT r3 #3)."""

    def _env(self, k=3, **kw):
        return VisionRaceEnv(race=MultiRaceEnv(n_agents=1, **kw),
                             frame_stack=k)

    def test_stacked_shapes_and_init(self):
        env = self._env(k=3)
        world = env.default_world()
        st, obs = env.reset_batched(jax.random.split(jax.random.key(0), 2),
                                    world)
        assert obs["pixels"].shape == (2, 3, 72, 96)
        assert obs["pixels"].dtype == jnp.uint8
        # at reset the stack is K copies of the first frame
        px = np.asarray(obs["pixels"])
        np.testing.assert_array_equal(px[:, 0], px[:, 1])
        np.testing.assert_array_equal(px[:, 1], px[:, 2])

    def test_history_shifts_newest_last(self):
        env = self._env(k=3)
        world = env.default_world()
        st, obs0 = env.reset_batched(jax.random.split(jax.random.key(1), 1),
                                     world)
        a = jnp.zeros((1, 4), jnp.float32).at[:, 1].set(0.5)  # pitch
        st1, obs1, _, _, _ = env.step_batched(st, a, world)
        st2, obs2, _, _, _ = env.step_batched(st1, a, world)
        p0 = np.asarray(obs0["pixels"])  # frames [f0 f0 f0]
        p1 = np.asarray(obs1["pixels"])  # frames [f0 f0 f1]
        p2 = np.asarray(obs2["pixels"])  # frames [f0 f1 f2]
        np.testing.assert_array_equal(p1[:, 0], p0[:, 2])
        np.testing.assert_array_equal(p2[:, 0], p1[:, 1])
        np.testing.assert_array_equal(p2[:, 1], p1[:, 2])
        # and the drone is moving, so the newest frame differs
        assert (p2[:, 2].astype(int) - p2[:, 1].astype(int) != 0).any()

    def test_k1_keeps_original_state_and_shapes(self):
        env = VisionRaceEnv(race=MultiRaceEnv(n_agents=1), frame_stack=1)
        world = env.default_world()
        st, obs = env.reset_batched(jax.random.split(jax.random.key(2), 2),
                                    world)
        assert obs["pixels"].shape == (2, 72, 96)
        assert isinstance(st, MultiRaceState)

    def test_trainer_smoke_with_stack(self):
        from fpyv_tpu.apps.train import train_vision_race

        res = train_vision_race(num_envs=4, num_iterations=3, num_steps=4,
                                scan_chunk=1, num_minibatches=2,
                                frame_stack=3, compute_dtype="f32",
                                print_every=100)
        assert np.isfinite(res.mean_reward_last)


class TestOpponentKnobs:
    """Opponent-aware racing (VERDICT r3 #6): ablation switches + the
    zero-sum overtake reward."""

    def test_show_opponents_off_removes_them_from_frame(self):
        race = MultiRaceEnv(n_agents=2)
        world = race.default_world()
        env_on = VisionRaceEnv(race=race)
        env_off = VisionRaceEnv(race=race, show_opponents=False)
        st, _ = env_on.reset_batched(jax.random.split(jax.random.key(0), 1),
                                     world)
        p0 = np.asarray(st.drones.pos)[0, 0]
        newpos = jnp.asarray([[[p0[0], p0[1], 3.0],
                               [p0[0], p0[1] + 2.5, 2.5]]], jnp.float32)
        st = st.replace(drones=st.drones.replace(pos=newpos))
        d = (np.abs(np.asarray(env_on._obs(st, world)["pixels"], np.int32)
                    - np.asarray(env_off._obs(st, world)["pixels"],
                                 np.int32)))
        assert (d[0, 0] > 0).sum() > 3  # ON shows the opponent; OFF doesn't

    def test_others_in_obs_ablation_zeroes_block(self):
        on = MultiRaceEnv(n_agents=3)
        off = MultiRaceEnv(n_agents=3, others_in_obs=False)
        world = on.default_world()
        st, obs_on = on.reset(jax.random.key(0), world)
        obs_off = off._obs(st, world)
        # the others block is the LAST (A-1)*3 columns
        n = (on.n_agents - 1) * 3
        assert np.abs(np.asarray(obs_on[..., -n:])).sum() > 0
        np.testing.assert_allclose(np.asarray(obs_off[..., -n:]), 0.0)
        np.testing.assert_allclose(np.asarray(obs_off[..., :-n]),
                                   np.asarray(obs_on[..., :-n]))

    def test_overtake_reward_zero_sum_and_signed(self):
        """Agent 1 teleports from last place to the lead: it earns
        +w_overtake per position gained, the overtaken agents lose the
        same total (zero-sum), and gates/progress terms stay untouched."""
        env0 = MultiRaceEnv(n_agents=2, w_overtake=0.0,
                            agent_collision_radius=0.0)
        env1 = MultiRaceEnv(n_agents=2, w_overtake=2.0,
                            agent_collision_radius=0.0)
        world = env0.default_world()
        st, _ = env0.reset(jax.random.key(3), world)
        # agent 1 starts ranked last, then steps 20 m ahead of agent 0
        # (position-first integration: p += v*dt with the OLD velocity)
        pos = np.asarray(st.drones.pos)
        st = st.replace(
            drones=st.drones.replace(
                pos=jnp.asarray([pos[0], [pos[0][0], pos[0][1] - 8.0,
                                          pos[0][2]]]),
                vel=jnp.asarray([[0.0, 0.0, 0.0], [0.0, 1680.0, 0.0]],
                                jnp.float32)),
            prev_rank=jnp.asarray([0, 1], jnp.int32))
        a = jnp.zeros((2, 4), jnp.float32)
        _, _, r0, _, _ = env0.step(st, a, world)
        _, _, r1, _, info = env1.step(st, a, world)
        dr = np.asarray(r1) - np.asarray(r0)
        assert abs(dr.sum()) < 1e-5  # zero-sum
        # ranks actually changed hands exactly once in one direction
        assert int(np.asarray(info["overtakes"]).sum()) >= 1
        assert dr.max() > 1.9  # the overtaker earned ~w_overtake


class TestMovingObstacles:
    """Moving track obstacles (ROADMAP r3 depth item): spheres orbiting the
    gate circle on the reference's CircularPath arithmetic, positions a
    pure function of episode time."""

    def _env(self, n=2, **kw):
        return VisionRaceEnv(race=MultiRaceEnv(
            n_agents=1, n_obstacles=n, **kw))

    def test_obstacles_orbit_with_episode_time(self):
        race = MultiRaceEnv(n_agents=1, n_obstacles=2, obstacle_period=8)
        world = race.default_world()
        p0 = np.asarray(race._obstacles_at(world, jnp.int32(0)))
        p4 = np.asarray(race._obstacles_at(world, jnp.int32(4)))
        p8 = np.asarray(race._obstacles_at(world, jnp.int32(8)))
        # half a revolution flips the position through the center
        np.testing.assert_allclose(p4[:, :2], -p0[:, :2], atol=1e-4)
        np.testing.assert_allclose(p8, p0, atol=1e-4)  # full revolution
        # on the gate circle at gate height
        r = np.linalg.norm(p0[:, :2], axis=-1)
        np.testing.assert_allclose(r, race.track_radius, rtol=1e-5)
        np.testing.assert_allclose(p0[:, 2], race.gate_height)
        # phase spread: the two obstacles are apart
        assert np.linalg.norm(p0[0] - p0[1]) > race.track_radius

    def test_obstacle_contact_crashes(self):
        race = MultiRaceEnv(n_agents=1, n_obstacles=1, obstacle_period=600)
        world = race.default_world()
        st, _ = race.reset(jax.random.key(0), world)
        # park the drone exactly where the obstacle will be at t+1
        target = race._obstacles_at(world, st.t + 1)[0]
        st = st.replace(drones=st.drones.replace(
            pos=target[None, :], vel=jnp.zeros((1, 3), jnp.float32)))
        _, _, _, _, info = race.step(st, jnp.zeros((1, 4), jnp.float32),
                                     world)
        assert bool(np.asarray(info["crashed"])[0])

    def test_obstacles_visible_in_fpv(self):
        env = self._env(n=3)
        world = env.default_world()
        st, _ = env.reset_batched(jax.random.split(jax.random.key(1), 1),
                                  world)
        # park the drone 2.5 m behind an obstacle along its spawn heading
        # (+y, like the opponent-visibility test): the sphere must land on
        # the sensor
        target = np.asarray(env.race._obstacles_at(world, st.t[0]))[0]
        look_from = jnp.asarray(
            [[[target[0], target[1] - 2.5, 3.0]]], jnp.float32)
        st = st.replace(drones=st.drones.replace(pos=look_from))
        ghost = self._env(n=0)  # same track, no obstacles
        d = (np.abs(np.asarray(env._obs(st, world)["pixels"], np.int32)
                    - np.asarray(ghost._obs(st, ghost.default_world())
                                 ["pixels"], np.int32)))
        assert (d[0, 0] > 0).sum() > 3

    def test_trainer_smoke_with_obstacles(self):
        from fpyv_tpu.apps.train import train_vision_race

        res = train_vision_race(num_envs=4, num_iterations=3, num_steps=4,
                                scan_chunk=1, num_minibatches=2,
                                n_obstacles=2, compute_dtype="f32",
                                print_every=100)
        assert np.isfinite(res.mean_reward_last)


class TestPermuteSpawns:
    """Per-episode spawn-slot permutation (VERDICT r4 #4: the role-lock-in
    fix): with permute_spawns, agent index decouples from the spawn ring
    slot; without it, agent i always starts at ring angle 2*pi*i/A."""

    def test_fixed_slots_by_default(self):
        env = MultiRaceEnv(n_agents=4)
        xs = np.stack([
            np.asarray(env._sample_drones(jax.random.key(s)).pos[0])
            for s in range(20)])
        # agent 0's spawn varies only by the 0.3 m jitter
        assert xs[:, 0].std() < 0.6

    def test_permutation_spreads_agent_over_slots(self):
        env = MultiRaceEnv(n_agents=4, permute_spawns=True)
        xs = np.stack([
            np.asarray(env._sample_drones(jax.random.key(s)).pos[0])
            for s in range(40)])
        # agent 0 lands on different ring slots (spawn_radius=2 spread)
        assert xs[:, 0].std() > 0.8
        # the slot SET is preserved: same ring, just reassigned
        env0 = MultiRaceEnv(n_agents=4)
        base = np.sort(np.asarray(
            env0._sample_drones(jax.random.key(7)).pos)[:, 0])
        perm = np.sort(np.asarray(
            env._sample_drones(jax.random.key(7)).pos)[:, 0])
        np.testing.assert_allclose(base, perm, atol=1.5)  # jitter-tolerant

    def test_trainer_smoke_with_permutation(self):
        from fpyv_tpu.apps.train import train_race

        res = train_race(num_envs=4, n_agents=4, num_iterations=3,
                         num_steps=4, scan_chunk=1, permute_spawns=True,
                         print_every=100)
        assert np.isfinite(res.mean_reward_last)


class TestGruPolicy:
    """Recurrent temporal memory (VERDICT r4 #6): GRU between torso and
    heads, trained with the sequence-minibatched recurrent PPO."""

    def test_net_signature_and_hidden_update(self):
        from fpyv_tpu.models.policy import PixelActorCritic

        net = PixelActorCritic(action_dim=4, torso="patch", gru=8,
                               compute_dtype=None)
        kx = jax.random.key(3)
        px = jax.random.uniform(kx, (3, 72, 96), jnp.float32)
        pr = jax.random.normal(jax.random.key(4), (3, 5), jnp.float32)
        h0 = jnp.zeros((3, 8), jnp.float32)
        params = net.init(jax.random.key(0), px, pr, h0)
        mean, log_std, value, h1 = net.apply(params, px, pr, h0)
        assert mean.shape == (3, 4) and value.shape == (3,)
        assert h1.shape == (3, 8)
        # hidden actually evolves (zeros in, nonzero out through the GRU)
        assert np.abs(np.asarray(h1)).sum() > 0
        # and feeding the evolved hidden changes the action
        mean2, _, _, _ = net.apply(params, px, pr, h1)
        assert np.abs(np.asarray(mean2) - np.asarray(mean)).max() > 0

    def test_gru_zero_keeps_feedforward_signature(self):
        from fpyv_tpu.models.policy import PixelActorCritic

        net = PixelActorCritic(action_dim=4, torso="patch", gru=0,
                               compute_dtype=None)
        px = jnp.zeros((2, 72, 96), jnp.float32)
        pr = jnp.zeros((2, 5), jnp.float32)
        params = net.init(jax.random.key(0), px, pr)
        out = net.apply(params, px, pr)
        assert len(out) == 3

    def test_recurrent_learner_recompute_is_exact(self, tmp_path):
        """Epoch-0 invariant: with ONE minibatch (all envs, params not yet
        updated) the learner's sequence re-scan from h0 — replaying the
        rollout's done-resets — must reproduce the rollout log_probs, so
        approx_kl == 0. This pins the truncated-BPTT replay semantics
        (zeroing the hidden before instead of after a step, or replaying
        from the wrong h0, breaks it)."""
        import json

        from fpyv_tpu.apps.train import train_vision_race

        # single iteration, ONE minibatch, ONE epoch: the logged approx_kl
        # IS the first minibatch's, computed before any param update
        log_dir = str(tmp_path / "log")
        res = train_vision_race(
            num_envs=4, num_iterations=1, num_steps=6, scan_chunk=1,
            num_minibatches=1, update_epochs=1, gru=8,
            compute_dtype="f32", print_every=100,
            log_dir=log_dir)
        assert np.isfinite(res.mean_reward_last)
        rows = [json.loads(l)
                for l in open(f"{log_dir}/metrics.jsonl")]
        kl = [r["approx_kl"] for r in rows if "approx_kl" in r]
        assert kl, "approx_kl not logged"
        assert abs(kl[0]) < 1e-5, f"replay not exact: approx_kl={kl[0]}"

    def test_trainer_smoke_and_play_roundtrip(self, tmp_path):
        from fpyv_tpu.apps.play import play_policy
        from fpyv_tpu.apps.train import train_vision_race

        ck = str(tmp_path / "ck")
        res = train_vision_race(num_envs=4, n_agents=2, num_iterations=3,
                                num_steps=4, scan_chunk=1,
                                num_minibatches=2, gru=8,
                                compute_dtype="f32", checkpoint_dir=ck,
                                checkpoint_every=3, print_every=100)
        assert np.isfinite(res.mean_reward_last)
        out = play_policy(checkpoint_dir=ck, env_name="vision_race",
                          n_agents=2, steps=8, num_envs=2, chunk=4)
        assert np.isfinite(out["mean_reward_per_step"])
        assert "agent_gates_mean" in out
