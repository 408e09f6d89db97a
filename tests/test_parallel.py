"""Distributed tests on the 8-virtual-device CPU mesh: sharded rollouts,
determinism across shard layouts, distributed PPO step."""

import pytest
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from fpyv_tpu.envs.acro import AcroEnv
from fpyv_tpu.parallel.mesh import make_mesh, replicate, shard_leading_axis
from fpyv_tpu.physics.drone import DroneParams


class TestMesh:
    def test_make_mesh_spans_devices(self, eight_devices):
        mesh = make_mesh()
        assert mesh.size == len(jax.devices())
        assert mesh.axis_names == ("env",)

    def test_shard_leading_axis(self, eight_devices):
        mesh = make_mesh(8)
        x = jnp.arange(64.0).reshape(16, 4)
        xs = shard_leading_axis(x, mesh)
        assert xs.sharding == NamedSharding(mesh, P("env"))


class TestShardingDeterminism:
    def test_rollout_identical_across_layouts(self, eight_devices):
        """SURVEY §7 'multi-host determinism': identical trajectories
        regardless of device count/sharding, because randomness lives in
        per-env keys. Compare a 64-env rollout on 1 device vs sharded on 8."""
        env = AcroEnv(params=DroneParams(att_mode="quat"))
        world = env.default_world()
        N, T = 64, 25
        keys = jax.random.split(jax.random.key(0), N)

        def run(state):
            action = jnp.zeros((N, 4)).at[:, 3].set(-0.6)

            def body(st, _):
                st, obs, r, d, _ = jax.vmap(
                    lambda s, a: env.step(s, a, world))(st, action)
                return st, (r, st.drone.pos)

            st, (rs, ps) = jax.lax.scan(body, state, None, length=T)
            return rs, ps

        state0, _ = jax.vmap(lambda k: env.reset(k, world))(keys)
        r_single, p_single = jax.jit(run)(state0)

        mesh = make_mesh(8)
        state_sharded = shard_leading_axis(state0, mesh)
        r_shard, p_shard = jax.jit(run)(state_sharded)

        np.testing.assert_array_equal(np.asarray(r_single), np.asarray(r_shard))
        np.testing.assert_array_equal(np.asarray(p_single), np.asarray(p_shard))


class TestDistributedPpo:
    @pytest.mark.slow
    def test_dryrun_multichip(self, eight_devices):
        """The driver's multichip validation path must pass on the fake mesh.
        slow: three full distributed compiles (acro + vision + ES); the
        driver also runs this every round (MULTICHIP_rN.json)."""
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
        from __graft_entry__ import dryrun_multichip

        dryrun_multichip(8)

    def test_entry_compiles(self, eight_devices):
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
        from __graft_entry__ import entry

        fn, args = entry()
        out = jax.jit(fn)(*args)
        jax.block_until_ready(out)


class TestPpoLearning:
    def test_ppo_learns_reach_task(self, eight_devices):
        """Sanity-of-learning on a stable task: obs is a random 3-vector
        target, reward = -|a - obs|²; PPO must learn to echo the obs.
        (The full attitude-control training runs are TPU demos, not CI —
        they need thousands of iterations.)"""
        from fpyv_tpu.models.policy import ActorCritic
        from fpyv_tpu.rl.ppo import PpoConfig, make_ppo

        N = 256
        net = ActorCritic(action_dim=3, hidden=(32, 32))
        config = PpoConfig(num_envs=N, num_steps=8, update_epochs=4,
                           num_minibatches=4, learning_rate=3e-3,
                           ent_coef=0.0)

        def env_step(env_state, action, key):
            target = env_state
            reward = -jnp.sum((action - target) ** 2, axis=-1)
            new_target = jax.random.uniform(key, target.shape, target.dtype,
                                            minval=-0.5, maxval=0.5)
            done = jnp.ones(target.shape[0], bool)
            return new_target, new_target, reward, done

        obs0 = jax.random.uniform(jax.random.key(0), (N, 3),
                                  minval=-0.5, maxval=0.5)
        params = net.init(jax.random.key(1), obs0[:1])
        init, iteration = make_ppo(net.apply, env_step, config)
        iteration = jax.jit(iteration)
        state = init(params, obs0, obs0, jax.random.key(2))

        rewards = []
        for _ in range(25):
            state, info = iteration(state)
            rewards.append(float(np.asarray(info["mean_reward"])))
        assert np.mean(rewards[-5:]) > np.mean(rewards[:5]) + 0.05, rewards


class TestDistributedRace:
    """BASELINE config #5's sharding clause (VERDICT r3 #2): the shared-
    policy multi-agent race layout — MultiRaceState carry P('env') on the
    race axis, learner on the flat race-major (races * agents) batch."""

    def test_race_rollout_identical_across_layouts(self, eight_devices):
        """Deterministic shared-policy rollout: unsharded vs P('env') on 8
        devices must produce bit-identical rewards/gate counters (per-env
        keys, order-independent math)."""
        from fpyv_tpu.envs.multi_race import (MultiRaceEnv,
                                              make_shared_policy_env_step)

        A, n_races, T = 2, 16, 20
        env = MultiRaceEnv(n_agents=A, max_episode_steps=64)
        env_step, reset_fn = make_shared_policy_env_step(
            env, env.default_world(), n_envs=n_races)
        state0, obs0 = reset_fn(jax.random.key(0))
        action = jnp.tile(jnp.asarray([[0.0, 0.2, 0.0, -0.3]]),
                          (n_races * A, 1))

        def run(state):
            def body(st, _):
                st, obs, r, d = env_step(st, action, None)
                return st, (r, st.gates_passed)

            return jax.lax.scan(body, state, None, length=T)[1]

        r_single, g_single = jax.jit(run)(state0)
        mesh = make_mesh(8)
        r_shard, g_shard = jax.jit(run)(shard_leading_axis(state0, mesh))
        np.testing.assert_array_equal(np.asarray(r_single),
                                      np.asarray(r_shard))
        np.testing.assert_array_equal(np.asarray(g_single),
                                      np.asarray(g_shard))

    def test_distributed_race_iteration(self, eight_devices):
        """One shard_map'd shared-policy race PPO iteration on the 8-device
        mesh: runs, finite loss, global race metrics in info."""
        from fpyv_tpu.envs.multi_race import (MultiRaceEnv,
                                              make_shared_policy_env_step)
        from fpyv_tpu.models.policy import ActorCritic
        from fpyv_tpu.parallel.train import (make_distributed_ppo,
                                             shard_ppo_state)
        from fpyv_tpu.rl.ppo import PpoConfig

        A, n_races = 2, 32
        env = MultiRaceEnv(n_agents=A, max_episode_steps=64)
        env_step, reset_fn = make_shared_policy_env_step(
            env, env.default_world(), n_envs=n_races)
        net = ActorCritic(action_dim=4, hidden=(16, 16))
        config = PpoConfig(num_envs=n_races * A, num_steps=4,
                           update_epochs=1, num_minibatches=2)
        mesh = make_mesh(8)

        def metrics(env_state):
            return {"mean_gates_passed":
                    env_state.gates_passed.astype(jnp.float32).mean()}

        state0, obs0 = reset_fn(jax.random.key(0))
        params = net.init(jax.random.key(1), obs0[:1])
        init, iteration = make_distributed_ppo(
            net.apply, env_step, config, mesh, metrics_fn=metrics)
        state = init(params, state0, obs0,
                     jax.random.split(jax.random.key(2), 8))
        state = shard_ppo_state(state, mesh)
        state, info = iteration(state)
        assert np.isfinite(float(np.asarray(info["loss"])))
        assert "mean_gates_passed" in info
        # the carry stayed sharded on the race axis
        assert state.env_state.gates_passed.sharding.spec == P("env")


@pytest.mark.slow
class TestDcnTwoProcess:
    @pytest.mark.parametrize("workload", ["rotate", "race"])
    def test_hybrid_mesh_two_process_ppo(self, tmp_path, workload):
        """VERDICT #6 / BASELINE #5: make_hybrid_mesh's multi-process (DCN)
        branch actually executes — 2 coordinated processes x 4 virtual CPU
        devices each run one distributed PPO iteration over the global
        8-device mesh (multi-controller SPMD; gRPC stands in for DCN).
        The "race" workload runs the shared-policy multi-agent race layout
        (MultiRaceState carry P('env'), flat race-major agent batch) — the
        ">=2 hosts" clause of config #5 under true multi-process SPMD."""
        import json
        import socket
        import subprocess
        import sys
        from pathlib import Path

        repo = Path(__file__).resolve().parents[1]
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        coord = f"127.0.0.1:{port}"

        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)  # worker sets its own device count
        env["JAX_PLATFORMS"] = "cpu"
        procs = [
            subprocess.Popen(
                [sys.executable, str(repo / "tools" / "dcn_worker.py"),
                 str(i), "2", coord, workload],
                stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                cwd=repo, env=env, text=True)
            for i in range(2)
        ]
        outs = []
        for p in procs:
            try:
                out, err = p.communicate(timeout=420)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                raise
            assert p.returncode == 0, err[-3000:]
            outs.append(json.loads(out.strip().splitlines()[-1]))
        for rank, o in enumerate(outs):
            assert o["ok"], o
            assert o["process_count"] == 2
            assert o["mesh_size"] == 8
        # SPMD: both processes computed the SAME replicated losses
        assert outs[0]["losses"] == outs[1]["losses"], outs


class TestCurriculumDistributed:
    def test_vision_curriculum_composes_with_distributed(self, eight_devices,
                                                         tmp_path):
        """VERDICT r3 #5: curriculum world resampling + distributed=True in
        one run — the chunk hook re-places resampled worlds onto the carry's
        env-axis sharding. Short smoke on the 8-device CPU mesh."""
        from fpyv_tpu.apps.train import train_vision
        from fpyv_tpu.vision.camera import CameraRig

        rig = CameraRig(pitch_deg=35.0, rel_position=(0.1, 0.0, 0.0),
                        fov_deg=120.0, resolution=(32, 24))
        res = train_vision(
            num_envs=16, num_iterations=4, num_steps=4, seed=0,
            distributed=True, randomize_worlds=True, curriculum_iters=2,
            rig=rig, scan_chunk=2, num_minibatches=2, update_epochs=1,
            compute_dtype="f32", print_every=100)
        assert np.isfinite(res.mean_reward_last)
