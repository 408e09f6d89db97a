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


@pytest.mark.slow
class TestDcnTwoProcess:
    def test_hybrid_mesh_two_process_ppo(self, tmp_path):
        """VERDICT #6: make_hybrid_mesh's multi-process (DCN) branch actually
        executes — 2 coordinated processes x 4 virtual CPU devices each run
        one distributed PPO iteration over the global 8-device mesh
        (multi-controller SPMD; gRPC stands in for DCN)."""
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
                 str(i), "2", coord],
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
