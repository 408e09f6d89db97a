"""Geometry algorithms + evolutionary search + aux utils tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fpyv_tpu.rl.es import monte_carlo_search
from fpyv_tpu.vision.geometry import (
    eight_point,
    epipolar_residual,
    icp_2d,
    random_points_on_sphere,
    triangulate,
    trilaterate_gauss_newton,
    trilaterate_gd,
)


def _projective_pair(seed=0, n=30):
    rng = np.random.default_rng(seed)
    K = np.array([[400.0, 0, 320], [0, 400.0, 240], [0, 0, 1]])
    theta = 0.1
    R = np.array([[np.cos(theta), 0, np.sin(theta)], [0, 1, 0],
                  [-np.sin(theta), 0, np.cos(theta)]])
    t = np.array([1.0, 0.2, 0.1])
    X = rng.uniform(-2, 2, (n, 3)) + np.array([0, 0, 8.0])
    P1 = K @ np.hstack([np.eye(3), np.zeros((3, 1))])
    P2 = K @ np.hstack([R, t[:, None]])

    def proj(P, X):
        h = (P @ np.hstack([X, np.ones((len(X), 1))]).T).T
        return h[:, :2] / h[:, 2:3]

    return P1, P2, proj(P1, X), proj(P2, X), X


class TestEightPoint:
    def test_epipolar_constraint_satisfied(self):
        _, _, p1, p2, _ = _projective_pair()
        F = eight_point(jnp.asarray(p1), jnp.asarray(p2))
        res = np.asarray(epipolar_residual(F, jnp.asarray(p1), jnp.asarray(p2)))
        assert res.max() < 1e-8
        # rank-2
        s = np.linalg.svd(np.asarray(F), compute_uv=False)
        assert s[2] < 1e-10

    def test_triangulation_recovers_points(self):
        P1, P2, p1, p2, X = _projective_pair()
        Xr = np.asarray(triangulate(jnp.asarray(P1), jnp.asarray(P2),
                                    jnp.asarray(p1), jnp.asarray(p2)))
        np.testing.assert_allclose(Xr, X, atol=1e-6)


class TestTrilateration:
    @pytest.mark.parametrize("dim", [2, 3])
    def test_gauss_newton_exact(self, dim):
        rng = np.random.default_rng(1)
        anchors = rng.normal(size=(6, dim)) * 5
        target = rng.normal(size=dim)
        ranges = np.linalg.norm(anchors - target, axis=1)
        x = np.asarray(trilaterate_gauss_newton(anchors, ranges))
        np.testing.assert_allclose(x, target, atol=1e-8)

    def test_gd_converges(self):
        rng = np.random.default_rng(2)
        anchors = rng.normal(size=(5, 3)) * 5
        target = rng.normal(size=3)
        ranges = np.linalg.norm(anchors - target, axis=1)
        x = np.asarray(trilaterate_gd(anchors, ranges, learning_rate=1e-2,
                                      iterations=5000))
        np.testing.assert_allclose(x, target, atol=1e-6)

    def test_noisy_ranges_near_truth(self):
        rng = np.random.default_rng(3)
        anchors = rng.normal(size=(8, 3)) * 5
        target = rng.normal(size=3)
        ranges = np.linalg.norm(anchors - target, axis=1) + rng.normal(
            0, 0.01, 8)
        x = np.asarray(trilaterate_gauss_newton(anchors, ranges))
        assert np.linalg.norm(x - target) < 0.1


class TestIcp:
    def test_small_transform_recovered(self):
        """ICP converges for minor transforms (the reference's own caveat,
        icp_test01.py:21-23)."""
        rng = np.random.default_rng(4)
        src = rng.uniform(-1, 1, (80, 2))
        theta = 0.12
        R = np.array([[np.cos(theta), -np.sin(theta)],
                      [np.sin(theta), np.cos(theta)]])
        t = np.array([0.1, -0.05])
        dst = src @ R.T + t
        R2, t2, rmse = icp_2d(jnp.asarray(src), jnp.asarray(dst), 40)
        assert float(rmse) < 1e-3
        np.testing.assert_allclose(np.asarray(R2), R, atol=1e-2)
        np.testing.assert_allclose(np.asarray(t2), t, atol=1e-2)


class TestSphereSampling:
    def test_unit_norm_and_coverage(self):
        p = np.asarray(random_points_on_sphere(jax.random.key(0), 2000, 3,
                                               jnp.float64))
        np.testing.assert_allclose(np.linalg.norm(p, axis=1), 1.0, atol=1e-12)
        assert np.abs(p.mean(axis=0)).max() < 0.1  # roughly uniform


class TestEvolutionarySearch:
    def test_quadratic_bowl(self):
        c = jnp.asarray([1.0, -2.0, 0.5])
        x, s = monte_carlo_search(
            jax.random.key(0), jnp.zeros(3),
            lambda x: -jnp.sum((x - c) ** 2),
            n_offspring=32, n_iterations=200, noise_std=0.3, temperature=0.1)
        assert float(jnp.linalg.norm(x - c)) < 0.05

    def test_minimize_mode(self):
        x, s = monte_carlo_search(
            jax.random.key(1), jnp.asarray([3.0]),
            lambda x: jnp.sum(x**2),
            n_offspring=16, n_iterations=150, noise_std=0.5,
            temperature=0.1, maximize=False)
        assert abs(float(x[0])) < 0.1


class TestCheckpointing:
    def test_round_trip(self, tmp_path):
        from fpyv_tpu.utils.checkpoint import (
            latest_step, restore_checkpoint, save_checkpoint)

        state = {"params": {"w": jnp.arange(6.0).reshape(2, 3)},
                 "step": jnp.asarray(7)}
        save_checkpoint(tmp_path, 3, state)
        save_checkpoint(tmp_path, 10, state)
        assert latest_step(tmp_path) == 10
        restored = restore_checkpoint(tmp_path)
        np.testing.assert_allclose(np.asarray(restored["params"]["w"]),
                                   np.arange(6.0).reshape(2, 3))


class TestSimulatorApp:
    def test_headless_run(self):
        from fpyv_tpu.apps.simulator import run_simulator

        out = run_simulator(steps=60, render="none", guided=True, seed=0)
        assert out["steps"] >= 1
        assert np.isfinite(out["final_position"]).all()

    def test_unguided_run(self):
        from fpyv_tpu.apps.simulator import run_simulator

        out = run_simulator(steps=30, render="none", guided=False, seed=1)
        assert np.isfinite(out["final_position"]).all()


class TestMultiRaceEnv:
    def test_race_rollout(self):
        from fpyv_tpu.envs.multi_race import MultiRaceEnv

        env = MultiRaceEnv(n_agents=3)
        world = env.default_world()
        keys = jax.random.split(jax.random.key(0), 4)
        state, obs = jax.vmap(lambda k: env.reset(k, world))(keys)
        assert obs.shape == (4, 3, env.obs_dim)
        act = jnp.zeros((4, 3, 4)).at[..., 3].set(-0.64)

        def body(st, _):
            st, obs, r, d, info = jax.vmap(
                lambda s, a: env.step(s, a, world))(st, act)
            return st, (r, d)

        state, (r, d) = jax.lax.scan(body, state, None, length=50)
        assert np.isfinite(np.asarray(r)).all()

    def test_gate_passing_detection(self):
        """Fly an agent straight through gate 0: passing must register."""
        from fpyv_tpu.envs.multi_race import MultiRaceEnv
        from fpyv_tpu.envs.base import tree_where

        env = MultiRaceEnv(n_agents=2, max_episode_steps=10_000)
        world = env.default_world()
        state, obs = env.reset(jax.random.key(3), world)
        # place agent 0 just behind gate 0's plane, moving through it
        gate_p = np.asarray(world.gate_pos[0])
        normal = np.asarray(world.gate_rotmat[0])[:, 0]
        pos = state.drones.pos
        pos = pos.at[0].set(jnp.asarray(gate_p - 0.5 * normal))
        vel = state.drones.vel.at[0].set(jnp.asarray(normal * 5.0))
        state = state.replace(
            drones=state.drones.replace(pos=pos, vel=vel),
            prev_gate_dist=state.prev_gate_dist.at[0].set(-0.5))
        act = jnp.zeros((2, 4)).at[:, 3].set(-0.64)
        passed_total = 0
        for _ in range(20):
            state, obs, r, d, info = env.step(state, act, world)
            passed_total = max(passed_total, int(np.asarray(
                info["gates_passed"][0])))
        assert passed_total >= 1, "agent crossing the gate plane must register"


class TestPolicyEs:
    def test_converges_on_pytree_quadratic(self):
        """policy_es drives a param PYTREE to the optimum of a known
        objective — validates the antithetic NES estimator end to end."""
        import jax.numpy as jnp
        from fpyv_tpu.rl.es import policy_es

        params = {"w": jnp.zeros(5), "b": jnp.zeros(2)}
        t_w = jnp.asarray([1.0, -2.0, 0.5, 3.0, -1.0])
        t_b = jnp.asarray([0.3, -0.7])

        def fitness(p, key):
            return (-jnp.sum((p["w"] - t_w) ** 2)
                    - jnp.sum((p["b"] - t_b) ** 2))

        trained, hist = jax.jit(lambda k, p: policy_es(
            k, p, fitness, n_perturbations=16, n_iterations=300,
            noise_std=0.3, learning_rate=0.3))(jax.random.key(0), params)
        assert hist.shape == (300,)
        assert float(fitness(trained, None)) > -0.05
        np.testing.assert_allclose(np.asarray(trained["w"]), np.asarray(t_w),
                                   atol=0.15)

    def test_policy_rollout_fitness_improves(self):
        """ES on a tiny MLP + rotate-env rollout fitness: the generation-best
        fitness trend must improve (full learning demos run on TPU; this
        keeps CI light)."""
        import jax.numpy as jnp
        from fpyv_tpu.envs.rotate import RotateEnv
        from fpyv_tpu.models.policy import ActorCritic
        from fpyv_tpu.rl.es import policy_es

        env = RotateEnv()
        net = ActorCritic(action_dim=3, hidden=(16,))
        _, obs0 = env.reset(jax.random.key(0))
        params = net.init(jax.random.key(1), obs0.reshape(1, -1))

        def fitness(p, key):
            keys = jax.random.split(key, 8)
            state, obs = jax.vmap(env.reset)(keys)

            def body(carry, _):
                state, obs = carry
                mean, _, _ = net.apply(p, obs.reshape(obs.shape[0], -1))
                action = jnp.tanh(mean)
                state, obs, r, d, _ = jax.vmap(env.step)(state, action)
                return (state, obs), r

            _, rs = jax.lax.scan(body, (state, obs), None, length=20)
            return rs.mean()

        trained, hist = jax.jit(lambda k, p: policy_es(
            k, p, fitness, n_perturbations=16, n_iterations=30,
            noise_std=0.3, learning_rate=0.1))(jax.random.key(2), params)
        hist = np.asarray(hist)
        assert np.isfinite(hist).all()
        # generation-best fitness trend improves over the run
        assert hist[-10:].mean() > hist[:10].mean(), hist

    def test_mesh_sharded_population_matches_unsharded(self, eight_devices):
        """ES with the population sharded over an 8-device mesh computes the
        SAME result as the unsharded run (layout independence — the sharding
        is pure DP over candidates, rl/es.py make_policy_es)."""
        import jax.numpy as jnp
        from fpyv_tpu.parallel.mesh import make_mesh
        from fpyv_tpu.rl.es import policy_es

        params = {"w": jnp.zeros(7)}
        t_w = jnp.asarray([1.0, -2.0, 0.5, 3.0, -1.0, 0.2, -0.8])

        def fitness(p, key):
            return -jnp.sum((p["w"] - t_w) ** 2)

        kwargs = dict(n_perturbations=16, n_iterations=50, noise_std=0.3,
                      learning_rate=0.3, sigma_decay=0.99)
        ref, ref_hist = jax.jit(lambda k, p: policy_es(
            k, p, fitness, **kwargs))(jax.random.key(3), params)
        mesh = make_mesh()
        assert mesh.size == 8
        out, out_hist = jax.jit(lambda k, p: policy_es(
            k, p, fitness, mesh=mesh, **kwargs))(jax.random.key(3), params)
        np.testing.assert_allclose(np.asarray(out["w"]),
                                   np.asarray(ref["w"]), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(out_hist),
                                   np.asarray(ref_hist), rtol=1e-6)

    def test_sigma_decay_anneals_on_stagnation(self):
        """With a constant fitness landscape nothing ever improves after the
        first generation, so sigma must decay toward sigma_min."""
        import jax.numpy as jnp
        from fpyv_tpu.rl.es import make_policy_es

        init_state, run_chunk, _ = make_policy_es(
            {"w": jnp.zeros(3)}, lambda p, k: jnp.asarray(0.0),
            n_perturbations=4, noise_std=0.5, sigma_decay=0.5,
            sigma_min=1e-3)
        state, _ = jax.jit(run_chunk)(init_state(),
                                      jax.random.split(jax.random.key(0), 20))
        sigma = float(state[1])
        assert sigma == pytest.approx(1e-3), sigma


class TestTrainEs:
    def test_train_es_rotate_smoke(self):
        """The ES trainer app runs end to end (chunked host loop, logging,
        throughput meter) and reports finite fitness."""
        from fpyv_tpu.apps.train import train_es

        res = train_es(env_name="rotate", num_envs=8, num_iterations=10,
                       num_steps=20, n_perturbations=8, noise_std=0.3,
                       learning_rate=0.1, scan_chunk=5, print_every=100)
        assert res.iterations == 10
        assert np.isfinite(res.mean_reward_first)
        assert np.isfinite(res.mean_reward_last)

    def test_train_es_acro_distributed_smoke(self, eight_devices):
        """--algo es --distributed: the acro fitness rollout with the
        population sharded over the 8-device mesh."""
        from fpyv_tpu.apps.train import train_es

        res = train_es(env_name="acro", num_envs=4, num_iterations=4,
                       num_steps=8, n_perturbations=8, distributed=True,
                       scan_chunk=2, print_every=100)
        assert np.isfinite(res.mean_reward_last)
