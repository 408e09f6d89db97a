"""Models (MLP modules, terrain, CNN policy, binarization) + gym adapter +
long-horizon physics properties."""

import numpy as np
import jax
import jax.numpy as jnp

from fpyv_tpu.models import nn
from fpyv_tpu.models.policy import ActorCritic, PixelActorCritic
from fpyv_tpu.models.terrain import TerrainNet, terrain_heightmap


class TestNnModules:
    def test_linear_and_mlp_shapes(self):
        p = nn.mlp_init(jax.random.key(0), (2, 10, 10, 1))
        x = jnp.zeros((5, 2))
        y = nn.mlp_apply(p, x, activation=nn.sin)
        assert y.shape == (5, 1)

    def test_attention_matches_softmax_formula(self):
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.normal(size=(2, 4, 8)))
        k = jnp.asarray(rng.normal(size=(2, 6, 8)))
        v = jnp.asarray(rng.normal(size=(2, 6, 8)))
        out, w = nn.attention(q, k, v)
        # reference formula (nn.py:150-163)
        logits = np.einsum("bqd,bkd->bqk", np.asarray(q), np.asarray(k)) / np.sqrt(8)
        e = np.exp(logits - logits.max(-1, keepdims=True))
        ref_w = e / e.sum(-1, keepdims=True)
        np.testing.assert_allclose(np.asarray(w), ref_w, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(out), np.einsum("bqk,bkd->bqd", ref_w, np.asarray(v)),
            atol=1e-6)

    def test_binarize_ste(self):
        w = jnp.asarray([0.3, -0.7, 0.0])
        b = nn.binarize(w)
        np.testing.assert_array_equal(np.asarray(b), [1.0, -1.0, 1.0])
        # gradient passes straight through
        g = jax.grad(lambda w: jnp.sum(nn.binarize(w) * 2.0))(w)
        np.testing.assert_allclose(np.asarray(g), [2.0, 2.0, 2.0])


class TestTerrain:
    def test_heightmap_shapes_and_smoothness(self):
        xy, z = terrain_heightmap(jax.random.key(0), scale=5.0, resolution=40)
        assert xy.shape == (1600, 2) and z.shape == (1600,)
        assert np.isfinite(np.asarray(z)).all()
        grid = np.asarray(z).reshape(40, 40)
        # sin-MLP terrain is smooth: neighboring cells correlate
        dz = np.abs(np.diff(grid, axis=0))
        assert dz.mean() < np.asarray(z).std()

    def test_deterministic_per_key(self):
        _, z1 = terrain_heightmap(jax.random.key(7), resolution=16)
        _, z2 = terrain_heightmap(jax.random.key(7), resolution=16)
        np.testing.assert_array_equal(np.asarray(z1), np.asarray(z2))


class TestPolicies:
    def test_actor_critic_shapes(self):
        net = ActorCritic(action_dim=4)
        obs = jnp.zeros((7, 22))
        params = net.init(jax.random.key(0), obs)
        mean, log_std, value = net.apply(params, obs)
        assert mean.shape == (7, 4) and value.shape == (7,)
        assert log_std.shape == (4,)

    def test_pixel_actor_critic(self):
        net = PixelActorCritic(action_dim=4)
        px = jnp.zeros((5, 36, 48))
        pr = jnp.zeros((5, 7))
        params = net.init(jax.random.key(0), px, pr)
        mean, log_std, value = net.apply(params, px, pr)
        assert mean.shape == (5, 4) and value.shape == (5,)


class TestGymAdapter:
    def test_acro_classic_api(self):
        from fpyv_tpu.envs.acro import AcroEnv
        from fpyv_tpu.envs.gym_adapter import GymAdapter

        env = AcroEnv()
        world = env.default_world()
        g = GymAdapter(env, num_envs=8, seed=0, env_args=(world,))
        obs = g.reset()
        assert isinstance(obs, np.ndarray) and obs.shape == (8, env.obs_dim)
        a = np.zeros((8, 4), np.float32)
        a[:, 3] = -0.6
        for _ in range(5):
            obs, reward, done, info = g.step(a)
        assert reward.shape == (8,)
        assert isinstance(info["dist_to_target"], np.ndarray)

    def test_single_env(self):
        from fpyv_tpu.envs.rotate import RotateEnv
        from fpyv_tpu.envs.gym_adapter import GymAdapter

        g = GymAdapter(RotateEnv(), num_envs=1, seed=1)
        obs = g.reset()
        assert obs.shape == (3, 3, 2)
        obs, r, d, info = g.step(np.zeros(3, np.float32))
        assert np.isscalar(float(r))


class TestLongHorizonProperties:
    def test_attitude_stays_orthonormal_f32(self):
        """R must stay in SO(3) to ~1e-4 over 2000 f32 steps (the TPU
        precision pin regression guard)."""
        from fpyv_tpu.physics.drone import DroneParams, drone_reset, drone_step
        from fpyv_tpu.physics.world import empty_world

        params = DroneParams()  # rotmat mode
        world = empty_world(ground=True)
        state = drone_reset(params, jnp.asarray([0.0, 0.0, 500.0], jnp.float32),
                            jnp.zeros(3, jnp.float32), jnp.zeros(3, jnp.float32))
        action = jnp.asarray([0.6, -0.4, 0.3, -0.4], jnp.float32)

        def body(st, _):
            st, _o = drone_step(params, st, action, world)
            return st, None

        state, _ = jax.lax.scan(body, state, None, length=2000)
        R = np.asarray(state.att)
        err = np.abs(R @ R.T - np.eye(3)).max()
        assert err < 5e-4, f"orthonormality drift {err}"

    def test_quat_stays_normalized(self):
        from fpyv_tpu.physics.drone import DroneParams, drone_reset, drone_step
        from fpyv_tpu.physics.world import empty_world

        params = DroneParams(att_mode="quat")
        world = empty_world(ground=True)
        state = drone_reset(params, jnp.asarray([0.0, 0.0, 500.0], jnp.float32),
                            jnp.zeros(3, jnp.float32), jnp.zeros(3, jnp.float32))
        action = jnp.asarray([0.6, -0.4, 0.3, -0.4], jnp.float32)

        def body(st, _):
            st, _o = drone_step(params, st, action, world)
            return st, None

        state, _ = jax.lax.scan(body, state, None, length=2000)
        q = np.asarray(state.att)
        np.testing.assert_allclose(np.linalg.norm(q), 1.0, atol=1e-5)

    def test_terminal_velocity_under_drag(self):
        """Free fall reaches terminal velocity: drag balances gravity."""
        from fpyv_tpu.physics.drone import (
            AIR_DENSITY, DroneParams, drone_reset, drone_step)
        from fpyv_tpu.physics.world import empty_world

        params = DroneParams()
        world = empty_world(ground=False)
        world = world.replace(has_ground=jnp.asarray(False))
        state = drone_reset(params, jnp.asarray([0.0, 0.0, 1e5], jnp.float64),
                            jnp.zeros(3, jnp.float64), jnp.zeros(3, jnp.float64))
        action = jnp.asarray([0.0, 0.0, 0.0, -1.0], jnp.float64)

        def body(st, _):
            st, _o = drone_step(params, st, action, world)
            return st, st.vel[2]

        state, vz = jax.lax.scan(body, state, None, length=4000)
        vz = np.asarray(vz)
        # terminal: velocity stops changing
        assert abs(vz[-1] - vz[-50]) < 1e-3
        # analytic check: mg - min_thrust = 0.5 rho Cd A v^2 (z axis)
        thrust_min = params.thrust_curve.throttle_to_thrust(jnp.float64(-1.0))
        net = params.mass * params.gravity - float(thrust_min)
        cd, area = params.drag_coef[2], params.cross_sections[2]
        v_term = np.sqrt(2 * net / (AIR_DENSITY * cd * area))
        np.testing.assert_allclose(-vz[-1], v_term, rtol=0.05)
