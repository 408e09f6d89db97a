"""Pallas vision kernels: raycast render parity vs the XLA raycast, and the
in-kernel FPV guidance chase megaloop vs a host-composed XLA pilot.

All pallas calls run in interpret mode (CPU CI); the real-chip numbers are
recorded in BENCH.md.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fpyv_tpu.control.guidance import (
    GuidanceParams,
    guidance_init,
    needed_force_orientation,
)
from fpyv_tpu.control.pid import PidParams
from fpyv_tpu.envs.acro import AcroEnv
from fpyv_tpu.envs.vision_acro import default_vision_rig
from fpyv_tpu.ops.pallas_vision import (
    ChasePilot,
    pallas_render_depth,
    pallas_vision_env_rollout,
)
from fpyv_tpu.physics.drone import DroneParams, _att_to_rotmat, drone_step
from fpyv_tpu.physics.world import empty_world
from fpyv_tpu.vision.camera import CameraRig, camera_pose
from fpyv_tpu.vision.raycast import raycast_depth, render_depth_raycast

RIG = CameraRig(pitch_deg=35.0, rel_position=(0.1, 0.0, 0.0), fov_deg=120.0,
                resolution=(32, 24))


def _random_rotations(n, seed):
    """Random rotation matrices without scipy: normalize quaternions."""
    q = np.random.default_rng(seed).normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q.T
    return np.stack([
        np.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)], -1),
        np.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)], -1),
        np.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)], -1),
    ], axis=-2)


def _full_world(rng):
    w = empty_world(n_spheres=2, n_cylinders=3, n_gates=2, ground=True)
    return w.replace(
        sphere_center=jnp.asarray(rng.normal(size=(2, 3)) * 3 + np.array([0, 0, 4.0]), jnp.float32),
        sphere_radius=jnp.asarray([1.0, 0.7], jnp.float32),
        sphere_active=jnp.asarray([True, True]),
        cyl_center=jnp.asarray(rng.normal(size=(3, 3)) * 4, jnp.float32),
        cyl_radius=jnp.asarray([0.5, 0.8, 0.3], jnp.float32),
        cyl_height=jnp.asarray([5.0, 3.0, 8.0], jnp.float32),
        cyl_active=jnp.asarray([True, True, False]),
        gate_pos=jnp.asarray(rng.normal(size=(2, 3)) * 3 + np.array([0, 0, 2.0]), jnp.float32),
        gate_size=jnp.asarray([2.0, 1.5], jnp.float32),
        gate_active=jnp.asarray([True, True]),
        gate_shape=jnp.asarray([0, 1], jnp.int32),
    )


def _cams(n, seed=1):
    rng = np.random.default_rng(seed)
    cam_pos = jnp.asarray(rng.normal(size=(n, 3)) * 2 + np.array([0, 0, 3.0]), jnp.float32)
    cam_R = jnp.asarray(_random_rotations(n, seed + 1), jnp.float32)
    return cam_pos, cam_R


def _ref_levels(t_ref, max_depth):
    """The kernel's level encoding applied to reference t values."""
    return np.floor(255.0 * (1.0 - np.minimum(np.asarray(t_ref), max_depth)
                             / max_depth))


class TestRenderParity:
    @pytest.mark.parametrize("include", [
        ("spheres",), ("cylinders",), ("ground",), ("gates",),
        ("spheres", "cylinders", "ground", "gates"),
    ])
    def test_matches_xla_raycast(self, include):
        w = _full_world(np.random.default_rng(0))
        cam_pos, cam_R = _cams(16)
        t_ref = raycast_depth(RIG, cam_pos, cam_R, w, include=include)
        lev_ref = _ref_levels(t_ref, 10.0)
        out = np.asarray(pallas_render_depth(
            RIG, cam_pos, cam_R, w, max_depth=10.0, include=include,
            interpret=True)) * 255.0
        np.testing.assert_allclose(out, lev_ref, atol=1e-3)

    def test_uint8_renderer_equivalence(self):
        """levels*255 == the uint8 raycast image (same scene, same encode)."""
        w = _full_world(np.random.default_rng(2))
        cam_pos, cam_R = _cams(8, seed=5)
        u8 = np.asarray(render_depth_raycast(RIG, cam_pos, cam_R, w,
                                             max_depth=10.0)).astype(np.float64)
        out = np.asarray(pallas_render_depth(RIG, cam_pos, cam_R, w,
                                             max_depth=10.0,
                                             interpret=True)) * 255.0
        diff = np.abs(u8 - out)
        assert diff.max() <= 1.0 + 1e-3  # FMA boundary fuzz: at most 1 level
        assert (diff < 0.5).mean() > 0.99

    def test_batched_per_env_worlds(self):
        n = 16
        w = _full_world(np.random.default_rng(3))
        wb = jax.tree.map(lambda x: jnp.broadcast_to(x, (n,) + x.shape), w)
        wb = wb.replace(sphere_radius=jnp.linspace(0.3, 2.0, n)[:, None]
                        * jnp.ones((1, 2)))
        cam_pos, cam_R = _cams(n, seed=7)
        t_ref = raycast_depth(RIG, cam_pos, cam_R, wb)
        lev_ref = _ref_levels(t_ref, 10.0)
        out = np.asarray(pallas_render_depth(RIG, cam_pos, cam_R, wb,
                                             max_depth=10.0,
                                             interpret=True)) * 255.0
        np.testing.assert_allclose(out, lev_ref, atol=1e-3)

    def test_pads_non_multiple_of_8(self):
        w = _full_world(np.random.default_rng(4))
        cam_pos, cam_R = _cams(5, seed=9)
        out = pallas_render_depth(RIG, cam_pos, cam_R, w, max_depth=10.0,
                                  interpret=True)
        assert out.shape == (5, 24, 32)
        t_ref = raycast_depth(RIG, cam_pos, cam_R, w)
        np.testing.assert_allclose(np.asarray(out) * 255.0,
                                   _ref_levels(t_ref, 10.0), atol=1e-3)

    def test_single_camera(self):
        w = _full_world(np.random.default_rng(5))
        cam_pos, cam_R = _cams(1, seed=11)
        out = pallas_render_depth(RIG, cam_pos[0], cam_R[0], w,
                                  max_depth=10.0, interpret=True)
        assert out.shape == (24, 32)

    def test_ground_extent_clip(self):
        w = empty_world(ground=True)
        cam_R = jnp.asarray([[1.0, 0, 0], [0, -1.0, 0], [0, 0, -1.0]])
        cam_pos = jnp.asarray([100.0, 0.0, 3.0])  # outside a 50 m half-extent
        out = pallas_render_depth(RIG, cam_pos, cam_R, w, max_depth=10.0,
                                  include=("ground",), ground_extent=50.0,
                                  interpret=True)
        assert float(np.asarray(out).max()) == 0.0  # all clipped -> empty


class TestVisionEnvRenderer:
    def test_env_obs_level_exact_vs_raycast(self):
        """VisionAcroEnv(renderer='raycast_pallas') emits the same pixel
        observation as the XLA raycast path, batched worlds included."""
        from fpyv_tpu.envs.vision_acro import VisionAcroEnv

        env_a = VisionAcroEnv(renderer="raycast", target_only=False)
        env_b = VisionAcroEnv(renderer="raycast_pallas", target_only=False)
        worlds, bank = env_a.make_randomized_worlds(jax.random.key(0), 16)
        keys = jax.random.split(jax.random.key(1), 16)
        _, obs_a = env_a.reset_batched(keys, worlds, bank)
        _, obs_b = env_b.reset_batched(keys, worlds, bank)
        pa = np.asarray(obs_a["pixels"], np.float64)
        pb = np.asarray(obs_b["pixels"], np.float64)
        np.testing.assert_allclose(pb, pa, atol=1e-6)

    def test_step_batched_matches_vmapped_step(self):
        from fpyv_tpu.envs.vision_acro import VisionAcroEnv

        env = VisionAcroEnv(renderer="raycast", target_only=False)
        worlds, bank = env.make_randomized_worlds(jax.random.key(2), 8)
        keys = jax.random.split(jax.random.key(3), 8)
        st, _ = env.reset_batched(keys, worlds, bank)
        act = jnp.zeros((8, 4), jnp.float32)
        st_b, obs_b, r_b, d_b, _ = env.step_batched(st, act, worlds, bank)
        st_v, obs_v, r_v, d_v, _ = jax.vmap(
            lambda s, a, w: env.step(s, a, w, bank))(st, act, worlds)
        np.testing.assert_allclose(np.asarray(obs_b["pixels"]),
                                   np.asarray(obs_v["pixels"]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(r_b), np.asarray(r_v))


class _HostChase:
    """The kernel chase loop composed from the trusted XLA building blocks:
    raycast mask centroid -> needed_force_orientation -> drone_step with
    att/thrust override, with the same hover-scan fallback and PID freeze."""

    def __init__(self, env, rig, pilot, world):
        self.env, self.rig, self.pilot, self.world = env, rig, pilot, world
        params = env.params
        curve = params.thrust_curve
        self.g = GuidanceParams(
            virtual_drag_coef=pilot.virtual_drag_coef,
            virtual_lift_coef=pilot.virtual_lift_coef,
            tof_effective_distance=pilot.tof_effective_distance,
            keep_distance=pilot.keep_distance,
            uwb_max_range=pilot.uwb_max_range,
            pid=PidParams(
                kP=pilot.kP, kI=pilot.kI, kD=pilot.kD, dt=params.dt,
                integral_clip=pilot.integral_clip,
                min_output=float(curve.min_force),
                max_output=float(curve.max_force),
                derivative_transition_rate=pilot.derivative_transition_rate,
            ))

    def run(self, drone, n_steps):
        env, rig, pilot, world = self.env, self.rig, self.pilot, self.world
        params = env.params
        N = drone.pos.shape[0]
        W, H = rig.resolution
        gs = guidance_init((N,), jnp.float32)
        count0 = float(np.asarray(world.sphere_path_count)[0])
        scan_w = np.deg2rad(pilot.scan_rate_dps) * params.dt
        scan_s = pilot.scan_tilt * 9.81 * params.mass
        uu, vv = np.meshgrid(np.arange(W) + 0.5, np.arange(H) + 0.5)
        for i in range(n_steps):
            # target center at the pre-increment path count (pallas_env
            # sphere_centers; physics/world.py:178-199)
            res = max(float(np.asarray(world.sphere_path_res)[0]), 1.0)
            frac = (count0 + i) % res
            th = 2 * np.pi * frac / res
            if bool(np.asarray(world.sphere_has_path)[0]):
                pc = np.asarray(world.sphere_path_center)[0]
                pr = float(np.asarray(world.sphere_path_radius)[0])
                c = np.array([pc[0] + pr * np.cos(th),
                              pc[1] + pr * np.sin(th), pc[2]])
            else:
                c = np.asarray(world.sphere_center)[0]
            wi = world.replace(
                sphere_center=jnp.asarray([c], world.sphere_center.dtype))
            R = _att_to_rotmat(params, drone.att)
            cam_pos, cam_R = camera_pose(rig, drone.pos, R)
            t = raycast_depth(rig, cam_pos, cam_R, wi, include=("spheres",))
            mask = np.asarray(t) < 1e30
            cnt = mask.reshape(N, -1).sum(1)
            ucen = (mask * uu).reshape(N, -1).sum(1) / np.maximum(cnt, 1)
            vcen = (mask * vv).reshape(N, -1).sum(1) / np.maximum(cnt, 1)
            vis = jnp.asarray(cnt > 0)
            dist = jnp.linalg.norm(
                drone.pos - jnp.asarray(c, drone.pos.dtype), axis=-1
            ) - world.sphere_radius[0]
            gs2, R_des, fnorm = needed_force_orientation(
                self.g, gs, rig, cam_R,
                jnp.asarray(np.stack([ucen, vcen], -1), jnp.float32),
                drone.pos, drone.vel, dist.astype(jnp.float32), params.mass)
            theta = scan_w * i
            Fs = np.array([scan_s * np.cos(theta), scan_s * np.sin(theta),
                           9.81 * params.mass])
            gvec = np.array([0, 0, -9.81 * params.mass])
            y = np.cross(Fs, gvec)
            x = np.cross(y, Fs)
            Rs = np.stack([x / np.linalg.norm(x), y / np.linalg.norm(y),
                           Fs / np.linalg.norm(Fs)], axis=-1)
            R_use = jnp.where(vis[:, None, None], R_des,
                              jnp.asarray(Rs, jnp.float32))
            f_use = jnp.where(vis, fnorm, jnp.float32(np.linalg.norm(Fs)))
            gs = jax.tree.map(
                lambda new, old: jnp.where(
                    vis.reshape((N,) + (1,) * (new.ndim - 1)), new, old),
                gs2, gs)
            drone, _ = drone_step(params, drone,
                                  jnp.zeros((N, 4), jnp.float32), wi,
                                  att_override=R_use, thrust_override=f_use)
        return drone


class TestChase:
    def _setup(self, n=16, static_target=False):
        env = AcroEnv(params=DroneParams(att_mode="quat"))
        world = env.default_world()
        if static_target:
            world = world.replace(
                sphere_has_path=jnp.zeros_like(world.sphere_has_path),
                sphere_center=jnp.asarray([[0.0, 0.0, 8.0]],
                                          world.sphere_center.dtype))
        keys = jax.random.split(jax.random.key(0), n)
        state, _ = jax.vmap(lambda k: env.reset(k, world))(keys)
        return env, world, state

    def test_parity_vs_host_pilot(self):
        """Kernel trajectory == host-composed XLA pilot (before any reset).
        Reduced rig/K keep the exact-parity case in the fast suite
        (VERDICT r2 #4); the full-rig behavior runs under the slow marks."""
        env, world, state = self._setup(n=8)
        rig = CameraRig(pitch_deg=35.0, rel_position=(0.1, 0.0, 0.0),
                        fov_deg=120.0, resolution=(64, 48))
        st_k, _, _, _, _ = pallas_vision_env_rollout(
            env, state, world, 15, rig=rig, interpret=True)
        host = _HostChase(env, rig, ChasePilot(), world)
        drone = host.run(state.drone, 15)
        assert not bool(np.asarray(st_k.drone.done).any())
        np.testing.assert_allclose(np.asarray(st_k.drone.pos),
                                   np.asarray(drone.pos), atol=1e-4)
        np.testing.assert_allclose(np.asarray(st_k.drone.vel),
                                   np.asarray(drone.vel), atol=1e-3)
        qk, qh = np.asarray(st_k.drone.att), np.asarray(drone.att)
        qerr = np.minimum(np.abs(qk - qh).max(axis=-1),
                          np.abs(qk + qh).max(axis=-1))
        assert qerr.max() < 1e-3

    def test_follows_orbiting_target(self):
        """The flagship behavior: station-keeping at keep_distance on the
        default world's ORBITING target, zero crashes (the virtual
        ground-effect lift prevents ground strikes)."""
        env, world, state = self._setup()
        rig = default_vision_rig()
        st, w2, _, crashes, _ = pallas_vision_env_rollout(
            env, state, world, 100, rig=rig, interpret=True)
        st, _, _, crashes2, _ = pallas_vision_env_rollout(
            env, st, w2, 200, rig=rig, seed=1, interpret=True)
        d = np.asarray(st.prev_dist)
        assert float(np.abs(d - 6.0).mean()) < 1.5  # keep_distance = 6
        assert float(np.asarray(crashes2).mean()) == 0.0

    def test_intercepts_with_zero_keep_distance(self):
        """keep_distance=0 turns the follower into an interceptor: contact
        events (crash inside the target shell) accumulate, with no ground
        crashes."""
        env, world, state = self._setup(static_target=True)
        rig = default_vision_rig()
        st, _, _, crashes, contacts = pallas_vision_env_rollout(
            env, state, world, 300, rig=rig,
            pilot=ChasePilot(keep_distance=0.0), interpret=True)
        contacts = np.asarray(contacts)
        crashes = np.asarray(crashes)
        assert contacts.mean() > 0.5  # intercepts most envs within 300 steps
        assert (crashes - contacts).sum() == 0  # every crash IS a contact
