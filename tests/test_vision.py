"""Vision parity: jax scatter-min depth renderer vs the oracle's Python
z-buffer, icosphere mesh properties, world generator quirks."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fpyv_tpu.config import FpyvConfig
from fpyv_tpu.ops import rotations as rot
from fpyv_tpu.vision.camera import CameraRig, camera_pose, pixel_to_direction
from fpyv_tpu.vision.renderer import (
    render_depth_image,
    target_pixel_centroid,
)
from fpyv_tpu.world.generators import (
    WorldSpec,
    CylinderSpec,
    GateSpec,
    TargetSpec,
    build_world,
    generate_track,
)
from fpyv_tpu.world.icosphere import icosphere
from fpyv_tpu.world.render_bank import bank_subset, build_render_bank
from tools.oracle.sim import OracleCamera, euler_to_R


def small_rig():
    return CameraRig(pitch_deg=35.0, rel_position=(0.1, 0.0, 0.0),
                     fov_deg=120.0, resolution=(160, 120))


def make_spec(with_moving_target=False):
    """Deterministic small world: 1 target, 1 cylinder, 1 gate, grid ground."""
    path = {"radius": 6.0, "resolution": 100} if with_moving_target else None
    return WorldSpec(
        targets=[TargetSpec(position=np.array([4.0, 0.0, 2.0]), radius=0.8,
                            nu=3, path=path)],
        cylinders=[CylinderSpec(position=np.array([2.0, 3.0, 0.0]), radius=1.0,
                                height=5.0, angle_resolution=10,
                                height_resolution=12, random=False)],
        gates=[GateSpec(position=np.array([6.0, -2.0, 1.0]), rotmat=np.eye(3),
                        size=2.0, shape="rectangle", resolution=17)],
        ground={"size": 20, "resolution": 15, "random": False},
    )


def oracle_point_sets(spec, bank):
    """The oracle's per-object point lists, identical to the bank contents."""
    sets = []
    start = 0
    pts = bank.base_points
    for oid in range(bank.num_objects):
        n = int((bank.point_obj == oid).sum())
        chunk = pts[start:start + n].copy()
        if bank.obj_is_sphere[oid]:
            chunk = chunk + spec.targets[bank.obj_sphere_idx[oid]].position
        sets.append(chunk)
        start += n
    return sets


class TestIcosphere:
    @pytest.mark.parametrize("nu", [1, 2, 3, 5])
    def test_counts_and_unit_norm(self, nu):
        v, f = icosphere(nu)
        assert v.shape == (10 * nu * nu + 2, 3)
        assert f.shape == (20 * nu * nu, 3)
        np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, atol=1e-12)

    def test_faces_index_valid_and_cover(self, nu=3):
        v, f = icosphere(nu)
        assert f.min() == 0 and f.max() == len(v) - 1
        assert set(f.reshape(-1).tolist()) == set(range(len(v)))


class TestDepthRenderParity:
    @pytest.mark.parametrize("yaw_deg", [0.0, 40.0, 180.0])
    def test_matches_oracle(self, yaw_deg):
        cfg = FpyvConfig()
        spec = make_spec()
        bank = build_render_bank(spec)
        world = build_world(spec, dtype=jnp.float64)
        rig = small_rig()

        drone_pos = np.array([0.0, 0.0, 1.5])
        drone_R = euler_to_R(0.0, 0.1, np.deg2rad(yaw_deg))

        ocam = OracleCamera(35.0, (0.1, 0.0, 0.0), 120.0, (160, 120))
        ocam.update(drone_pos, drone_R)
        ref = ocam.render_depth_image(oracle_point_sets(spec, bank),
                                      max_depth=15.0)

        cam_pos, cam_R = camera_pose(rig, jnp.asarray(drone_pos),
                                     jnp.asarray(drone_R))
        img = np.asarray(render_depth_image(rig, cam_pos, cam_R, bank,
                                            world=world, max_depth=15.0))
        assert img.shape == ref.shape
        mismatch = (img != ref).sum()
        assert mismatch <= img.size * 1e-3, (
            f"{mismatch}/{img.size} pixels differ (yaw={yaw_deg})")
        # the scene must actually be visible in at least one orientation
        if yaw_deg == 0.0:
            assert (ref > 0).sum() > 50

    def test_moving_target_tracks_world(self):
        from fpyv_tpu.physics.world import update_targets

        spec = make_spec(with_moving_target=True)
        bank = build_render_bank(spec)
        world = build_world(spec, dtype=jnp.float64)
        rig = small_rig()
        drone_pos = jnp.asarray([0.0, 0.0, 2.0])
        drone_R = jnp.eye(3, dtype=jnp.float64)
        cam_pos, cam_R = camera_pose(rig, drone_pos, drone_R)

        target_bank = bank_subset(bank, [0])
        img0 = np.asarray(render_depth_image(rig, cam_pos, cam_R, target_bank,
                                             world=world, max_depth=25.0))
        w2 = world
        for _ in range(30):
            w2 = update_targets(w2)
        img1 = np.asarray(render_depth_image(rig, cam_pos, cam_R, target_bank,
                                             world=w2, max_depth=25.0))
        assert not np.array_equal(img0, img1), "moving target must move in image"

    def test_batched_rendering(self):
        spec = make_spec()
        bank = build_render_bank(spec)
        world = build_world(spec, dtype=jnp.float64)
        rig = small_rig()
        N = 4
        pos = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (N, 3))
                          + np.array([0, 0, 2.0]))
        R = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float64), (N, 3, 3))
        cam_pos, cam_R = jax.vmap(lambda p, r: camera_pose(rig, p, r))(pos, R)
        imgs = render_depth_image(rig, cam_pos, cam_R, bank, world=world,
                                  max_depth=15.0)
        assert imgs.shape == (N, 120, 160)


class TestPixelDirection:
    def test_matches_oracle(self):
        rig = small_rig()
        drone_pos = np.array([1.0, -2.0, 3.0])
        drone_R = euler_to_R(0.2, -0.1, 0.5)
        ocam = OracleCamera(35.0, (0.1, 0.0, 0.0), 120.0, (160, 120))
        ocam.update(drone_pos, drone_R)
        cam_pos, cam_R = camera_pose(rig, jnp.asarray(drone_pos),
                                     jnp.asarray(drone_R))
        for px in [(80.0, 60.0), (0.0, 0.0), (159.0, 119.0)]:
            ref = ocam.pixel2direction(np.asarray(px))
            got = np.asarray(pixel_to_direction(rig, cam_R, jnp.asarray(px)))
            np.testing.assert_allclose(got, ref, atol=1e-12)

    def test_camera_pose_matches_oracle(self):
        rig = small_rig()
        drone_pos = np.array([1.0, -2.0, 3.0])
        drone_R = euler_to_R(0.2, -0.1, 0.5)
        ocam = OracleCamera(35.0, (0.1, 0.0, 0.0), 120.0, (160, 120))
        ocam.update(drone_pos, drone_R)
        cam_pos, cam_R = camera_pose(rig, jnp.asarray(drone_pos),
                                     jnp.asarray(drone_R))
        np.testing.assert_allclose(np.asarray(cam_pos), ocam.position, atol=1e-12)
        np.testing.assert_allclose(np.asarray(cam_R), ocam.R, atol=1e-12)


class TestCentroid:
    def test_centroid_of_rendered_target(self):
        spec = make_spec()
        bank = build_render_bank(spec)
        world = build_world(spec, dtype=jnp.float64)
        rig = small_rig()
        cam_pos, cam_R = camera_pose(rig, jnp.asarray([0.0, 0.0, 2.0]),
                                     jnp.eye(3, dtype=jnp.float64))
        target_bank = bank_subset(bank, [0])
        img = render_depth_image(rig, cam_pos, cam_R, target_bank, world=world,
                                 max_depth=25.0)
        centroid, found = target_pixel_centroid(img)
        assert bool(found)
        ref = np.array(np.where(np.asarray(img) > 0)).mean(1)[::-1]
        np.testing.assert_allclose(np.asarray(centroid), ref, atol=1e-6)


class TestGeneratorQuirks:
    def test_track_position_and_size_quirks(self):
        gates = generate_track(count=6, radius=12.0, gate_size=5.0,
                               gate_resolution=17)
        theta = np.linspace(0, 2 * np.pi, 7)[:-1]
        # x uses gate_size (quirk), y uses radius
        np.testing.assert_allclose(
            [g.position[0] for g in gates[0:1]], [np.cos(theta[0]) * 5.0])
        np.testing.assert_allclose(gates[1].position[1], np.sin(theta[1]) * 12.0)
        # shapes cycle rect/circle/half; circle raised by size/2 with size/2
        assert gates[0].shape == "rectangle" and gates[0].size == 17.0  # quirk
        assert gates[1].shape == "circle" and gates[1].size == 2.5
        np.testing.assert_allclose(gates[1].position[2], 2.5)
        assert gates[2].shape == "half_circle" and gates[2].size == 17.0


class TestVisionEnv:
    def test_vision_env_step(self):
        from fpyv_tpu.envs.vision_acro import VisionAcroEnv

        env = VisionAcroEnv()
        world, bank = env.make_world(seed=1)
        keys = jax.random.split(jax.random.key(0), 4)
        state, obs = jax.jit(
            jax.vmap(lambda k: env.reset(k, world, bank)))(keys)
        assert obs["pixels"].shape == (4, 72, 96)
        a = jnp.zeros((4, 4)).at[:, 3].set(-0.6)
        state, obs, r, d, info = jax.jit(jax.vmap(
            lambda s, aa: env.step(s, aa, world, bank)))(state, a)
        assert np.isfinite(np.asarray(r)).all()
        assert info["target_pixel"].shape == (4, 2)
        # the default world has visible geometry from spawn heights
        assert any((np.asarray(obs["pixels"][i]) > 0).sum() > 0 for i in range(4))


class TestBatchedWorldRendering:
    def test_per_env_worlds_move_targets_independently(self):
        """World fields with leading env dims: each env's target renders at
        its own position (regression: object offsets used to gather along
        the env axis)."""
        spec = make_spec()
        bank = build_render_bank(spec)
        world = build_world(spec, dtype=jnp.float64)
        rig = small_rig()
        N = 3
        # batch the world: env i's target shifted by i meters in y
        shift = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 1.5, 0.0], [0.0, -1.5, 0.0]])
        bworld = world.replace(
            sphere_center=world.sphere_center[None] + shift[:, None, :])
        drone_pos = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 2.0]), (N, 3))
        drone_R = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float64), (N, 3, 3))
        cam_pos, cam_R = jax.vmap(lambda p, r: camera_pose(rig, p, r))(
            drone_pos, drone_R)
        target_bank = bank_subset(bank, [0])
        imgs = np.asarray(render_depth_image(rig, cam_pos, cam_R, target_bank,
                                             world=bworld, max_depth=25.0))
        # all three see the target, at different horizontal positions
        cents = []
        for i in range(N):
            ys, xs = np.nonzero(imgs[i])
            assert len(xs) > 0, f"env {i} lost the target"
            cents.append(xs.mean())
        assert not np.isclose(cents[0], cents[1], atol=2.0)
        assert not np.isclose(cents[0], cents[2], atol=2.0)
        # and each per-env image equals the unbatched render of that world
        for i in range(N):
            wi = world.replace(
                sphere_center=world.sphere_center + shift[i])
            ref = np.asarray(render_depth_image(
                rig, cam_pos[i], cam_R[i], target_bank, world=wi,
                max_depth=25.0))
            np.testing.assert_array_equal(imgs[i], ref)


class TestDynamicBank:
    """Per-env randomized worlds from ONE unit-geometry bank: the World
    supplies every transform (position/scale/rotation) at render time."""

    def _env_params(self):
        # two envs with deliberately different worlds
        return [
            dict(sphere=([4.0, 0.0, 2.0], 0.8),
                 cyl=([2.0, 3.0, 0.0], 1.0, 5.0),
                 gate=([6.0, -2.0, 1.0], 0.3, 2.0)),
            dict(sphere=([3.0, 1.0, 2.5], 1.3),
                 cyl=([1.0, -2.0, 0.0], 2.0, 8.0),
                 gate=([5.0, 2.0, 1.5], -0.5, 3.0)),
        ]

    def _spec_for(self, p):
        from fpyv_tpu.world.generators import euler_z

        return WorldSpec(
            targets=[TargetSpec(position=np.asarray(p["sphere"][0]),
                                radius=p["sphere"][1], nu=2, path=None)],
            cylinders=[CylinderSpec(position=np.asarray(p["cyl"][0]),
                                    radius=p["cyl"][1], height=p["cyl"][2],
                                    angle_resolution=10, height_resolution=10,
                                    random=False)],
            gates=[GateSpec(position=np.asarray(p["gate"][0]),
                            rotmat=euler_z(p["gate"][1]), size=p["gate"][2],
                            shape="rectangle", resolution=17)],
            ground=None,
        )

    def test_dynamic_bank_matches_static_bake(self):
        """Batched dynamic render row i == static per-env bank render i."""
        from fpyv_tpu.world.render_bank import build_dynamic_render_bank

        params = self._env_params()
        worlds = [build_world(self._spec_for(p), dtype=jnp.float64)
                  for p in params]
        bworld = jax.tree.map(lambda *x: jnp.stack(x), *worlds)
        dyn_bank = build_dynamic_render_bank(
            n_spheres=1, n_cylinders=1, n_gates=1,
            gate_shapes=("rectangle",))

        rig = small_rig()
        N = len(params)
        drone_pos = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 2.0]), (N, 3))
        drone_R = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float64), (N, 3, 3))
        cam_pos, cam_R = jax.vmap(lambda p, r: camera_pose(rig, p, r))(
            drone_pos, drone_R)
        imgs = np.asarray(render_depth_image(rig, cam_pos, cam_R, dyn_bank,
                                             world=bworld, max_depth=25.0))
        for i, p in enumerate(params):
            static_bank = build_render_bank(self._spec_for(p))
            ref = np.asarray(render_depth_image(
                rig, cam_pos[i], cam_R[i], static_bank, world=worlds[i],
                max_depth=25.0))
            assert (ref > 0).sum() > 20, f"env {i} scene not visible"
            mismatch = (imgs[i] != ref).sum()
            # unit-scale geometry matches the static bake to float rounding;
            # allow a handful of boundary pixels to flip
            assert mismatch <= ref.size * 1e-3, (
                f"env {i}: {mismatch}/{ref.size} pixels differ")

    def test_dynamic_bank_under_vmap(self):
        """vmap over (pose, world) — the trainer's layout — agrees with the
        broadcast path."""
        from fpyv_tpu.world.render_bank import build_dynamic_render_bank

        params = self._env_params()
        worlds = [build_world(self._spec_for(p), dtype=jnp.float64)
                  for p in params]
        bworld = jax.tree.map(lambda *x: jnp.stack(x), *worlds)
        dyn_bank = build_dynamic_render_bank(
            n_spheres=1, n_cylinders=1, n_gates=1, gate_shapes=("rectangle",))
        rig = small_rig()
        N = len(params)
        drone_pos = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 2.0]), (N, 3))
        drone_R = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float64), (N, 3, 3))
        cam_pos, cam_R = jax.vmap(lambda p, r: camera_pose(rig, p, r))(
            drone_pos, drone_R)
        broadcast = np.asarray(render_depth_image(
            rig, cam_pos, cam_R, dyn_bank, world=bworld, max_depth=25.0))
        vmapped = np.asarray(jax.vmap(
            lambda cp, cr, w: render_depth_image(
                rig, cp, cr, dyn_bank, world=w, max_depth=25.0))(
                    cam_pos, cam_R, bworld))
        np.testing.assert_array_equal(broadcast, vmapped)

    def test_randomized_vision_env(self):
        """VisionAcroEnv end to end on per-env randomized worlds."""
        from fpyv_tpu.envs.vision_acro import VisionAcroEnv

        env = VisionAcroEnv()
        N = 4
        worlds, bank = env.make_randomized_worlds(jax.random.key(3), N)
        keys = jax.random.split(jax.random.key(0), N)
        state, obs = jax.vmap(lambda k, w: env.reset(k, w, bank))(keys, worlds)
        assert obs["pixels"].shape == (N, 72, 96)
        a = jnp.zeros((N, 4)).at[:, 3].set(-0.6)
        state, obs, r, d, info = jax.vmap(
            lambda s, aa, w: env.step(s, aa, w, bank))(state, a, worlds)
        assert np.isfinite(np.asarray(r)).all()
        # per-env worlds: at least two envs should see different images
        imgs = np.asarray(obs["pixels"])
        assert any(not np.array_equal(imgs[0], imgs[i]) for i in range(1, N))
