"""Vision-based acro env: depth-image pixel observations for RL.

BASELINE config #4: "camera-projection pixel observations (gate/track
markers) for vision-based RL". Wraps :class:`fpyv_tpu.envs.acro.AcroEnv`
with the FPV camera rig rendering inside the jitted step — the analog of
the reference's dim==2 loop (simulator.py:115-168: render_depth_image of
the world + the chased target, HUD aside).

The default rig renders at reduced resolution (96x72): the reference's
640x480 is a display choice, not an RL requirement, and scatter cost is
per-point while image memory is per-pixel — at 4096 envs a full-res uint8
frame bank alone is 1.2 GB/step. FOV/pitch/mount match params.yaml so the
geometry is identical.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from fpyv_tpu.envs.acro import AcroEnv, AcroState
from fpyv_tpu.physics.drone import DroneParams
from fpyv_tpu.physics.world import World
from fpyv_tpu.vision.camera import CameraRig, camera_pose
from fpyv_tpu.vision.renderer import render_depth_image, target_pixel_centroid
from fpyv_tpu.world.generators import WorldSpec, build_world
from fpyv_tpu.world.render_bank import (
    RenderBank,
    bank_subset,
    build_dynamic_render_bank,
    build_render_bank,
)


def default_vision_rig() -> CameraRig:
    return CameraRig(pitch_deg=35.0, rel_position=(0.1, 0.0, 0.0),
                     fov_deg=120.0, resolution=(96, 72))


@dataclass(frozen=True)
class VisionAcroEnv:
    """Acro env whose observation is {pixels, imu} instead of ground truth."""

    acro: AcroEnv = field(default_factory=AcroEnv)
    rig: CameraRig = field(default_factory=default_vision_rig)
    max_depth: float = 25.0  # simulator.py:121's render_depth_image max_depth
    # Render only the chased target by default — exactly what the reference's
    # FPV chase loop draws (camera.render_depth_image([target]),
    # simulator.py:102/127). The splat cost is linear in point count
    # (BENCH.md), so the full-world bank (target_only=False) costs ~25x more
    # at the default world's 4002 points vs the target's 162.
    target_only: bool = True
    # "splat": reference-parity point z-buffer (vision/renderer.py).
    # "raycast": analytic ray-primitive depths (vision/raycast.py) — solid
    # silhouettes, zero scatter, much faster on TPU; same camera geometry.
    # "raycast_pallas": the same raycast math as ONE pallas kernel
    # (ops/pallas_vision.pallas_render_depth) — per-env scalars ride the
    # sublane axis, the frame stays VMEM-resident; level-exact vs "raycast"
    # (tests/test_pallas_vision.py). Falls back to interpret mode off-TPU.
    # Known corner-case divergences between the two (deliberate): with
    # target_only=True and a zero-target world the splat path keeps the full
    # bank (make_world's `if spec.targets` guard) while raycast emits blank
    # frames; raycast ground is an infinite plane unless `ground_extent`
    # clips it to the splat bank's finite point-cloud footprint.
    renderer: str = "splat"
    # Half-extent (m) clipping the raycast ground plane to |x|,|y| <= extent,
    # matching the splat ground cloud's finite size; None = infinite plane.
    ground_extent: Optional[float] = None
    # Gate-frame band half-width (m) for the raycast renderers — how thick
    # the rendered gate outline (the reference's corner polylines,
    # components.py:790-805) appears on the gate plane. Threaded to both
    # the XLA and pallas raycast paths.
    frame_width: float = 0.08
    # Pixel observation dtype: "f32" = levels/255 floats (the original obs);
    # "u8" = the raw uint8 levels. u8 quarters the HBM footprint of every
    # stored rollout frame (the PPO batch at 1024 envs x T=32 x 96x72 is
    # 906 MB in f32, 227 MB in u8) and is numerically exact — the policy
    # torso reapplies /255 in f32 on use (models/policy.PixelActorCritic).
    pixel_dtype: str = "f32"

    def __post_init__(self):
        if self.renderer not in ("splat", "raycast", "raycast_pallas"):
            raise ValueError(
                "renderer must be 'splat', 'raycast' or 'raycast_pallas', "
                f"got {self.renderer!r}")
        if self.pixel_dtype not in ("f32", "u8"):
            raise ValueError(
                f"pixel_dtype must be 'f32' or 'u8', got {self.pixel_dtype!r}")

    @property
    def params(self) -> DroneParams:
        return self.acro.params

    def make_world(self, spec: Optional[WorldSpec] = None,
                   seed: int = 0) -> Tuple[World, RenderBank]:
        if spec is None:
            from fpyv_tpu.config import FpyvConfig

            spec = WorldSpec.from_config(FpyvConfig().simulator, seed=seed)
        bank = build_render_bank(spec)
        if self.target_only and spec.targets:
            bank = bank_subset(bank, [0])  # bank order: [targets..., ...]
        return build_world(spec, dtype=self.acro.dtype), bank

    def make_randomized_worlds(self, key, n_envs: int, n_spheres: int = 1,
                               n_cylinders: int = 4,
                               **sample_kwargs) -> Tuple[World, RenderBank]:
        """Per-env randomized worlds + ONE shared dynamic render bank.

        The bank carries unit geometry; every transform (position, radius,
        cylinder size) is read from the batched World at render time, so
        each env SEES its own randomized world — the device-side analog of
        rebuilding the reference's object list per run. Resample the World
        inside jit to re-randomize; the bank never changes.
        """
        from fpyv_tpu.world.randomize import sample_worlds

        worlds = sample_worlds(key, n_envs, n_spheres=n_spheres,
                               n_cylinders=n_cylinders,
                               dtype=self.acro.dtype, **sample_kwargs)
        if self.target_only:
            bank = build_dynamic_render_bank(n_spheres=1, n_cylinders=0,
                                             ground=None)
        else:
            bank = build_dynamic_render_bank(n_spheres=n_spheres,
                                             n_cylinders=n_cylinders,
                                             ground=None)
        return worlds, bank

    def _render(self, state: AcroState, world: World, bank: RenderBank):
        from fpyv_tpu.physics.drone import _att_to_rotmat

        R = _att_to_rotmat(self.params, state.drone.att)
        cam_pos, cam_R = camera_pose(self.rig, state.drone.pos, R)
        if self.renderer in ("raycast", "raycast_pallas"):
            include = ("spheres", "cylinders", "ground", "gates")
            if self.target_only:  # chased target (sphere 0) only
                include = ("spheres",)
                mask = jnp.zeros_like(world.sphere_active).at[..., 0].set(True)
                world = world.replace(
                    sphere_active=world.sphere_active & mask)
            if self.renderer == "raycast_pallas":
                from fpyv_tpu.ops.pallas_vision import pallas_render_depth

                return pallas_render_depth(
                    self.rig, cam_pos, cam_R, world,
                    max_depth=self.max_depth, include=include,
                    ground_extent=self.ground_extent,
                    frame_width=self.frame_width,
                    interpret=jax.default_backend() != "tpu")
            from fpyv_tpu.vision.raycast import render_depth_raycast

            return render_depth_raycast(self.rig, cam_pos, cam_R, world,
                                        max_depth=self.max_depth,
                                        include=include,
                                        ground_extent=self.ground_extent,
                                        frame_width=self.frame_width)
        return render_depth_image(self.rig, cam_pos, cam_R, bank, world=world,
                                  max_depth=self.max_depth)

    def _obs(self, state: AcroState, world: World, bank: RenderBank):
        img = self._render(state, world, bank)
        # splat/raycast emit uint8 images; the pallas renderer emits the
        # same levels already as floats in [0, 1]
        if self.pixel_dtype == "u8":
            if jnp.issubdtype(img.dtype, jnp.floating):
                pixels = jnp.round(img * 255.0).astype(jnp.uint8)
            else:
                pixels = img
        elif jnp.issubdtype(img.dtype, jnp.floating):
            pixels = img.astype(self.acro.dtype)
        else:
            pixels = img.astype(self.acro.dtype) / 255.0
        return {
            "pixels": pixels,
            "rates": state.drone.rates / self.params.max_rates,
            "accel_z": state.drone.accel[..., 2:3] / 30.0,
            "thrust": state.drone.thrust[..., None]
            / self.params.thrust_curve.max_force,
        }

    def _target_info(self, state: AcroState, world: World, obs, info):
        """target pixel info (the reference's chase loop extracts the
        centroid of the TARGET-ONLY depth image, simulator.py:103-107)."""
        if self.target_only:
            centroid, found = target_pixel_centroid(
                (obs["pixels"] * 255.0).astype(jnp.uint8))
        else:
            # full-world obs: a whole-image centroid would not isolate the
            # target, so project the chased sphere's center analytically
            # (same camera math, no second render)
            from fpyv_tpu.physics.drone import _att_to_rotmat
            from fpyv_tpu.vision.renderer import project_point_pixel

            R = _att_to_rotmat(self.params, state.drone.att)
            cam_pos, cam_R = camera_pose(self.rig, state.drone.pos, R)
            centroid, found = project_point_pixel(
                self.rig, cam_pos, cam_R, world.sphere_center[..., 0, :])
        return dict(info, target_pixel=centroid, target_visible=found)

    def reset(self, key, world: World, bank: RenderBank):
        state, _ = self.acro.reset(key, world)
        return state, self._obs(state, world, bank)

    def step(self, state: AcroState, action, world: World, bank: RenderBank,
             wind=None):
        state, _, reward, done, info = self.acro.step(state, action, world, wind)
        obs = self._obs(state, world, bank)
        info = self._target_info(state, world, obs, info)
        return state, obs, reward, done, info

    # -- batched entry points: vmap only the per-env acro step and render
    # the whole bank in ONE call.  Identical results to vmapping step()
    # (the renderers are elementwise over envs) but required for the
    # "raycast_pallas" renderer, whose kernel wants the full env batch, and
    # cheaper to trace for the others.

    def _world_batched(self, world: World) -> bool:
        return world.sphere_center.ndim == 3

    def reset_batched(self, keys, world: World, bank: RenderBank):
        """keys: (N,) key array; world: shared or per-env batched."""
        if self._world_batched(world):
            state, _ = jax.vmap(self.acro.reset)(keys, world)
        else:
            state, _ = jax.vmap(lambda k: self.acro.reset(k, world))(keys)
        return state, self._obs(state, world, bank)

    def step_batched(self, state: AcroState, action, world: World,
                     bank: RenderBank, wind=None):
        if self._world_batched(world):
            state, _, reward, done, info = jax.vmap(
                lambda s, a, w: self.acro.step(s, a, w, wind))(
                    state, action, world)
        else:
            state, _, reward, done, info = jax.vmap(
                lambda s, a: self.acro.step(s, a, world, wind))(state, action)
        obs = self._obs(state, world, bank)
        info = self._target_info(state, world, obs, info)
        return state, obs, reward, done, info
