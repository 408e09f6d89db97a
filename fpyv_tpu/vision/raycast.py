"""Analytic raycast depth renderer: ray-primitive intersection per pixel.

The splat renderer (vision/renderer.py) reproduces the reference's
point-cloud z-buffer (components.py:614-629) exactly, but its scatter-min
serializes on TPU across the whole (env x point) batch (~8 cycles/update —
BENCH.md), which caps vision-env throughput.  This module renders the SAME
scenes a different way: every world primitive has a closed-form ray
intersection, so the depth image is pure elementwise VPU math over the
pixel grid — no scatter, no point banks, fully parallel over
(env, pixel), and XLA fuses the whole render into one loop.

Semantic difference vs the reference (deliberate): primitives render as
SOLID surfaces (a filled disk for a sphere, a tube for a cylinder, a thin
frame for a gate) instead of splatted vertex dots.  For RL pixel
observations this is a denser, alias-free signal; for reference-parity
rendering keep the splat path.  Geometry (camera model, depth = camera-z,
uint8 encoding ``255*(1 - z/max_depth)``, components.py:626-628) is
identical, so the two renderers agree on silhouettes to one pixel.

Depth convention: rays are parameterized ``p = cam_pos + t * d_world``
with ``d_cam = K^-1 [u+.5, v+.5, 1]`` so the camera-frame z of the hit is
exactly ``t`` — the same depth the splat buffer stores (camera z, not ray
length).  Pixel centers (the +0.5) make the solid silhouette match the
splat's int-truncated pixel coordinates (components.py:553).

All functions broadcast over leading env dims and run under jit/vmap;
the math is also pallas-safe (plain jnp elementwise ops) so the render can
be folded into an env megaloop kernel.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from fpyv_tpu.physics.world import World
from fpyv_tpu.vision.camera import CameraRig

_BIG = 3.0e38  # "no hit" sentinel, < f32 inf so min/where stay finite


def pixel_ray_grid(rig: CameraRig) -> np.ndarray:
    """(3, H, W) float32 camera-frame ray directions through pixel centers,
    z-normalized to 1 (so depth-along-ray == camera z)."""
    W, H = rig.resolution
    K_inv = rig.K_inv  # float64 host constant
    u = np.arange(W, dtype=np.float64) + 0.5
    v = np.arange(H, dtype=np.float64) + 0.5
    uu, vv = np.meshgrid(u, v)  # (H, W)
    dx = K_inv[0, 0] * uu + K_inv[0, 1] * vv + K_inv[0, 2]
    dy = K_inv[1, 1] * vv + K_inv[1, 2]
    dz = np.ones_like(dx)
    return np.stack([dx, dy, dz]).astype(np.float32)


def _world_rays(rig: CameraRig, cam_R: jnp.ndarray, dtype):
    """World-frame (unnormalized) ray dirs (..., 3, H, W): d_w = cam_R @ d_cam."""
    d_cam = jnp.asarray(pixel_ray_grid(rig), dtype)  # (3, H, W)
    R = cam_R[..., None, None]  # (..., 3, 3, 1, 1)
    return (
        R[..., :, 0, :, :] * d_cam[0]
        + R[..., :, 1, :, :] * d_cam[1]
        + R[..., :, 2, :, :] * d_cam[2]
    )  # (..., 3, H, W)


def _ray_spheres(cam_pos, d, centers, radii, active):
    """Nearest sphere hit per pixel.

    d: (..., 3, H, W); centers (..., S, 3); radii/active (..., S).
    Returns t (..., H, W) with _BIG where no hit.
    """
    dx, dy, dz = d[..., 0, :, :], d[..., 1, :, :], d[..., 2, :, :]
    a = dx * dx + dy * dy + dz * dz
    t_min = jnp.full(dx.shape, _BIG, dx.dtype)
    S = centers.shape[-2]
    for s in range(S):
        ox = cam_pos[..., 0, None, None] - centers[..., s, 0, None, None]
        oy = cam_pos[..., 1, None, None] - centers[..., s, 1, None, None]
        oz = cam_pos[..., 2, None, None] - centers[..., s, 2, None, None]
        r = radii[..., s, None, None]
        b = ox * dx + oy * dy + oz * dz
        c = ox * ox + oy * oy + oz * oz - r * r
        disc = b * b - a * c
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t = (-b - sq) / a  # near root; camera inside -> far root
        t = jnp.where(t > 0, t, (-b + sq) / a)
        ok = (disc >= 0) & (t > 0)
        if active is not None:
            ok = ok & active[..., s, None, None]
        t_min = jnp.minimum(t_min, jnp.where(ok, t, _BIG))
    return t_min


def _ray_cylinders(cam_pos, d, centers, radii, heights, active):
    """Nearest open-tube hit (vertical cylinder, base at center z, extent
    [z0, z0+h] — physics/world.py:118's convention).  Both quadratic roots
    are tried so the inner back wall renders when the near wall is outside
    the z band (the splat bank draws the far side too)."""
    dx, dy, dz = d[..., 0, :, :], d[..., 1, :, :], d[..., 2, :, :]
    t_min = jnp.full(dx.shape, _BIG, dx.dtype)
    C = centers.shape[-2]
    for ci in range(C):
        ox = cam_pos[..., 0, None, None] - centers[..., ci, 0, None, None]
        oy = cam_pos[..., 1, None, None] - centers[..., ci, 1, None, None]
        z0 = centers[..., ci, 2, None, None]
        r = radii[..., ci, None, None]
        h = heights[..., ci, None, None]
        a = dx * dx + dy * dy
        b = ox * dx + oy * dy
        c = ox * ox + oy * oy - r * r
        disc = b * b - a * c
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        safe_a = jnp.where(jnp.abs(a) > 1e-20, a, 1e-20)
        camz = cam_pos[..., 2, None, None]
        hit_any = jnp.full(dx.shape, False)
        t_cyl = jnp.full(dx.shape, _BIG, dx.dtype)
        for sign in (-1.0, 1.0):  # near wall, then far wall
            t = (-b + sign * sq) / safe_a
            zhit = camz + t * dz
            ok = (disc >= 0) & (t > 0) & (zhit >= z0) & (zhit <= z0 + h)
            t_cyl = jnp.where(ok & ~hit_any, t, t_cyl)
            hit_any = hit_any | ok
        if active is not None:
            hit_any = hit_any & active[..., ci, None, None]
        t_min = jnp.minimum(t_min, jnp.where(hit_any, t_cyl, _BIG))
    return t_min


def _ray_ground(cam_pos, d, has_ground, extent: Optional[float] = None):
    """z=0 plane hit. With `extent`, hits are clipped to |x|,|y| <= extent —
    the splat ground is a finite point cloud of that half-extent
    (world/render_bank.py), so clipping restores silhouette parity near the
    horizon; default None keeps the infinite plane (denser RL signal)."""
    dz = d[..., 2, :, :]
    camz = cam_pos[..., 2, None, None]
    safe = jnp.where(jnp.abs(dz) > 1e-20, dz, 1e-20)
    t = -camz / safe
    ok = (t > 0) & (jnp.abs(dz) > 1e-20)
    if extent is not None:
        hx = cam_pos[..., 0, None, None] + t * d[..., 0, :, :]
        hy = cam_pos[..., 1, None, None] + t * d[..., 1, :, :]
        ok = ok & (jnp.abs(hx) <= extent) & (jnp.abs(hy) <= extent)
    if has_ground is not None:
        ok = ok & jnp.asarray(has_ground)[..., None, None]
    return jnp.where(ok, t, _BIG)


def _ray_gates(cam_pos, d, pos, rotmat, size, active, shape,
               frame_width: float = 0.08):
    """Gate frames as thin bands on the gate plane (normal = R[:,0],
    world/generators.py:71-88's local frame), shape-aware per gate
    (World.gate_shape): 0 rectangle -> square band
    |max(|y|,|z|) - s/2| <= w; 1 circle -> annulus of radius s/2 about the
    gate origin; 2 half_circle -> upper semicircular arc of radius s about
    (0, -s/2) plus the closing bottom chord — exactly the outlines
    ``gate_corners`` polylines trace (components.py:790-805), thickened to
    ``frame_width``.  The splat path remains the parity renderer for the
    exact splatted polyline dots."""
    dx, dy, dz = d[..., 0, :, :], d[..., 1, :, :], d[..., 2, :, :]
    t_min = jnp.full(dx.shape, _BIG, dx.dtype)
    G = pos.shape[-2]
    for g in range(G):
        R = rotmat[..., g, :, :]
        n = R[..., :, 0]  # gate normal (world), components.py:811-813
        rel0 = pos[..., g, :] - cam_pos  # gate origin relative to camera
        ndotd = (n[..., 0, None, None] * dx + n[..., 1, None, None] * dy
                 + n[..., 2, None, None] * dz)
        ndot0 = jnp.sum(n * rel0, axis=-1)[..., None, None]
        safe = jnp.where(jnp.abs(ndotd) > 1e-20, ndotd, 1e-20)
        t = ndot0 / safe
        # hit point in gate-local y/z
        hx = cam_pos[..., 0, None, None] + t * dx - pos[..., g, 0, None, None]
        hy = cam_pos[..., 1, None, None] + t * dy - pos[..., g, 1, None, None]
        hz = cam_pos[..., 2, None, None] + t * dz - pos[..., g, 2, None, None]
        ly = (R[..., 0, 1, None, None] * hx + R[..., 1, 1, None, None] * hy
              + R[..., 2, 1, None, None] * hz)
        lz = (R[..., 0, 2, None, None] * hx + R[..., 1, 2, None, None] * hy
              + R[..., 2, 2, None, None] * hz)
        s = size[..., g, None, None]
        half = s / 2.0
        # rectangle: square outline of half-extent s/2 (gate_corners:75-77)
        on_rect = jnp.abs(jnp.maximum(jnp.abs(ly), jnp.abs(lz)) - half) \
            <= frame_width
        # circle: ring of radius s/2 about the origin (coef=2, :79-81)
        rr = jnp.sqrt(ly * ly + lz * lz)
        on_circ = jnp.abs(rr - half) <= frame_width
        # half_circle: radius-s upper arc about (0, -s/2) (coef=1 + the
        # -s/2 z shift, :79-85) + the closing chord vstack adds (:88)
        cz = lz + half
        ra = jnp.sqrt(ly * ly + cz * cz)
        on_arc = (jnp.abs(ra - s) <= frame_width) & (cz >= -frame_width)
        on_chord = (jnp.abs(cz) <= frame_width) & (jnp.abs(ly) <= s + frame_width)
        on_half = on_arc | on_chord
        code = shape[..., g, None, None]
        on_frame = jnp.where(code == 1, on_circ,
                             jnp.where(code == 2, on_half, on_rect))
        ok = (t > 0) & on_frame & (jnp.abs(ndotd) > 1e-20)
        if active is not None:
            ok = ok & active[..., g, None, None]
        t_min = jnp.minimum(t_min, jnp.where(ok, t, _BIG))
    return t_min


def raycast_depth(
    rig: CameraRig,
    cam_pos: jnp.ndarray,  # (..., 3)
    cam_R: jnp.ndarray,  # (..., 3, 3)
    world: World,
    include: Tuple[str, ...] = ("spheres", "cylinders", "ground", "gates"),
    ground_extent: Optional[float] = None,
    frame_width: float = 0.08,
) -> jnp.ndarray:
    """Raw nearest-hit camera-z depth (..., H, W); _BIG where empty."""
    dtype = cam_pos.dtype
    d = _world_rays(rig, cam_R, dtype)
    t = jnp.full(d.shape[:-3] + d.shape[-2:], _BIG, dtype)
    if "spheres" in include and world.num_spheres:
        t = jnp.minimum(t, _ray_spheres(
            cam_pos, d, world.sphere_center.astype(dtype),
            world.sphere_radius.astype(dtype), world.sphere_active))
    if "cylinders" in include and world.num_cylinders:
        t = jnp.minimum(t, _ray_cylinders(
            cam_pos, d, world.cyl_center.astype(dtype),
            world.cyl_radius.astype(dtype), world.cyl_height.astype(dtype),
            world.cyl_active))
    if "ground" in include:
        t = jnp.minimum(t, _ray_ground(cam_pos, d, world.has_ground,
                                       extent=ground_extent))
    if "gates" in include and world.num_gates:
        t = jnp.minimum(t, _ray_gates(
            cam_pos, d, world.gate_pos.astype(dtype),
            world.gate_rotmat.astype(dtype), world.gate_size.astype(dtype),
            world.gate_active, world.gate_shape, frame_width=frame_width))
    return t


def render_depth_raycast(
    rig: CameraRig,
    cam_pos: jnp.ndarray,
    cam_R: jnp.ndarray,
    world: World,
    max_depth: float = 10.0,
    include: Tuple[str, ...] = ("spheres", "cylinders", "ground", "gates"),
    ground_extent: Optional[float] = None,
    frame_width: float = 0.08,
) -> jnp.ndarray:
    """uint8 depth image(s) (..., H, W), same encoding as the splat
    renderer / reference (components.py:626-628): empty -> max_depth,
    ``255*(1 - z/max_depth)``."""
    t = raycast_depth(rig, cam_pos, cam_R, world, include,
                      ground_extent=ground_extent, frame_width=frame_width)
    t = jnp.minimum(t, max_depth)
    return (255.0 * (1.0 - t / max_depth)).astype(jnp.uint8)
