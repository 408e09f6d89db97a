"""Pinhole camera math: intrinsics, FOV <-> focal length, projection.

Reference parity (all citations into /root/reference):

- ``WORLD2CAM`` axis permutation (src/utils/helper_functions.py:7-9): maps
  world xyz to camera uvw — u=y, v=-z, w=x (camera looks along +x of the frame
  it's mounted on, image u right, v down).
- ``intrinsic_matrix`` (helper_functions.py:11-12): K = [[fx,0,cx],[0,fy,cy],[0,0,1]].
- focal length from *horizontal* FOV: ``f = W / (2 tan(fov/2))``
  (src/utils/components.py:470-472 — note the reference calls the param
  "diagonal fov" but divides by resolution[0]; we keep the width semantics).
- Projection (components.py:531-535, 545-568): ``P = K @ inv([R|t;0 1])[:3,:]``,
  keep points with camera-depth > 0, divide by depth, truncate to int.
  We never materialize a 4x4 inverse: for extrinsic [R|t],
  ``inv([R|t;0 1]) = [R.T | -R.T t; 0 1]`` since R is orthonormal.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# World xyz -> camera uvw permutation (helper_functions.py:7-9).
WORLD2CAM = np.array(
    [
        [0.0, 1.0, 0.0],
        [0.0, 0.0, -1.0],
        [1.0, 0.0, 0.0],
    ]
)


def intrinsic_matrix(fx, fy, cx, cy, dtype=jnp.float32) -> jnp.ndarray:
    """K matrix. Parity: helper_functions.py:11-12."""
    fx = jnp.asarray(fx, dtype)
    z = jnp.zeros_like(fx)
    o = jnp.ones_like(fx)
    return jnp.stack(
        [
            jnp.stack([fx, z, jnp.asarray(cx, dtype) * o], axis=-1),
            jnp.stack([z, jnp.asarray(fy, dtype) * o, jnp.asarray(cy, dtype) * o], axis=-1),
            jnp.stack([z, z, o], axis=-1),
        ],
        axis=-2,
    )


def focal_length_from_fov(fov_deg, width):
    """f = W / (2 tan(fov/2)). Parity: components.py:470-472 and
    helper_functions.py:88-97."""
    return width / (2.0 * jnp.tan(jnp.deg2rad(fov_deg) / 2.0))


def fov_from_focal_length(focal_length, width):
    """Parity: components.py:474-475."""
    return jnp.rad2deg(2.0 * jnp.arctan(width / (2.0 * focal_length)))


def fovs_from_resolution(resolution, focal_length):
    """(horizontal, vertical) FOV in degrees. Parity: components.py:477-488."""
    w, h = resolution[0], resolution[1]
    fh = jnp.rad2deg(2.0 * jnp.arctan2(w / 2.0, focal_length))
    fv = jnp.rad2deg(2.0 * jnp.arctan2(h / 2.0, focal_length))
    return fh, fv


def world_to_camera(points, cam_R, cam_t, precision="highest"):
    """Transform world points into the camera frame.

    Equivalent to ``inv([R|t; 0 1]) @ [p;1]`` (components.py:531-535) without
    forming the inverse: ``p_cam = R.T @ (p - t)``.

    Args:
      points: (..., P, 3) world points.
      cam_R: (..., 3, 3) camera-to-world rotation.
      cam_t: (..., 3) camera position in world.
    Returns:
      (..., P, 3) points in camera frame (z = depth along optical axis).
    """
    rel = points - cam_t[..., None, :]
    return jnp.einsum("...ij,...pi->...pj", cam_R, rel, precision=precision)


def project_camera_points(pts_cam, K, eps: float = 1e-12,
                          precision="highest"):
    """Apply intrinsics and perspective divide; float pixel coords + depth.

    Parity with components.py:545-568 up to (but not including) the int cast:
    callers that need the reference's exact pixel ids apply
    ``jnp.trunc`` (`astype(int)` truncates toward zero).

    Returns:
      (u, v, depth): each (..., P).
    """
    x = jnp.einsum("...ij,...pj->...pi", K, pts_cam, precision=precision)
    depth = x[..., 2]
    safe = jnp.where(jnp.abs(depth) > eps, depth, eps)
    return x[..., 0] / safe, x[..., 1] / safe, depth


def pixel_to_direction(pixel, K_inv, cam_R=None):
    """Unit ray through a pixel. Parity: components.py:505-525
    (``pixel2direction``): ``dir = R_cam @ K^-1 @ [px, py, 1]``, normalized.

    Args:
      pixel: (..., 2) pixel coordinates.
      K_inv: (3, 3) inverse intrinsics (host-precomputed; K is static).
      cam_R: optional (..., 3, 3) camera-to-world rotation. If None, the ray
        is returned in the camera frame (ref_frame='camera').
    """
    ph = jnp.concatenate([pixel, jnp.ones_like(pixel[..., :1])], axis=-1)
    d = jnp.einsum("ij,...j->...i", jnp.asarray(K_inv, pixel.dtype), ph)
    if cam_R is not None:
        d = jnp.einsum("...ij,...j->...i", cam_R, d)
    return d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)


def bbox3d_corners(points, mask=None):
    """8 corners of the axis-aligned bounding box of a point set.

    Parity: the ``bbox3d`` class decorator (helper_functions.py:120-136),
    including its exact corner ordering:
    corner i has x = max if i >= 4, y = max if i odd, z = max if i in {2,3,6,7}.

    Args:
      points: (..., P, 3); mask: optional (..., P) validity mask.
    Returns:
      (..., 8, 3).
    """
    if mask is not None:
        big = jnp.asarray(jnp.inf, points.dtype)
        mn = jnp.min(jnp.where(mask[..., None], points, big), axis=-2)
        mx = jnp.max(jnp.where(mask[..., None], points, -big), axis=-2)
    else:
        mn = jnp.min(points, axis=-2)
        mx = jnp.max(points, axis=-2)
    # x: [min]*4 + [max]*4 ; y alternates min/max ; z pattern per reference.
    xsel = jnp.asarray([0, 0, 0, 0, 1, 1, 1, 1], dtype=points.dtype)
    ysel = jnp.asarray([0, 1, 0, 1, 0, 1, 0, 1], dtype=points.dtype)
    zsel = jnp.asarray([0, 0, 1, 1, 0, 0, 1, 1], dtype=points.dtype)
    sel = jnp.stack([xsel, ysel, zsel], axis=-1)  # (8, 3)
    return mn[..., None, :] * (1.0 - sel) + mx[..., None, :] * sel
