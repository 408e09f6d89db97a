"""Camera rig: fixed-pitch FPV camera rigidly mounted on the drone frame.

Reference parity (src/utils/components.py:449-535):

- mount rotation ``WORLD2CAM.T @ E(deg2rad(pitch), 0, 0)`` (:455) with the
  35° pitch and [0.1, 0, 0] m offset from params.yaml;
- ``f = W / (2 tan(fov/2))`` (:470-472), K from f and the half-resolution
  principal point (:468);
- pose update (:501-503): ``cam_pos = p + R @ rel_pos``,
  ``cam_R = R @ rel_R``;
- ``pixel2direction`` (:505-525) and the projection matrix (:531-535) are in
  fpyv_tpu.ops.camera_ops; K/K⁻¹ are host-precomputed float64 constants.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from fpyv_tpu.config import CameraConfig
from fpyv_tpu.ops import rotations as rot
from fpyv_tpu.ops.camera_ops import WORLD2CAM


def _mount_rotation(pitch_deg: float) -> np.ndarray:
    cp, sp = np.cos(np.deg2rad(pitch_deg)), np.sin(np.deg2rad(pitch_deg))
    Ex = np.array([[1.0, 0.0, 0.0], [0.0, cp, -sp], [0.0, sp, cp]])
    return WORLD2CAM.T @ Ex


@dataclass(frozen=True)
class CameraRig:
    """Static camera intrinsics + mount (hashable; host-precomputed)."""

    pitch_deg: float = 35.0
    rel_position: Tuple[float, float, float] = (0.1, 0.0, 0.0)
    fov_deg: float = 120.0
    resolution: Tuple[int, int] = (640, 480)  # (W, H)

    @classmethod
    def from_config(cls, cfg: CameraConfig) -> "CameraRig":
        return cls(
            pitch_deg=cfg.camera_angle,
            rel_position=tuple(cfg.position_relative_to_frame),
            fov_deg=cfg.fov,
            resolution=tuple(int(x) for x in cfg.resolution),
        )

    @property
    def focal_length(self) -> float:
        return self.resolution[0] / (2.0 * np.tan(np.deg2rad(self.fov_deg) / 2.0))

    @property
    def K(self) -> np.ndarray:
        f = self.focal_length
        W, H = self.resolution
        return np.array([[f, 0.0, W / 2.0], [0.0, f, H / 2.0], [0.0, 0.0, 1.0]])

    @property
    def K_inv(self) -> np.ndarray:
        return np.linalg.inv(self.K)

    @property
    def mount_rotation(self) -> np.ndarray:
        return _mount_rotation(self.pitch_deg)


def camera_pose(rig: CameraRig, drone_pos: jnp.ndarray, drone_R: jnp.ndarray):
    """(cam_pos, cam_R) from the drone pose. Parity: components.py:501-503."""
    rel_p = jnp.asarray(rig.rel_position, drone_pos.dtype)
    rel_R = jnp.asarray(rig.mount_rotation, drone_pos.dtype)
    cam_pos = drone_pos + rot.mat3_vec(drone_R, rel_p)
    cam_R = rot.mat3_mul(drone_R, rel_R)
    return cam_pos, cam_R


def pixel_to_direction(rig: CameraRig, cam_R: jnp.ndarray, pixel: jnp.ndarray):
    """World-frame unit ray through a pixel (components.py:505-525,
    ref_frame='world')."""
    from fpyv_tpu.ops.camera_ops import pixel_to_direction as _p2d

    return _p2d(pixel, rig.K_inv, cam_R)
