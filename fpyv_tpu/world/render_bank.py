"""Static render point bank: every world object's vertices in one SoA array.

The reference renders by iterating Python object lists and stacking
``obj.points`` per frame (components.py:537-543). Here all vertices are
concatenated ONCE into a static bank with per-point object ids; moving
targets contribute *relative* icosphere vertices plus a dynamic center
looked up from the physics World each frame — so the whole render path is
branch-free gathers over fixed shapes.

Bank object order mirrors simulator.py:85's object_list:
[targets..., gates..., cylinders..., ground].
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np

from fpyv_tpu.world.generators import (
    WorldSpec,
    cylinder_points,
    gate_corners,
    ground_points,
)
from fpyv_tpu.world.icosphere import icosphere


@dataclass(frozen=True)
class RenderBank:
    """Static (host-built) geometry; wrapped to jnp at use site."""

    base_points: np.ndarray  # (P, 3) — relative for spheres, absolute otherwise
    point_obj: np.ndarray  # (P,) int32 object index
    obj_is_sphere: np.ndarray  # (O,) bool: position = world.sphere_center[idx]
    obj_sphere_idx: np.ndarray  # (O,) int32 (0 where not a sphere)
    bbox_base: np.ndarray  # (O, 8, 3) bbox corners of base points
    num_objects: int

    @property
    def num_points(self) -> int:
        return len(self.base_points)


def _bbox_corners(points: np.ndarray) -> np.ndarray:
    """8-corner AABB in the reference's corner ordering
    (helper_functions.py:120-136)."""
    mn, mx = points.min(axis=0), points.max(axis=0)
    box = np.zeros((8, 3))
    box[:4, 0] = mn[0]
    box[4:, 0] = mx[0]
    box[::2, 1] = mn[1]
    box[1::2, 1] = mx[1]
    box[[0, 1, 4, 5], 2] = mn[2]
    box[[2, 3, 6, 7], 2] = mx[2]
    return box


def build_render_bank(spec: WorldSpec,
                      rng: Optional[np.random.Generator] = None) -> RenderBank:
    rng = rng or np.random.default_rng(0)
    pts_list, obj_ids = [], []
    is_sphere, sphere_idx, bboxes = [], [], []
    oid = 0

    for si, t in enumerate(spec.targets):
        verts, _ = icosphere(t.nu)
        verts = verts * t.radius  # components.py:758-759
        pts_list.append(verts)
        obj_ids.append(np.full(len(verts), oid, np.int32))
        is_sphere.append(True)
        sphere_idx.append(si)
        bboxes.append(_bbox_corners(verts))
        oid += 1

    for g in spec.gates:
        corners = gate_corners(g.size, g.shape, g.resolution)
        corners = (g.rotmat @ corners.T).T + g.position  # components.py:803-805
        pts_list.append(corners)
        obj_ids.append(np.full(len(corners), oid, np.int32))
        is_sphere.append(False)
        sphere_idx.append(0)
        bboxes.append(_bbox_corners(corners))
        oid += 1

    for c in spec.cylinders:
        pts = c.position + cylinder_points(
            c.radius, c.height, c.angle_resolution, c.height_resolution,
            c.random, rng)
        pts_list.append(pts)
        obj_ids.append(np.full(len(pts), oid, np.int32))
        is_sphere.append(False)
        sphere_idx.append(0)
        bboxes.append(_bbox_corners(pts))
        oid += 1

    if spec.ground is not None:
        pts = ground_points(**spec.ground, rng=rng)
        pts_list.append(pts)
        obj_ids.append(np.full(len(pts), oid, np.int32))
        is_sphere.append(False)
        sphere_idx.append(0)
        bboxes.append(_bbox_corners(pts))
        oid += 1

    if not pts_list:  # empty world: one inactive dummy point
        pts_list = [np.zeros((1, 3))]
        obj_ids = [np.zeros(1, np.int32)]
        is_sphere, sphere_idx, bboxes = [False], [0], [np.zeros((8, 3))]
        oid = 1

    return RenderBank(
        base_points=np.concatenate(pts_list, axis=0),
        point_obj=np.concatenate(obj_ids, axis=0),
        obj_is_sphere=np.asarray(is_sphere, bool),
        obj_sphere_idx=np.asarray(sphere_idx, np.int32),
        bbox_base=np.stack(bboxes, axis=0),
        num_objects=oid,
    )


def bank_downsample(bank: RenderBank, factor: int,
                    seed: int = 0) -> RenderBank:
    """Keep ~1/factor of each object's points (uniform strided per object).

    The splat renderer's cost is linear in point count on TPU (scatter
    serializes per update — BENCH.md), so RL observation banks should carry
    only as many points as the target resolution resolves. Bboxes (used for
    pruning) are preserved from the full geometry.
    """
    if factor <= 1:
        return bank
    keep = np.zeros(bank.num_points, bool)
    for oid in range(bank.num_objects):
        idx = np.nonzero(bank.point_obj == oid)[0]
        keep[idx[::factor]] = True
    return RenderBank(
        base_points=bank.base_points[keep],
        point_obj=bank.point_obj[keep],
        obj_is_sphere=bank.obj_is_sphere,
        obj_sphere_idx=bank.obj_sphere_idx,
        bbox_base=bank.bbox_base,
        num_objects=bank.num_objects,
    )


def bank_subset(bank: RenderBank, obj_indices) -> RenderBank:
    """A bank restricted to the given object indices (e.g. just the chased
    target, like simulator.py:102's render of [targets[idx]])."""
    obj_indices = np.asarray(obj_indices)
    keep = np.isin(bank.point_obj, obj_indices)
    remap = -np.ones(bank.num_objects, np.int32)
    remap[obj_indices] = np.arange(len(obj_indices), dtype=np.int32)
    return RenderBank(
        base_points=bank.base_points[keep],
        point_obj=remap[bank.point_obj[keep]],
        obj_is_sphere=bank.obj_is_sphere[obj_indices],
        obj_sphere_idx=bank.obj_sphere_idx[obj_indices],
        bbox_base=bank.bbox_base[obj_indices],
        num_objects=len(obj_indices),
    )
