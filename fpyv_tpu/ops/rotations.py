"""Rotation representations: Euler <-> matrix <-> quaternion <-> axis-angle.

Reference parity (all citations into /root/reference):

- Euler convention is extrinsic XYZ composed as ``R = Rz(yaw) @ Ry(pitch) @ Rx(roll)``
  (src/utils/helper_functions.py:39-44). We expand the product in closed form
  instead of composing three matmuls — same math, fewer ops, fully fusable.
- Matrix -> Euler follows src/utils/helper_functions.py:47-62. Note the
  reference's gimbal-lock guard ``if R[2,0] != 1 or R[2,0] != -1`` is a
  tautology (always true), so the reference *always* takes the generic
  arctan2/arcsin branch; we implement exactly that branch, branch-free.
- Quaternion <-> matrix follows src/utils/helper_functions.py:65-80,100-117
  (w,x,y,z order, "how the world sees the body").
- Axis-angle <-> matrix follows src/utils/helper_functions.py:156-193 with
  numerically-safe handling of the angle ~ 0 / pi corners (the reference
  branches on exact float equality, which in practice never fires; our
  jnp.where guards cover the same corners without data-dependent control flow).
- Body-rate attitude update follows src/utils/kinematics.py:27-30:
  ``R <- (E(deg2rad(rates) * dt) @ R.T).T`` which algebraically equals
  ``R @ E(rates_dt).T``. This is a small-angle Euler-matrix composition,
  NOT the SO(3) exponential — preserved bit-for-bit for parity, with a
  quaternion twin (`quat_rotate_by_rates`) that composes the identical
  per-axis rotations in quaternion space.

All functions take arrays with arbitrary leading batch dims:
``R: (..., 3, 3)``, ``q: (..., 4)`` (w,x,y,z), ``euler: (..., 3)`` (roll,pitch,yaw).
"""

from __future__ import annotations

import jax.numpy as jnp

# TPU matmuls on f32 inputs default to bf16 passes; for attitude updates the
# error compounds multiplicatively over thousands of steps (observed: O(1)
# orthonormality drift after 600 bf16 3x3 matmuls). All rotation-chain
# matmuls therefore pin highest precision — they are 3x3, the cost is nil.
_PRECISION = "highest"


def mat3_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched 3x3 matmul at full f32 precision (see _PRECISION note)."""
    return jnp.matmul(a, b, precision=_PRECISION)


def mat3_vec(R: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """``R @ v`` batched, full precision."""
    return jnp.einsum("...ij,...j->...i", R, v, precision=_PRECISION)


def mat3_vec_T(R: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """``Rᵀ @ v`` batched, full precision."""
    return jnp.einsum("...ji,...j->...i", R, v, precision=_PRECISION)

# --------------------------------------------------------------------------
# Euler <-> rotation matrix
# --------------------------------------------------------------------------


def euler_to_rotmat(euler: jnp.ndarray) -> jnp.ndarray:
    """``R = Rz(yaw) @ Ry(pitch) @ Rx(roll)`` — closed form.

    Parity: src/utils/helper_functions.py:39-44 (euler_angles_to_rotation_matrix).

    Args:
      euler: (..., 3) [roll, pitch, yaw] in radians.
    Returns:
      (..., 3, 3) rotation matrix.
    """
    roll, pitch, yaw = euler[..., 0], euler[..., 1], euler[..., 2]
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    row0 = jnp.stack([cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr], axis=-1)
    row1 = jnp.stack([sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr], axis=-1)
    row2 = jnp.stack([-sp, cp * sr, cp * cr], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def rotmat_to_euler(R: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`euler_to_rotmat` (generic branch only; see module doc).

    Parity: src/utils/helper_functions.py:47-62 — the reference's singular
    branch is dead code (tautological guard), so this is exact parity.
    """
    x = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    y = jnp.arcsin(jnp.clip(-R[..., 2, 0], -1.0, 1.0))
    z = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    return jnp.stack([x, y, z], axis=-1)


def rotmat_x(angle: jnp.ndarray) -> jnp.ndarray:
    """Single-axis rotation about x. Parity: helper_functions.py:19-25."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    o, z = jnp.ones_like(c), jnp.zeros_like(c)
    return jnp.stack(
        [
            jnp.stack([o, z, z], axis=-1),
            jnp.stack([z, c, -s], axis=-1),
            jnp.stack([z, s, c], axis=-1),
        ],
        axis=-2,
    )


def rotmat_y(angle: jnp.ndarray) -> jnp.ndarray:
    """Single-axis rotation about y.

    Parity note: the reference's 'y' branch (helper_functions.py:26-30) writes
    ``dR[0,0]=cos, dR[0,2]=sin, dR[2,0]=-sin, dR[2,2]=cos`` but leaves
    ``dR[1,1]=1`` — i.e. the standard Ry. We reproduce the standard Ry.
    """
    c, s = jnp.cos(angle), jnp.sin(angle)
    o, z = jnp.ones_like(c), jnp.zeros_like(c)
    return jnp.stack(
        [
            jnp.stack([c, z, s], axis=-1),
            jnp.stack([z, o, z], axis=-1),
            jnp.stack([-s, z, c], axis=-1),
        ],
        axis=-2,
    )


def rotmat_z(angle: jnp.ndarray) -> jnp.ndarray:
    """Single-axis rotation about z. Parity: helper_functions.py:31-36."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    o, z = jnp.ones_like(c), jnp.zeros_like(c)
    return jnp.stack(
        [
            jnp.stack([c, -s, z], axis=-1),
            jnp.stack([s, c, z], axis=-1),
            jnp.stack([z, z, o], axis=-1),
        ],
        axis=-2,
    )


# --------------------------------------------------------------------------
# Quaternions (w, x, y, z)
# --------------------------------------------------------------------------


def quat_identity(batch_shape=(), dtype=jnp.float32) -> jnp.ndarray:
    q = jnp.zeros(batch_shape + (4,), dtype=dtype)
    return q.at[..., 0].set(1.0)


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product ``a ⊗ b`` (w,x,y,z)."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Parity: src/utils/helper_functions.py:100-117 (quaternion_to_rotation_matrix)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack(
        [1 - 2 * y**2 - 2 * z**2, 2 * x * y - 2 * z * w, 2 * x * z + 2 * y * w], axis=-1
    )
    row1 = jnp.stack(
        [2 * x * y + 2 * z * w, 1 - 2 * x**2 - 2 * z**2, 2 * y * z - 2 * x * w], axis=-1
    )
    row2 = jnp.stack(
        [2 * x * z - 2 * y * w, 2 * y * z + 2 * x * w, 1 - 2 * x**2 - 2 * y**2], axis=-1
    )
    return jnp.stack([row0, row1, row2], axis=-2)


def rotmat_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Matrix -> quaternion, numerically stable (Shepperd's method).

    The reference (helper_functions.py:65-80) uses only the trace branch,
    which NaNs when trace <= -1; we return the same value on its valid
    domain but stay finite everywhere. Tests check parity on the reference's
    valid domain.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate computations, one per dominant component.
    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    sw = safe_sqrt(1.0 + tr)  # 2*qw when dominant
    qw_w = 0.5 * sw
    inv_sw = 0.5 / sw
    cand_w = jnp.stack(
        [qw_w, (m21 - m12) * inv_sw, (m02 - m20) * inv_sw, (m10 - m01) * inv_sw],
        axis=-1,
    )

    sx = safe_sqrt(1.0 + m00 - m11 - m22)
    inv_sx = 0.5 / sx
    cand_x = jnp.stack(
        [(m21 - m12) * inv_sx, 0.5 * sx, (m01 + m10) * inv_sx, (m02 + m20) * inv_sx],
        axis=-1,
    )

    sy = safe_sqrt(1.0 - m00 + m11 - m22)
    inv_sy = 0.5 / sy
    cand_y = jnp.stack(
        [(m02 - m20) * inv_sy, (m01 + m10) * inv_sy, 0.5 * sy, (m12 + m21) * inv_sy],
        axis=-1,
    )

    sz = safe_sqrt(1.0 - m00 - m11 + m22)
    inv_sz = 0.5 / sz
    cand_z = jnp.stack(
        [(m10 - m01) * inv_sz, (m02 + m20) * inv_sz, (m12 + m21) * inv_sz, 0.5 * sz],
        axis=-1,
    )

    # Pick the branch with the largest diagonal contribution (most stable).
    diag = jnp.stack([tr, m00, m11, m22], axis=-1)
    choice = jnp.argmax(diag, axis=-1)
    cands = jnp.stack([cand_w, cand_x, cand_y, cand_z], axis=-2)  # (..., 4, 4)
    q = jnp.take_along_axis(cands, choice[..., None, None].astype(jnp.int32), axis=-2)
    q = q[..., 0, :]
    # Canonical sign: w >= 0 (the reference's trace formula also yields w >= 0).
    return q * jnp.where(q[..., 0:1] < 0, -1.0, 1.0)


def quat_from_axis_angle(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    half = 0.5 * angle
    return jnp.concatenate(
        [jnp.cos(half)[..., None], jnp.sin(half)[..., None] * axis], axis=-1
    )


def euler_to_quat(euler: jnp.ndarray) -> jnp.ndarray:
    """Quaternion of ``Rz(yaw) @ Ry(pitch) @ Rx(roll)`` — the exact composition
    the reference uses for attitude updates, in quaternion space:
    ``q = qz ⊗ qy ⊗ qx``."""
    half = 0.5 * euler
    cr, sr = jnp.cos(half[..., 0]), jnp.sin(half[..., 0])
    cp, sp = jnp.cos(half[..., 1]), jnp.sin(half[..., 1])
    cy, sy = jnp.cos(half[..., 2]), jnp.sin(half[..., 2])
    return jnp.stack(
        [
            cy * cp * cr + sy * sp * sr,
            cy * cp * sr - sy * sp * cr,
            cy * sp * cr + sy * cp * sr,
            sy * cp * cr - cy * sp * sr,
        ],
        axis=-1,
    )


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v by quaternion(s) q: ``R(q) @ v``, without forming R."""
    w = q[..., 0:1]
    u = q[..., 1:4]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_inverse_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """``R(q).T @ v``."""
    return quat_rotate(quat_conj(q), v)


# --------------------------------------------------------------------------
# Axis-angle
# --------------------------------------------------------------------------


def rotmat_to_axis_angle(R: jnp.ndarray):
    """Parity: src/utils/helper_functions.py:156-174 on the generic branch,
    with safe normalization near angle ~ 0 (axis -> [1,0,0]) and a stable
    fallback near angle ~ pi (the reference's exact-equality branches)."""
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    angle = jnp.arccos(jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0))
    raw = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    nrm = jnp.linalg.norm(raw, axis=-1, keepdims=True)
    generic = raw / jnp.maximum(nrm, 1e-12)
    # angle ~ pi: raw ~ 0; recover axis from the symmetric part (diagonal of R).
    ax_sq = jnp.clip((jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1) + 1.0) * 0.5, 0.0, 1.0)
    pi_axis = jnp.sqrt(ax_sq)
    # fix signs from off-diagonals relative to the largest component
    pi_axis = pi_axis * jnp.stack(
        [
            jnp.ones_like(ax_sq[..., 0]),
            jnp.sign(R[..., 0, 1] + R[..., 1, 0] + 1e-30),
            jnp.sign(R[..., 0, 2] + R[..., 2, 0] + 1e-30),
        ],
        axis=-1,
    )
    pi_axis = pi_axis / jnp.maximum(jnp.linalg.norm(pi_axis, axis=-1, keepdims=True), 1e-12)
    near_pi = (jnp.abs(angle - jnp.pi) < 1e-4)[..., None]
    near_zero = (angle < 1e-7)[..., None]
    e0 = jnp.zeros_like(generic).at[..., 0].set(1.0)
    axis = jnp.where(near_zero, e0, jnp.where(near_pi, pi_axis, generic))
    return axis, angle


def axis_angle_to_rotmat(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues form. Parity: src/utils/helper_functions.py:177-193."""
    c = jnp.cos(angle)
    s = jnp.sin(angle)
    t = 1.0 - c
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    row0 = jnp.stack([t * x * x + c, t * x * y - s * z, t * x * z + s * y], axis=-1)
    row1 = jnp.stack([t * x * y + s * z, t * y * y + c, t * y * z - s * x], axis=-1)
    row2 = jnp.stack([t * x * z - s * y, t * y * z + s * x, t * z * z + c], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


# --------------------------------------------------------------------------
# Body-rate attitude updates (the reference's integrator core)
# --------------------------------------------------------------------------


def rotate_body_by_rates(R: jnp.ndarray, rates_deg: jnp.ndarray, dt) -> jnp.ndarray:
    """Advance attitude by body rates for one step — reference semantics.

    Parity: src/utils/kinematics.py:27-30 —
    ``R <- (E(deg2rad(rates) * dt) @ R.T).T`` = ``R @ E(rates_dt).T``.

    Args:
      R: (..., 3, 3) body-to-world rotation.
      rates_deg: (..., 3) [roll, pitch, yaw] rates in **degrees/second**.
      dt: time step (s).
    """
    rates_dt = jnp.deg2rad(rates_deg) * dt
    E = euler_to_rotmat(rates_dt)
    # (E @ R.T).T == R @ E.T ; keep the matmul order of the reference's algebra.
    return mat3_mul(R, jnp.swapaxes(E, -1, -2))


def quat_rotate_by_rates(q: jnp.ndarray, rates_deg: jnp.ndarray, dt) -> jnp.ndarray:
    """Quaternion twin of :func:`rotate_body_by_rates`.

    Composes the *identical* per-axis Euler rotation (not the SO(3) exp), so
    ``quat_to_rotmat(quat_rotate_by_rates(q, w, dt))`` equals
    ``rotate_body_by_rates(quat_to_rotmat(q), w, dt)`` to float precision:
    ``R @ E.T  <=>  q ⊗ conj(q_E)``.
    """
    rates_dt = jnp.deg2rad(rates_deg) * dt
    qE = euler_to_quat(rates_dt)
    return quat_normalize(quat_mul(q, quat_conj(qE)))


# --------------------------------------------------------------------------
# Misc geometry helpers (reference parity)
# --------------------------------------------------------------------------


def distance_point_to_plane(point: jnp.ndarray, plane: jnp.ndarray) -> jnp.ndarray:
    """|ax+by+cz+d| / ||(a,b,c)||. Parity: helper_functions.py:83-85."""
    n = plane[..., :3]
    return jnp.abs(jnp.sum(point * n, axis=-1) + plane[..., 3]) / jnp.linalg.norm(
        n, axis=-1
    )


def generate_circular_path(center, radius, resolution: int) -> jnp.ndarray:
    """Circle of `resolution` points in the z=center_z plane.

    Parity: helper_functions.py:151-153 — ``linspace(0, 2pi, n+1)[:-1]``.
    """
    theta = jnp.linspace(0.0, 2.0 * jnp.pi, resolution + 1)[:-1]
    circle = jnp.stack(
        [jnp.cos(theta) * radius, jnp.sin(theta) * radius, jnp.zeros_like(theta)],
        axis=-1,
    )
    return circle + jnp.asarray(center)
