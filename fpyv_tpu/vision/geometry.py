"""Geometry algorithms: epipolar, multilateration, ICP, sphere sampling.

Counterparts of the reference's vision/geometry experiment scripts — which
are explicitly untested GPT sketches (tests/eight_point_algorithm.py:1 "made
by GPT chatbot. Please test this code before using it") — implemented
*correctly* here and unit-tested:

- :func:`eight_point` — normalized 8-point fundamental matrix (Hartley
  normalization + rank-2 enforcement). The reference's A-matrix construction
  (eight_point_algorithm.py:20-23) is not the epipolar constraint; this is.
- :func:`triangulate` — DLT two-view triangulation.
- :func:`trilaterate_gd` — range-only positioning by gradient descent (the
  working shape of tests/positioning.py:28-51, with the standard MSE
  gradient instead of its exp-weighted experiment).
- :func:`trilaterate_gauss_newton` — the fast correct solver for the same
  problem (UWB-style multilateration).
- :func:`icp_2d` — 2D iterative closest point with brute-force
  correspondences and Procrustes updates (tests/icp_test01.py capability,
  minus the removed-OpenCV dependency that bitrotted it).
- :func:`random_points_on_sphere` — uniform sphere sampling
  (tests/monte_carlo_search.py:16-24, normal_sampling_visualization.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _normalize_points(pts):
    """Hartley normalization: zero-mean, mean distance sqrt(2)."""
    mean = jnp.mean(pts, axis=0)
    centered = pts - mean
    scale = jnp.sqrt(2.0) / jnp.maximum(
        jnp.mean(jnp.linalg.norm(centered, axis=1)), 1e-12)
    T = jnp.array(
        [[scale, 0.0, -scale * mean[0]],
         [0.0, scale, -scale * mean[1]],
         [0.0, 0.0, 1.0]], pts.dtype)
    homog = jnp.concatenate([pts, jnp.ones_like(pts[:, :1])], axis=1)
    return homog @ T.T, T


def eight_point(points1: jnp.ndarray, points2: jnp.ndarray) -> jnp.ndarray:
    """Fundamental matrix from N>=8 correspondences, x2ᵀ F x1 = 0.

    points1, points2: (N, 2) pixel coordinates. Returns (3, 3) F with
    ||F|| = 1 and rank 2.
    """
    p1, T1 = _normalize_points(points1)
    p2, T2 = _normalize_points(points2)
    x1, y1 = p1[:, 0], p1[:, 1]
    x2, y2 = p2[:, 0], p2[:, 1]
    A = jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1,
         jnp.ones_like(x1)], axis=1)
    _, _, Vt = jnp.linalg.svd(A)
    F = Vt[-1].reshape(3, 3)
    U, S, Vt2 = jnp.linalg.svd(F)
    F = (U * S.at[2].set(0.0)[None, :]) @ Vt2  # rank-2 enforcement
    F = T2.T @ F @ T1  # unnormalize
    return F / jnp.maximum(jnp.linalg.norm(F), 1e-12)


def epipolar_residual(F, points1, points2):
    """|x2ᵀ F x1| per correspondence (algebraic error)."""
    h1 = jnp.concatenate([points1, jnp.ones_like(points1[:, :1])], axis=1)
    h2 = jnp.concatenate([points2, jnp.ones_like(points2[:, :1])], axis=1)
    return jnp.abs(jnp.sum(h2 * (h1 @ F.T), axis=1))


def triangulate(P1, P2, pts1, pts2):
    """DLT triangulation: projection matrices (3,4) + (N,2) pixels -> (N,3)."""

    def one(x1, x2):
        A = jnp.stack([
            x1[0] * P1[2] - P1[0],
            x1[1] * P1[2] - P1[1],
            x2[0] * P2[2] - P2[0],
            x2[1] * P2[2] - P2[1],
        ])
        _, _, Vt = jnp.linalg.svd(A)
        X = Vt[-1]
        return X[:3] / X[3]

    return jax.vmap(one)(pts1, pts2)


# ---------------------------------------------------------------------------
# Range-only positioning (UWB multilateration)
# ---------------------------------------------------------------------------


def trilaterate_gd(anchors, ranges, x0=None, learning_rate: float = 5e-3,
                   iterations: int = 2000):
    """Gradient descent on sum((||a_i - x|| - r_i)²) — the working form of
    tests/positioning.py's iterative approach."""
    anchors = jnp.asarray(anchors)
    ranges = jnp.asarray(ranges)
    x0 = jnp.zeros(anchors.shape[-1], anchors.dtype) if x0 is None else x0

    def loss(x):
        d = jnp.linalg.norm(anchors - x, axis=-1)
        return jnp.sum((d - ranges) ** 2)

    grad = jax.grad(loss)

    def body(x, _):
        return x - learning_rate * grad(x), None

    x, _ = jax.lax.scan(body, x0, None, length=iterations)
    return x


def trilaterate_gauss_newton(anchors, ranges, x0=None, iterations: int = 20):
    """Gauss-Newton on the range residuals; converges in a few steps."""
    anchors = jnp.asarray(anchors)
    ranges = jnp.asarray(ranges)
    x0 = jnp.mean(anchors, axis=0) if x0 is None else x0

    def body(x, _):
        diff = x - anchors  # (N, D)
        d = jnp.maximum(jnp.linalg.norm(diff, axis=-1), 1e-9)
        r = d - ranges  # residuals
        J = diff / d[:, None]  # Jacobian of d wrt x
        JtJ = J.T @ J + 1e-9 * jnp.eye(x.shape[0], dtype=x.dtype)
        step = jnp.linalg.solve(JtJ, J.T @ r)
        return x - step, None

    x, _ = jax.lax.scan(body, x0, None, length=iterations)
    return x


# ---------------------------------------------------------------------------
# 2D ICP
# ---------------------------------------------------------------------------


def icp_2d(source, target, iterations: int = 20):
    """Rigid 2D ICP: returns (R (2,2), t (2,), rmse) aligning source→target.

    Brute-force nearest neighbors (fine for the experiment-scale clouds the
    reference used) + closed-form Procrustes per iteration.
    """
    source = jnp.asarray(source)
    target = jnp.asarray(target)

    def body(carry, _):
        R, t = carry
        moved = source @ R.T + t
        d2 = jnp.sum(
            (moved[:, None, :] - target[None, :, :]) ** 2, axis=-1)
        nn = jnp.argmin(d2, axis=1)
        matched = target[nn]
        mu_s = jnp.mean(moved, axis=0)
        mu_t = jnp.mean(matched, axis=0)
        H = (moved - mu_s).T @ (matched - mu_t)
        U, _, Vt = jnp.linalg.svd(H)
        d = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
        D = jnp.diag(jnp.array([1.0, d], H.dtype))
        R_step = Vt.T @ D @ U.T
        t_step = mu_t - R_step @ mu_s
        return (R_step @ R, R_step @ t + t_step), None

    eye = jnp.eye(2, dtype=source.dtype)
    (R, t), _ = jax.lax.scan(body, (eye, jnp.zeros(2, source.dtype)),
                             None, length=iterations)
    moved = source @ R.T + t
    d2 = jnp.sum((moved[:, None, :] - target[None, :, :]) ** 2, axis=-1)
    rmse = jnp.sqrt(jnp.mean(jnp.min(d2, axis=1)))
    return R, t, rmse


def random_points_on_sphere(key, n_points: int, dim: int = 3,
                            dtype=jnp.float32):
    """Uniform points on the unit sphere (monte_carlo_search.py:16-24)."""
    x = jax.random.normal(key, (n_points, dim), dtype)
    return x / jnp.maximum(jnp.linalg.norm(x, axis=1, keepdims=True), 1e-12)
