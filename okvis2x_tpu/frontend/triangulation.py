"""Two-view triangulation (batched).

Replaces the reference's `triangulateFast` (okvis_frontend/src/
stereo_triangulation.cpp:42-117): closed-form midpoint triangulation of two
rays with degeneracy flags, vectorised over keypoint pairs.

Inputs are ray directions in a common frame A: e_A from camera centre p_A,
e_B from p_B.  Returns homogeneous points in frame A plus flags mirroring
the reference: `valid` (rays actually intersect in front) and
`parallel` (baseline/parallax degenerate — point at infinity is returned,
usable as a bearing-only landmark like the reference's w=0 handling).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Triangulation(NamedTuple):
    hp_A: jax.Array  # (..., 4) homogeneous point in frame A
    valid: jax.Array  # (...,) bool
    parallel: jax.Array  # (...,) bool


def triangulate(
    p_A: jax.Array,  # (..., 3) centre of camera A (usually 0)
    e_A: jax.Array,  # (..., 3) unit ray from A
    p_B: jax.Array,  # (..., 3) centre of camera B in A
    e_B: jax.Array,  # (..., 3) unit ray from B, expressed in A
    sigma: float = 1e-3,
) -> Triangulation:
    """Midpoint triangulation; `sigma` is the ray-angle tolerance used for
    the parallelism test (reference passes sigma-based thresholds)."""
    t = p_B - p_A
    b1 = jnp.sum(t * e_A, axis=-1)
    b2 = jnp.sum(t * e_B, axis=-1)
    c = jnp.sum(e_A * e_B, axis=-1)
    denom = 1.0 - c * c  # = sin^2(angle between rays)

    parallel = denom < (sigma * sigma)
    denom_safe = jnp.where(parallel, 1.0, denom)
    lambda_A = (b1 - b2 * c) / denom_safe
    lambda_B = (b1 * c - b2) / denom_safe

    xA = p_A + lambda_A[..., None] * e_A
    xB = p_B + lambda_B[..., None] * e_B
    mid = 0.5 * (xA + xB)

    # parallel rays: return the bearing at infinity (w = 0), like the
    # reference's isParallel branch
    bearing = 0.5 * (e_A + e_B)
    hp = jnp.where(
        parallel[..., None],
        jnp.concatenate([bearing, jnp.zeros_like(b1)[..., None]], axis=-1),
        jnp.concatenate([mid, jnp.ones_like(b1)[..., None]], axis=-1),
    )

    # validity: both depths positive (in front of both cameras) and the two
    # closest points agree reasonably
    gap = jnp.linalg.norm(xA - xB, axis=-1)
    depth_ok = (lambda_A > 0) & (lambda_B > 0)
    agree = gap < 0.1 * jnp.maximum(jnp.abs(lambda_A), 1.0)
    valid = jnp.where(parallel, True, depth_ok & agree)
    return Triangulation(hp_A=hp, valid=valid, parallel=parallel)
