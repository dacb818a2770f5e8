"""Lens distortion models.

Functional, batch-first replacements for the reference's distortion classes
(okvis_cv/include/okvis/cameras/implementation/{RadialTangentialDistortion,
RadialTangentialDistortion8,EquidistantDistortion,NoDistortion}.hpp).

Each model is a pair of pure functions on normalised image coordinates:

    distort(params, xy)   -> distorted xy            (used in projection)
    undistort(params, xy) -> undistorted xy          (fixed-count Newton solve)

`distort` is differentiated by autodiff inside the factors; `undistort` uses a
fixed-iteration Newton loop (static shapes, jit/vmap-safe) with an analytic
2x2 Jacobian obtained from `jax.jacfwd`, matching the reference's iterative
inverse but without data-dependent termination.

Parameter layouts (trailing axis of `params`):
    radtan   : [k1, k2, p1, p2]
    radtan8  : [k1, k2, p1, p2, k3, k4, k5, k6]
    equidistant : [k1, k2, k3, k4]
    none     : [] (zero-length)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

RADTAN = "radtan"
RADTAN8 = "radtan8"
EQUIDISTANT = "equidistant"
NONE = "none"

NUM_PARAMS = {RADTAN: 4, RADTAN8: 8, EQUIDISTANT: 4, NONE: 0}

_UNDISTORT_ITERS = 7


# -- forward models ---------------------------------------------------------


def _distort_radtan(params: jax.Array, xy: jax.Array) -> jax.Array:
    k1, k2, p1, p2 = params[..., 0], params[..., 1], params[..., 2], params[..., 3]
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + k1 * r2 + k2 * r2 * r2
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + 2.0 * p2 * x * y + p1 * (r2 + 2.0 * y * y)
    return jnp.stack([xd, yd], axis=-1)


def _distort_radtan8(params: jax.Array, xy: jax.Array) -> jax.Array:
    k1, k2, p1, p2 = params[..., 0], params[..., 1], params[..., 2], params[..., 3]
    k3, k4, k5, k6 = params[..., 4], params[..., 5], params[..., 6], params[..., 7]
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    r4 = r2 * r2
    r6 = r4 * r2
    radial = (1.0 + k1 * r2 + k2 * r4 + k3 * r6) / (1.0 + k4 * r2 + k5 * r4 + k6 * r6)
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + 2.0 * p2 * x * y + p1 * (r2 + 2.0 * y * y)
    return jnp.stack([xd, yd], axis=-1)


def _distort_equidistant(params: jax.Array, xy: jax.Array) -> jax.Array:
    k1, k2, k3, k4 = params[..., 0], params[..., 1], params[..., 2], params[..., 3]
    x, y = xy[..., 0], xy[..., 1]
    r = jnp.sqrt(jnp.maximum(x * x + y * y, 1e-24))
    theta = jnp.arctan(r)
    t2 = theta * theta
    theta_d = theta * (1.0 + k1 * t2 + k2 * t2**2 + k3 * t2**3 + k4 * t2**4)
    scale = jnp.where(r > 1e-8, theta_d / r, 1.0)
    return xy * scale[..., None]


def _distort_none(params: jax.Array, xy: jax.Array) -> jax.Array:
    del params
    return xy


_DISTORT = {
    RADTAN: _distort_radtan,
    RADTAN8: _distort_radtan8,
    EQUIDISTANT: _distort_equidistant,
    NONE: _distort_none,
}


def distort(model: str, params: jax.Array, xy: jax.Array) -> jax.Array:
    """Apply the distortion model to normalised coordinates, shape (..., 2)."""
    return _DISTORT[model](params, xy)


def undistort(model: str, params: jax.Array, xy_d: jax.Array) -> jax.Array:
    """Invert `distort` by a fixed-count Newton iteration (jit/vmap-safe).

    The reference uses the same Gauss-Newton inverse with a convergence check
    (implementation/RadialTangentialDistortion.hpp undistort); here the
    iteration count is static for XLA.
    """
    if model == NONE:
        return xy_d

    fwd = _DISTORT[model]

    def body(_, xy):
        # Solve fwd(xy) = xy_d ; one Newton step on a per-point 2x2 system.
        # The distortion is pointwise, so jvp with broadcast basis tangents
        # yields the per-point Jacobian columns for any batch shape.
        f = lambda p: fwd(params, p)
        e0 = jnp.zeros_like(xy).at[..., 0].set(1.0)
        e1 = jnp.zeros_like(xy).at[..., 1].set(1.0)
        val, Jc0 = jax.jvp(f, (xy,), (e0,))
        _, Jc1 = jax.jvp(f, (xy,), (e1,))
        r = val - xy_d
        a, b = Jc0[..., 0], Jc1[..., 0]
        c, d = Jc0[..., 1], Jc1[..., 1]
        det = a * d - b * c
        det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
        dx = (d * r[..., 0] - b * r[..., 1]) / det
        dy = (-c * r[..., 0] + a * r[..., 1]) / det
        return xy - jnp.stack([dx, dy], axis=-1)

    return jax.lax.fori_loop(0, _UNDISTORT_ITERS, body, xy_d)
