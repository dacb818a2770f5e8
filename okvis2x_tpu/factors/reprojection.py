"""Reprojection factor.

Replaces the reference's `ceres::ReprojectionError<GEOMETRY>` (okvis_ceres/
include/okvis/ceres/implementation/ReprojectionError.hpp:71).  Residual:

    r = sqrt_info * ( z - h( T_SC^-1 T_WS^-1 hp_W ) )        (2-dim)

parameterised by minimal increments (dpose 6, dhp 3 (homogeneous-point
3-dof tangent: perturb the xyz part, w fixed), dext 6).  Jacobians are taken
by autodiff through `se3.retract`, which reproduces the reference's
minimal-Jacobian convention exactly (verified by finite differences in
tests/test_factors.py).

All functions are single-observation; the solver vmaps them over the
observation table.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from okvis2x_tpu.cameras import pinhole
from okvis2x_tpu.core import se3


def residual(
    cam: pinhole.Camera,
    T_WS: jax.Array,
    T_SC: jax.Array,
    hp_W: jax.Array,
    uv_meas: jax.Array,
    sqrt_info: jax.Array,  # scalar or (2,2)
):
    """Whitened reprojection residual + validity."""
    T_CW = se3.se3_multiply(se3.se3_inverse(T_SC), se3.se3_inverse(T_WS))
    hp_C = se3.se3_apply_homogeneous(T_CW, hp_W)
    uv, valid = pinhole.project_homogeneous(cam, hp_C)
    r = uv_meas - uv
    if sqrt_info.ndim == 2:
        r = sqrt_info @ r
    else:
        r = sqrt_info * r
    # behind-camera / out-of-domain: zero residual, zero gradient (masked)
    r = jnp.where(valid, r, jnp.zeros_like(r))
    return r, valid


def residual_on_manifold(
    cam: pinhole.Camera,
    T_WS: jax.Array,
    T_SC: jax.Array,
    hp_W: jax.Array,
    uv_meas: jax.Array,
    sqrt_info: jax.Array,
    dpose: jax.Array,
    dhp: jax.Array,
    dext: jax.Array,
):
    """Residual as a function of minimal increments (for autodiff at 0)."""
    T_WS_p = se3.retract(T_WS, dpose)
    T_SC_p = se3.retract(T_SC, dext)
    hp_p = hp_W.at[:3].add(dhp)
    return residual(cam, T_WS_p, T_SC_p, hp_p, uv_meas, sqrt_info)[0]


def linearize(cam, T_WS, T_SC, hp_W, uv_meas, sqrt_info):
    """Return (r, J_pose (2,6), J_hp (2,3), J_ext (2,6), valid)."""
    z6 = jnp.zeros(6, dtype=T_WS.dtype)
    z3 = jnp.zeros(3, dtype=T_WS.dtype)

    def f(dpose, dhp, dext):
        return residual_on_manifold(
            cam, T_WS, T_SC, hp_W, uv_meas, sqrt_info, dpose, dhp, dext
        )

    r, valid = residual(cam, T_WS, T_SC, hp_W, uv_meas, sqrt_info)
    Jp, Jh, Je = jax.jacfwd(f, argnums=(0, 1, 2))(z6, z3, z6)
    return r, Jp, Jh, Je, valid
