"""GNSS position factors.

Replaces the reference's `ceres::GpsErrorAsynchronous` / `GpsErrorSynchronous`
(okvis_ceres/src/GpsErrorAsynchronous.cpp, GpsErrorSynchronous.cpp): a GPS
position measurement p_G (in the GPS/geodetic-local frame G) constrains the
host state through the 4-dof world-to-GPS alignment T_GW (position + yaw —
roll/pitch are gravity-observable, reference PoseManifold4d,
okvis_ceres/include/okvis/ceres/PoseLocalParameterization.hpp:200):

    r = sqrt_info * ( p_meas_G - T_GW * (p_WS(t_g) + C_WS(t_g) r_SA) )

For asynchronous measurements, the state at measurement time t_g comes from
IMU preintegration from the host state (the factor owns its preintegration,
like the reference's cache) — here the same `Preintegrated` pytree used by
the IMU factor, reused verbatim.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from okvis2x_tpu.core import se3
from okvis2x_tpu.imu.preintegration import ImuParams, Preintegrated, propagate_state


def retract_4dof(T_GW: jax.Array, d4: jax.Array) -> jax.Array:
    """Position + yaw boxplus for the alignment frame."""
    t = T_GW[:3] + d4[:3]
    dyaw = jnp.concatenate([jnp.zeros(2, d4.dtype), d4[3:4]])
    q = se3.quat_normalize(se3.quat_multiply(se3.delta_q(dyaw), T_GW[3:7]))
    return jnp.concatenate([t, q])


def residual_sync(
    T_GW: jax.Array,  # (7,)
    T_WS: jax.Array,  # (7,)
    p_meas_G: jax.Array,  # (3,)
    r_SA: jax.Array,  # (3,) antenna offset in S
    sqrt_info: jax.Array,  # (3, 3)
):
    p_W = se3.se3_t(T_WS) + se3.quat_rotate(se3.se3_q(T_WS), r_SA)
    p_G = se3.se3_apply(T_GW, p_W)
    return sqrt_info @ (p_meas_G - p_G)


def residual_async(
    params: ImuParams,
    pre: Preintegrated,  # preintegration host-state -> measurement time
    T_GW: jax.Array,
    T_WS: jax.Array,  # host state
    sb: jax.Array,  # (9,)
    p_meas_G: jax.Array,
    r_SA: jax.Array,
    sqrt_info: jax.Array,
):
    """Asynchronous factor: propagate the host state to t_g first
    (≙ GpsErrorAsynchronous::Evaluate re-propagation)."""
    T_t, _ = propagate_state(params, pre, T_WS, sb[0:3], sb[3:6], sb[6:9])
    return residual_sync(T_GW, T_t, p_meas_G, r_SA, sqrt_info)


def residual_async_on_manifold(
    params, pre, T_GW, T_WS, sb, p_meas_G, r_SA, sqrt_info,
    dpose, dsb, d4,
):
    return residual_async(
        params, pre, retract_4dof(T_GW, d4), se3.retract(T_WS, dpose),
        sb + dsb, p_meas_G, r_SA, sqrt_info,
    )
