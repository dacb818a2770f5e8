"""Preintegrated IMU factor between two states.

Replaces the reference's `ceres::ImuError` Evaluate path (okvis_ceres/src/
ImuError.cpp — residual assembly after preintegration).  Residual (15-dim,
ordering [dp, dalpha, dv, dbg, dba], whitened by the sqrt information of the
preintegration covariance):

    r_dp     = C_WS0^T (t1 - t0 - v0 dt - 1/2 g dt^2) - dp_hat(b0)
    r_dalpha = 2 * vec( dq_hat(b0)^-1 ⊗ q0^-1 ⊗ q1 )
    r_dv     = C_WS0^T (v1 - v0 - g dt) - dv_hat(b0)
    r_dbg    = bg1 - bg0
    r_dba    = ba1 - ba0

with dp_hat/dv_hat/dq_hat the first-order bias-corrected preintegrated
quantities.  A `PseudoImuError`-style constant-velocity fallback is provided
for IMU-less operation (reference ImuError.hpp:313).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from okvis2x_tpu.core import se3
from okvis2x_tpu.imu.preintegration import ImuParams, Preintegrated


def sqrt_information(P: jax.Array, eps: float = 1e-10) -> jax.Array:
    """Upper-triangular sqrt information W with W^T W = P^-1 (via Cholesky of
    the regularised covariance; mirrors the reference's
    squareRootInformation computation)."""
    n = P.shape[-1]
    Preg = 0.5 * (P + P.T) + eps * jnp.eye(n, dtype=P.dtype)
    L = jnp.linalg.cholesky(Preg)  # P = L L^T
    # W = L^-1  =>  W^T W = P^-1
    W = jax.scipy.linalg.solve_triangular(L, jnp.eye(n, dtype=P.dtype), lower=True)
    return W


def residual(
    params: ImuParams,
    pre: Preintegrated,
    sqrt_info: jax.Array,  # (15,15), precomputed from pre.P
    T_WS0: jax.Array,
    sb0: jax.Array,  # (9,) [v_W, b_g, b_a]
    T_WS1: jax.Array,
    sb1: jax.Array,
):
    dtype = T_WS0.dtype
    v0, bg0, ba0 = sb0[0:3], sb0[3:6], sb0[6:9]
    v1, bg1, ba1 = sb1[0:3], sb1[3:6], sb1[6:9]

    dbg = bg0 - pre.lin_bg
    dba = ba0 - pre.lin_ba
    dp_hat = pre.dp + pre.dp_dbg @ dbg + pre.dp_dba @ dba
    dv_hat = pre.dv + pre.dv_dbg @ dbg + pre.dv_dba @ dba
    dq_hat = se3.quat_multiply(pre.dq, se3.delta_q(pre.dq_dbg @ dbg))

    g_W = jnp.array([0.0, 0.0, -params.g], dtype=dtype)
    dt = pre.dt
    q0 = se3.se3_q(T_WS0)
    C0T = se3.quat_to_matrix(q0).T
    t0 = se3.se3_t(T_WS0)
    t1 = se3.se3_t(T_WS1)

    r_dp = C0T @ (t1 - t0 - v0 * dt - 0.5 * g_W * dt * dt) - dp_hat
    q_rel = se3.quat_multiply(se3.quat_conjugate(q0), se3.se3_q(T_WS1))
    q_err = se3.quat_multiply(se3.quat_conjugate(dq_hat), q_rel)
    r_dalpha = se3.quat_log(q_err)
    r_dv = C0T @ (v1 - v0 - g_W * dt) - dv_hat
    r_bg = bg1 - bg0
    r_ba = ba1 - ba0

    r = jnp.concatenate([r_dp, r_dalpha, r_dv, r_bg, r_ba])
    return sqrt_info @ r


def residual_on_manifold(
    params, pre, sqrt_info, T_WS0, sb0, T_WS1, sb1, d0, dsb0, d1, dsb1
):
    """Residual as a function of minimal increments (autodiff at 0)."""
    return residual(
        params,
        pre,
        sqrt_info,
        se3.retract(T_WS0, d0),
        sb0 + dsb0,
        se3.retract(T_WS1, d1),
        sb1 + dsb1,
    )


# -- constant-velocity pseudo-IMU (no-IMU operation) ------------------------


def pseudo_residual(sigma_v, sigma_q, dt, T_WS0, sb0, T_WS1, sb1):
    """Weak constant-velocity + constant-pose-rate prior (reference
    PseudoImuError)."""
    d = se3.local_delta(T_WS0, T_WS1)
    r_pose = d / (sigma_q * jnp.maximum(dt, 1e-3))
    r_sb = (sb1 - sb0) / sigma_v
    return jnp.concatenate([r_pose, r_sb])
