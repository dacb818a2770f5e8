"""NumPy twin of the IMU prediction path (imu/preintegration.py).

Per-frame state *prediction* in `SlidingWindowEstimator.add_state` only
needs dq/dp/dv over the ~10-20 samples between two frames — two device
program executions (~22 ms fixed cost each on the remote TPU runtime) for
microseconds of math.  This twin runs the same midpoint integration on the
host (mirrors ImuError::propagation, okvis_ceres/src/ImuError.cpp:537;
property-tested against the jax implementation in tests/test_imu.py).

Covariances/bias Jacobians for the *factors* stay on device in the batched
vmapped program — only the cheap prediction moved here.
"""

from __future__ import annotations

import numpy as np

from okvis2x_tpu.core import se3np


def predict_state(
    params,
    t: np.ndarray,  # (n,) sample times covering [t0, t1]
    gyr: np.ndarray,  # (n, 3)
    acc: np.ndarray,  # (n, 3)
    t0: float,
    t1: float,
    T_WS0: np.ndarray,  # (7,)
    v_W0: np.ndarray,  # (3,)
    bg: np.ndarray,
    ba: np.ndarray,
):
    """Returns (T_WS1 (7,), v_W1 (3,)): midpoint-integrated prediction."""
    ta = np.clip(t[:-1], t0, t1)
    tb = np.clip(t[1:], t0, t1)
    dts = np.maximum(tb - ta, 0.0)
    g0 = gyr[:-1] - bg
    g1 = gyr[1:] - bg
    a0 = acc[:-1] - ba
    a1 = acc[1:] - ba

    dq = np.array([0.0, 0.0, 0.0, 1.0])
    dp = np.zeros(3)
    dv = np.zeros(3)
    for k in range(len(dts)):
        dt = dts[k]
        if dt <= 0.0:
            continue
        omega = 0.5 * (g0[k] + g1[k])
        dq_step = se3np.delta_q(omega * dt)
        dq_new = se3np.quat_normalize(se3np.quat_multiply(dq, dq_step))
        C0 = se3np.quat_to_matrix(dq)
        C1 = se3np.quat_to_matrix(dq_new)
        acc_S0 = 0.5 * (C0 @ a0[k] + C1 @ a1[k])
        dp = dp + dv * dt + 0.5 * acc_S0 * dt * dt
        dv = dv + acc_S0 * dt
        dq = dq_new

    g_W = np.array([0.0, 0.0, -params.g])
    C_WS0 = se3np.quat_to_matrix(T_WS0[3:7])
    dt_tot = float(dts.sum())
    t1_W = T_WS0[:3] + v_W0 * dt_tot + 0.5 * g_W * dt_tot**2 + C_WS0 @ dp
    v1_W = v_W0 + g_W * dt_tot + C_WS0 @ dv
    q1 = se3np.quat_normalize(se3np.quat_multiply(T_WS0[3:7], dq))
    return np.concatenate([t1_W, q1]), v1_W
