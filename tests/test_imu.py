"""IMU preintegration tests on a synthetic sinusoidal trajectory.

Mirrors the reference's okvis_ceres/test/TestImuError.cpp scenario: generate
an analytic trajectory, sample perfect IMU at high rate, check that
preintegration + propagation reproduces the ground-truth end state, and that
the factor residual at ground truth is ~0 with sensible whitening.
"""

import jax
import jax.numpy as jnp
import numpy as np

from okvis2x_tpu.core import se3
from okvis2x_tpu.factors import imu_factor
from okvis2x_tpu.imu import preintegration as pre
import pytest

pytestmark = pytest.mark.smoke

F64 = jnp.float64
PARAMS = pre.ImuParams()


def synth_trajectory(t):
    """Analytic position + yaw trajectory; returns p_W(t), q_WS(t), v_W(t),
    omega_S(t), a_W(t)."""
    w_p = 2 * np.pi * 0.25
    p = np.stack(
        [np.sin(w_p * t), 2.0 * np.cos(w_p * t), 0.5 * np.sin(2 * w_p * t)], -1
    )
    v = np.stack(
        [
            w_p * np.cos(w_p * t),
            -2.0 * w_p * np.sin(w_p * t),
            1.0 * w_p * np.cos(2 * w_p * t),
        ],
        -1,
    )
    a = np.stack(
        [
            -w_p**2 * np.sin(w_p * t),
            -2.0 * w_p**2 * np.cos(w_p * t),
            -2.0 * w_p**2 * np.sin(2 * w_p * t),
        ],
        -1,
    )
    yaw_rate = 0.3
    yaw = yaw_rate * t
    return p, yaw, v, yaw_rate, a


def make_batch(t0, t1, rate=1000.0, bg=np.zeros(3), ba=np.zeros(3)):
    n = int((t1 - t0) * rate) + 1
    t = np.linspace(t0, t1, n)
    p, yaw, v, yaw_rate, a_W = synth_trajectory(t)
    # orientation: pure yaw
    q = np.stack(
        [np.zeros(n), np.zeros(n), np.sin(yaw / 2), np.cos(yaw / 2)], -1
    )
    g_W = np.array([0.0, 0.0, -PARAMS.g])
    # specific force in S: C_SW (a_W - g_W)
    C_WS = np.asarray(se3.quat_to_matrix(jnp.asarray(q)))
    f_S = np.einsum("nji,nj->ni", C_WS, a_W - g_W)
    omega_S = np.einsum(
        "nji,j->ni", C_WS, np.array([0.0, 0.0, yaw_rate])
    )
    batch = pre.ImuBatch(
        t=jnp.asarray(t, F64),
        gyr=jnp.asarray(omega_S + bg, F64),
        acc=jnp.asarray(f_S + ba, F64),
        mask=jnp.ones(n, bool),
    )
    states = dict(p=p, q=q, v=v)
    return batch, states


def gt_state(states, i):
    T = jnp.asarray(np.concatenate([states["p"][i], states["q"][i]]), F64)
    v = jnp.asarray(states["v"][i], F64)
    return T, v


def test_propagation_matches_ground_truth():
    batch, states = make_batch(0.0, 1.0)
    P = pre.preintegrate(
        PARAMS, batch, 0.0, 1.0, jnp.zeros(3, F64), jnp.zeros(3, F64)
    )
    T0, v0 = gt_state(states, 0)
    T1_gt, v1_gt = gt_state(states, -1)
    T1, v1 = pre.propagate_state(PARAMS, P, T0, v0, jnp.zeros(3, F64), jnp.zeros(3, F64))
    np.testing.assert_allclose(T1[:3], T1_gt[:3], atol=2e-4)
    np.testing.assert_allclose(v1, v1_gt, atol=2e-4)
    # orientation error
    dq = se3.quat_multiply(se3.quat_conjugate(se3.se3_q(T1_gt)), se3.se3_q(T1))
    assert float(jnp.linalg.norm(se3.quat_log(dq))) < 1e-4


def test_numpy_prediction_twin_matches_jax():
    """Host predict_state (preintegration_np) == preintegrate+propagate."""
    from okvis2x_tpu.imu import preintegration_np as pre_np

    batch, states = make_batch(0.0, 1.0)
    bg = jnp.asarray([0.002, -0.001, 0.0005], F64)
    ba = jnp.asarray([0.03, -0.02, 0.01], F64)
    P = pre.preintegrate(PARAMS, batch, 0.0, 1.0, bg, ba)
    T0, v0 = gt_state(states, 0)
    T1_jax, v1_jax = pre.propagate_state(PARAMS, P, T0, v0, bg, ba)
    t = np.asarray(batch.t)
    m = np.asarray(batch.mask)
    T1_np, v1_np = pre_np.predict_state(
        PARAMS, t[m], np.asarray(batch.gyr)[m], np.asarray(batch.acc)[m],
        0.0, 1.0, np.asarray(T0), np.asarray(v0), np.asarray(bg),
        np.asarray(ba),
    )
    np.testing.assert_allclose(T1_np[:3], np.asarray(T1_jax)[:3], atol=1e-9)
    np.testing.assert_allclose(v1_np, np.asarray(v1_jax), atol=1e-9)
    dq = se3.quat_multiply(
        se3.quat_conjugate(se3.se3_q(jnp.asarray(T1_np))),
        se3.se3_q(T1_jax),
    )
    assert float(jnp.linalg.norm(se3.quat_log(dq))) < 1e-9


def test_masked_padding_is_noop():
    batch, states = make_batch(0.0, 0.5)
    n = batch.t.shape[0]
    pad = 200
    batch_padded = pre.ImuBatch(
        t=jnp.concatenate([batch.t, jnp.full((pad,), 99.0, F64)]),
        gyr=jnp.concatenate([batch.gyr, jnp.full((pad, 3), 1e3, F64)]),
        acc=jnp.concatenate([batch.acc, jnp.full((pad, 3), 1e3, F64)]),
        mask=jnp.concatenate([batch.mask, jnp.zeros(pad, bool)]),
    )
    z = jnp.zeros(3, F64)
    P1 = pre.preintegrate(PARAMS, batch, 0.0, 0.5, z, z)
    P2 = pre.preintegrate(PARAMS, batch_padded, 0.0, 0.5, z, z)
    np.testing.assert_allclose(P1.dp, P2.dp, atol=1e-12)
    np.testing.assert_allclose(P1.dq, P2.dq, atol=1e-12)
    np.testing.assert_allclose(P1.P, P2.P, atol=1e-12)


def test_bias_jacobian_first_order():
    """First-order bias correction must track a re-preintegration."""
    z = jnp.zeros(3, F64)
    db = jnp.array([0.003, -0.002, 0.001], F64)
    batch, _ = make_batch(0.0, 0.8)
    P0 = pre.preintegrate(PARAMS, batch, 0.0, 0.8, z, z)
    Pg = pre.preintegrate(PARAMS, batch, 0.0, 0.8, db, z)
    Pa = pre.preintegrate(PARAMS, batch, 0.0, 0.8, z, db)
    # first-order prediction of the change
    dp_pred = P0.dp + P0.dp_dbg @ (db)
    np.testing.assert_allclose(dp_pred, Pg.dp, atol=5e-5)
    dv_pred = P0.dv + P0.dv_dbg @ db
    np.testing.assert_allclose(dv_pred, Pg.dv, atol=5e-5)
    dp_pred_a = P0.dp + P0.dp_dba @ db
    np.testing.assert_allclose(dp_pred_a, Pa.dp, atol=5e-5)
    dq_pred = se3.quat_multiply(P0.dq, se3.delta_q(P0.dq_dbg @ db))
    dqe = se3.quat_multiply(se3.quat_conjugate(Pg.dq), dq_pred)
    assert float(jnp.linalg.norm(se3.quat_log(dqe))) < 5e-6


def test_covariance_psd_and_scaling():
    z = jnp.zeros(3, F64)
    batch, _ = make_batch(0.0, 1.0, rate=200.0)
    P = pre.preintegrate(PARAMS, batch, 0.0, 1.0, z, z)
    ev = np.linalg.eigvalsh(np.asarray(P.P))
    assert ev.min() > -1e-16
    # rotational covariance over 1 s at rate 200: sigma_g^2 * 1s
    np.testing.assert_allclose(
        np.diag(np.asarray(P.P))[3:6], PARAMS.sigma_g**2, rtol=0.2
    )


def test_residual_zero_at_ground_truth():
    batch, states = make_batch(0.0, 1.0)
    z = jnp.zeros(3, F64)
    P = pre.preintegrate(PARAMS, batch, 0.0, 1.0, z, z)
    W = imu_factor.sqrt_information(P.P)
    T0, v0 = gt_state(states, 0)
    T1, v1 = gt_state(states, -1)
    sb0 = jnp.concatenate([v0, z, z])
    sb1 = jnp.concatenate([v1, z, z])
    r = imu_factor.residual(PARAMS, P, W, T0, sb0, T1, sb1)
    # whitened residual should be far below 1-sigma given perfect data
    assert float(jnp.max(jnp.abs(r))) < 0.5


def test_residual_jacobian_finite_diff():
    batch, states = make_batch(0.0, 0.4, rate=400.0)
    z = jnp.zeros(3, F64)
    P = pre.preintegrate(PARAMS, batch, 0.0, 0.4, z, z)
    W = imu_factor.sqrt_information(P.P)
    T0, v0 = gt_state(states, 0)
    T1, v1 = gt_state(states, -1)
    sb0 = jnp.concatenate([v0, z, z]) + 0.01
    sb1 = jnp.concatenate([v1, z, z]) - 0.01

    def f(d0, dsb0, d1, dsb1):
        return imu_factor.residual_on_manifold(
            PARAMS, P, W, T0, sb0, T1, sb1, d0, dsb0, d1, dsb1
        )

    z6, z9 = jnp.zeros(6, F64), jnp.zeros(9, F64)
    J = jax.jacfwd(f, argnums=(0, 1, 2, 3))(z6, z9, z6, z9)
    eps = 1e-6
    for ai, dim in [(0, 6), (1, 9), (2, 6), (3, 9)]:
        for i in range(dim):
            args = [np.zeros(6), np.zeros(9), np.zeros(6), np.zeros(9)]
            args[ai][i] = eps
            rp = np.asarray(f(*[jnp.asarray(a) for a in args]))
            args[ai][i] = -eps
            rm = np.asarray(f(*[jnp.asarray(a) for a in args]))
            num = (rp - rm) / (2 * eps)
            col = np.asarray(J[ai])[:, i]
            # tolerance scaled by the column magnitude: the whitening (sqrt
            # information ~1e4-1e5 for sub-second perfect preintegration)
            # amplifies finite-difference cancellation noise on the tiny
            # cross-coupling entries
            tol = 1e-5 * (1.0 + np.abs(col).max())
            np.testing.assert_allclose(col, num, atol=tol)


def test_numpy_full_preintegration_matches_jax():
    """Host preintegrate_full == device preintegrate (deltas, Jacobians,
    covariance) — the chained-link cache and the fused GPS spans must be
    interchangeable."""
    from okvis2x_tpu.imu import preintegration_np as pre_np

    batch, _ = make_batch(0.0, 0.8, rate=200.0)
    bg = jnp.asarray([0.004, -0.002, 0.001], F64)
    ba = jnp.asarray([0.05, -0.03, 0.02], F64)
    P_jax = pre.preintegrate(PARAMS, batch, 0.0, 0.8, bg, ba)
    m = np.asarray(batch.mask)
    P_np = pre_np.preintegrate_full(
        PARAMS, np.asarray(batch.t)[m], np.asarray(batch.gyr)[m],
        np.asarray(batch.acc)[m], 0.0, 0.8, np.asarray(bg), np.asarray(ba),
    )
    for fld in pre.Preintegrated._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(P_np, fld)), np.asarray(getattr(P_jax, fld)),
            atol=1e-9, err_msg=fld,
        )


def test_chained_compose_matches_from_raw():
    """Property: composing per-segment preintegrations (≙ ImuError::append)
    reproduces the from-raw preintegration of the merged span — including
    under differing per-segment bias linearisation points (the lazy-redo
    scenario) and for multi-hop chains."""
    from okvis2x_tpu.imu import preintegration_np as pre_np

    batch, _ = make_batch(0.0, 2.0, rate=200.0)
    t = np.asarray(batch.t)
    gyr = np.asarray(batch.gyr)
    acc = np.asarray(batch.acc)
    bg = np.array([0.004, -0.002, 0.001])
    ba = np.array([0.05, -0.03, 0.02])

    full = pre_np.preintegrate_full(PARAMS, t, gyr, acc, 0.0, 2.0, bg, ba)

    # split at arbitrary interior samples; give each segment a slightly
    # different linearisation point (simulating bias updates between
    # segment construction times)
    cuts = [0, 97, 211, 305, len(t) - 1]
    segs = []
    rng = np.random.default_rng(3)
    for a, b in zip(cuts[:-1], cuts[1:]):
        dbg = 0.003 * rng.standard_normal(3)
        dba = 0.02 * rng.standard_normal(3)
        segs.append(
            pre_np.preintegrate_full(
                PARAMS, t[a:b + 1], gyr[a:b + 1], acc[a:b + 1],
                t[a], t[b], bg + dbg, ba + dba,
            )
        )
    chained = segs[0]
    for s in segs[1:]:
        chained = pre_np.compose(chained, s)
    # rebase the chain head to the reference bias for comparison
    dbg0 = bg - chained.lin_bg
    dba0 = ba - chained.lin_ba
    dp = chained.dp + chained.dp_dbg @ dbg0 + chained.dp_dba @ dba0
    dv = chained.dv + chained.dv_dbg @ dbg0 + chained.dv_dba @ dba0
    from okvis2x_tpu.core import se3np
    dq = se3np.quat_multiply(
        chained.dq, se3np.delta_q(chained.dq_dbg @ dbg0))

    # residual error is second order in the per-segment bias offsets
    np.testing.assert_allclose(dp, full.dp, atol=5e-3)
    np.testing.assert_allclose(dv, full.dv, atol=2e-3)
    dqe = se3np.quat_multiply(se3np.quat_conjugate(dq), full.dq)
    assert np.linalg.norm(se3np.quat_log(dqe)) < 5e-4
    assert abs(chained.dt - full.dt) < 1e-9
    # covariance and bias Jacobians match to first order
    scale = np.abs(full.P).max()
    np.testing.assert_allclose(chained.P, full.P, atol=2e-2 * scale)
    for fld in ("dp_dbg", "dp_dba", "dv_dbg", "dv_dba", "dq_dbg"):
        a_ = np.asarray(getattr(chained, fld))
        b_ = np.asarray(getattr(full, fld))
        np.testing.assert_allclose(
            a_, b_, atol=2e-2 * max(np.abs(b_).max(), 1e-9), err_msg=fld)


def test_host_sqrt_information_matches_jax():
    from okvis2x_tpu.imu import preintegration_np as pre_np

    batch, _ = make_batch(0.0, 0.5, rate=200.0)
    P = pre.preintegrate(
        PARAMS, batch, 0.0, 0.5, jnp.zeros(3, F64), jnp.zeros(3, F64))
    W_jax = np.asarray(imu_factor.sqrt_information(P.P))
    W_np = pre_np.sqrt_information(np.asarray(P.P))
    # both satisfy W^T W == P^-1
    np.testing.assert_allclose(
        W_np.T @ W_np, W_jax.T @ W_jax, rtol=1e-6)
