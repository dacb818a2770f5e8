"""GNSS factor tests (mirrors okvis_ceres/test/TestGpsError.cpp intent):
residual zero at ground truth, Jacobians vs finite differences, and
estimator-style alignment recovery of the 4-dof T_GW."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from okvis2x_tpu.core import se3
from okvis2x_tpu.factors import gps
from okvis2x_tpu.imu.preintegration import ImuParams
from okvis2x_tpu.solver import gauss_newton as gn
from okvis2x_tpu.solver import problem as prb
from okvis2x_tpu.solver.problem import _empty_pre

F64 = jnp.float64
PARAMS = ImuParams()


def make_tgw():
    q = se3.delta_q(jnp.asarray([0.0, 0.0, 0.7], F64))  # yaw-only
    return jnp.concatenate([jnp.asarray([10.0, -5.0, 2.0], F64), q])


def test_residual_zero_at_truth_sync():
    T_GW = make_tgw()
    T_WS = se3.random_se3(jax.random.PRNGKey(1), dtype=F64)
    r_SA = jnp.asarray([0.1, 0.0, 0.05], F64)
    p_W = se3.se3_t(T_WS) + se3.quat_rotate(se3.se3_q(T_WS), r_SA)
    p_G = se3.se3_apply(T_GW, p_W)
    r = gps.residual_sync(T_GW, T_WS, p_G, r_SA, jnp.eye(3, dtype=F64))
    np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-12)


def test_retract_4dof_yaw_only():
    T_GW = make_tgw()
    d = jnp.asarray([0.1, -0.2, 0.3, 0.05], F64)
    T2 = gps.retract_4dof(T_GW, d)
    np.testing.assert_allclose(np.asarray(T2[:3] - T_GW[:3]), np.asarray(d[:3]))
    # rotation stays yaw-only
    C = np.asarray(se3.quat_to_matrix(T2[3:7]))
    np.testing.assert_allclose(C[2, 2], 1.0, atol=1e-12)


def test_async_jacobians_finite_diff():
    T_GW = make_tgw()
    T_WS = se3.random_se3(jax.random.PRNGKey(2), dtype=F64)
    sb = jnp.asarray(np.concatenate([[0.3, -0.1, 0.05], 1e-3 * np.ones(6)]), F64)
    pre = jax.tree.map(lambda x: x[0], _empty_pre(1, F64))
    pre = pre._replace(dt=jnp.asarray(0.05, F64))
    r_SA = jnp.asarray([0.1, 0.0, 0.05], F64)
    p_G = jnp.asarray([9.0, -4.0, 2.5], F64)
    si = jnp.eye(3, dtype=F64) / 0.05

    def f(dpose, dsb, d4):
        return gps.residual_async_on_manifold(
            PARAMS, pre, T_GW, T_WS, sb, p_G, r_SA, si, dpose, dsb, d4
        )

    z6, z9, z4 = jnp.zeros(6, F64), jnp.zeros(9, F64), jnp.zeros(4, F64)
    J = jax.jacfwd(f, argnums=(0, 1, 2))(z6, z9, z4)
    eps = 1e-7
    for ai, dim in [(0, 6), (1, 9), (2, 4)]:
        for i in range(dim):
            args = [np.zeros(6), np.zeros(9), np.zeros(4)]
            args[ai][i] = eps
            rp = np.asarray(f(*[jnp.asarray(a) for a in args]))
            args[ai][i] = -eps
            rm = np.asarray(f(*[jnp.asarray(a) for a in args]))
            num = (rp - rm) / (2 * eps)
            np.testing.assert_allclose(
                np.asarray(J[ai])[:, i], num, atol=1e-4
            )


def test_solver_recovers_tgw_alignment():
    """Frames on a trajectory + GPS fixes: solving for the free 4-dof T_GW
    must recover the true alignment (≙ ViSlamBackend::attemptFullGpsAlignment
    outcome)."""
    K = 4
    T_GW_true = make_tgw()
    rng = np.random.default_rng(4)
    p = prb.empty_problem(K=K, L=1, C=1, N=1, M=1, R=1, G=K, dtype=F64)

    T_WS = np.zeros((K, 7))
    T_WS[:, 6] = 1
    T_WS[:, 0] = np.arange(K) * 1.0
    T_WS[:, 1] = np.arange(K) * 0.3
    p_G = np.zeros((K, 3))
    for k in range(K):
        p_G[k] = np.asarray(
            se3.se3_apply(T_GW_true, jnp.asarray(T_WS[k, :3], F64))
        ) + rng.normal(0, 0.01, 3)

    pre = p.gps_pre  # zero-dt preintegrations -> synchronous behaviour
    p = p._replace(
        T_WS=jnp.asarray(T_WS, F64),
        frame_valid=jnp.ones(K, bool),
        pose_fixed=jnp.ones(K, bool),  # states known; only T_GW free
        sb_fixed=jnp.ones(K, bool),
        T_GW=gps.retract_4dof(T_GW_true, jnp.asarray([0.5, -0.4, 0.3, 0.1], F64)),
        tgw_fixed=jnp.asarray(False),
        gps_frame=jnp.arange(K, dtype=jnp.int32),
        gps_p_G=jnp.asarray(p_G, F64),
        gps_sqrt_info=jnp.tile(jnp.eye(3, dtype=F64) / 0.01, (K, 1, 1)),
        gps_valid=jnp.ones(K, bool),
    )
    from okvis2x_tpu.cameras import pinhole

    cam = pinhole.make_pinhole(1.0, 1.0, 0, 0, 2, 2, model="none", dtype=F64)
    cams = gn.stack_cameras([cam])
    cfg = gn.SolverConfig(max_iterations=10, estimate_landmarks=False)
    p_opt, cost = gn.optimize(p, cams, cfg)
    np.testing.assert_allclose(
        np.asarray(p_opt.T_GW[:3]), np.asarray(T_GW_true[:3]), atol=0.02
    )
    dq = se3.quat_multiply(
        se3.quat_conjugate(p_opt.T_GW[3:7]), T_GW_true[3:7]
    )
    assert float(jnp.linalg.norm(se3.quat_log(dq))) < 0.01


@pytest.mark.slow
def test_estimator_gps_alignment_state_machine():
    """Full estimator run with GNSS fixes in a yawed/offset G frame: the
    state machine must reach Initialised and recover T_GW
    (≙ TestEstimatorGpsError.cpp scenario + gpsStatus_ machine)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_estimator import make_rig, simulate, make_landmarks
    from okvis2x_tpu.graph import EstimatorConfig, SlidingWindowEstimator
    from okvis2x_tpu.cameras import pinhole as ph

    rng = np.random.default_rng(17)
    cams, T_SC = make_rig()
    sim = simulate(duration=4.0)
    pts = make_landmarks()
    cfg = prb_cfg = EstimatorConfig(
        cap_frames=10, num_keyframes=4, num_imu_frames=3,
        cap_landmarks=256, cap_obs=2048, cap_imu_links=9,
        max_iterations=5,
    )
    est = SlidingWindowEstimator(cfg, cams, T_SC)

    # ground-truth alignment: yaw 0.5, offset (10, -5, 2)
    yaw = 0.5
    qz = se3.delta_q(jnp.asarray([0.0, 0.0, yaw], F64))
    T_GW_true = np.concatenate([[10.0, -5.0, 2.0], np.asarray(qz)])

    for t, w, a in zip(sim["t_imu"], sim["gyr"], sim["acc"]):
        if t > sim["t_frames"][0] + 0.01:
            break
        est.add_imu_measurement(t, w, a)

    cam = cams[0]
    lid_by_pt = {}
    imu_idx = np.searchsorted(sim["t_imu"], sim["t_frames"][0] + 0.01)
    next_gps = 0.0
    for k, tf in enumerate(sim["t_frames"]):
        while imu_idx < len(sim["t_imu"]) and sim["t_imu"][imu_idx] <= tf + 0.005:
            est.add_imu_measurement(
                sim["t_imu"][imu_idx], sim["gyr"][imu_idx], sim["acc"][imu_idx]
            )
            imu_idx += 1
        fid = est.add_state(tf)
        T_WS_gt = sim["T_WS_gt"][k]
        for c in range(2):
            T_CW = se3.se3_multiply(
                se3.se3_inverse(jnp.asarray(T_SC[c])),
                se3.se3_inverse(jnp.asarray(T_WS_gt)),
            )
            p_C = np.asarray(jax.vmap(lambda pt: se3.se3_apply(T_CW, pt))(
                jnp.asarray(pts)))
            uv, valid = ph.project(cam, jnp.asarray(p_C))
            uv, valid = np.asarray(uv), np.asarray(valid)
            for i in np.nonzero(valid)[0][:30]:
                if i not in lid_by_pt:
                    hp = np.concatenate([pts[i] + rng.normal(0, 0.05, 3), [1.0]])
                    lid_by_pt[i] = est.add_landmark(hp)
                est.add_observation(fid, c, lid_by_pt[i], uv[i] + rng.normal(0, 0.5, 2))
        # GPS fixes at 5 Hz from ground truth
        if tf >= next_gps:
            p_G = np.asarray(
                se3.se3_apply(jnp.asarray(T_GW_true, F64), jnp.asarray(T_WS_gt[:3], F64))
            ) + rng.normal(0, 0.02, 3)
            est.add_gps_measurement(tf, p_G, np.full(3, 0.02))
            next_gps = tf + 0.2
        est.set_keyframe(fid, k % 3 == 0)
        est.optimise()
        est.marginalise()

    assert est.gps_status == "Initialised"
    np.testing.assert_allclose(est.T_GW[:3], T_GW_true[:3], atol=0.15)
    dq = se3.quat_multiply(
        se3.quat_conjugate(jnp.asarray(est.T_GW[3:7])), jnp.asarray(T_GW_true[3:7])
    )
    assert float(jnp.linalg.norm(se3.quat_log(dq))) < 0.1
