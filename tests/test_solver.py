"""Batched GN/LM + Schur solver on synthetic BA problems.

Mirrors the reference's okvis_ceres/test/TestReprojectionError.cpp +
TestEstimator.cpp pattern: synthetic landmarks/poses, project to generate
observations, perturb, optimise, assert recovery.
"""

import jax
import jax.numpy as jnp
import numpy as np

from okvis2x_tpu.cameras import distortion as dist
from okvis2x_tpu.cameras import pinhole
from okvis2x_tpu.core import se3
from okvis2x_tpu.solver import gauss_newton as gn
from okvis2x_tpu.solver import problem as prb

F64 = jnp.float64


def build_synthetic(key, K=5, L=64, noise_px=0.3, baseline=0.11):
    cam = pinhole.make_pinhole(
        fx=460.0, fy=460.0, cx=376.0, cy=240.0, width=752, height=480,
        model=dist.RADTAN, dist_params=[-0.28, 0.07, 1e-4, 1e-5],
    )
    cams = gn.stack_cameras([cam, cam])
    T_SC0 = se3.se3_identity(F64)
    T_SC1 = jnp.array([baseline, 0, 0, 0, 0, 0, 1], F64)

    # ground-truth poses: moving sideways, slight yaw
    ks = np.arange(K)
    T_WS_gt = []
    for k in ks:
        t = jnp.array([0.15 * k, 0.02 * k, 0.0], F64)
        q = se3.delta_q(jnp.array([0.0, 0.0, 0.02 * k], F64))
        T_WS_gt.append(jnp.concatenate([t, q]))
    T_WS_gt = jnp.stack(T_WS_gt)

    # landmarks in front (z in 2..6 m)
    k1, k2 = jax.random.split(key)
    pts = jax.random.uniform(
        k1, (L, 3), F64,
        minval=jnp.array([-2.0, -1.5, 2.0]),
        maxval=jnp.array([2.0, 1.5, 6.0]),
    )
    hp_gt = jnp.concatenate([pts, jnp.ones((L, 1), F64)], -1)

    # observations: all frames x cams x landmarks, keep valid ones
    obs = []
    T_SC = [T_SC0, T_SC1]
    for k in range(K):
        for c in range(2):
            T_CW = se3.se3_multiply(
                se3.se3_inverse(T_SC[c]), se3.se3_inverse(T_WS_gt[k])
            )
            p_C = jax.vmap(lambda hp: se3.se3_apply_homogeneous(T_CW, hp))(hp_gt)
            uv, valid = pinhole.project(cam, p_C[:, :3] / p_C[:, 3:4])
            for l in range(L):
                if bool(valid[l]):
                    obs.append((k, c, l, np.asarray(uv[l])))
    N = len(obs)
    noise = jax.random.normal(k2, (N, 2), F64) * noise_px

    p = prb.empty_problem(K=K, L=L, C=2, N=N, M=K - 1, R=0, dtype=F64)
    p = p._replace(
        T_WS=T_WS_gt,
        frame_valid=jnp.ones(K, bool),
        T_SC=jnp.stack([T_SC0, T_SC1]),
        hp_W=hp_gt,
        lm_valid=jnp.ones(L, bool),
        obs_frame=jnp.array([o[0] for o in obs], jnp.int32),
        obs_cam=jnp.array([o[1] for o in obs], jnp.int32),
        obs_lm=jnp.array([o[2] for o in obs], jnp.int32),
        obs_uv=jnp.array([o[3] for o in obs], F64) + noise,
        obs_valid=jnp.ones(N, bool),
        # no IMU in this test: disable links
        imu_valid=jnp.zeros(K - 1, bool),
    )
    return p, cams, T_WS_gt, hp_gt


def test_ba_recovers_from_perturbation():
    key = jax.random.PRNGKey(2)
    p, cams, T_gt, hp_gt = build_synthetic(key)
    K, L = p.K, p.L

    # gauge: fix first pose + first landmark set fixed? use pose prior on frame0
    p = p._replace(
        pose_fixed=jnp.zeros(K, bool).at[0].set(True),
        sb_fixed=jnp.ones(K, bool),  # no IMU -> sb unconstrained, freeze
    )

    # perturb poses (except 0) and landmarks
    k1, k2 = jax.random.split(key)
    dpose = (
        jax.random.normal(k1, (K, 6), F64) * jnp.array([0.05] * 3 + [0.02] * 3, F64)
    ).at[0].set(0.0)
    T_pert = jax.vmap(se3.retract)(p.T_WS, dpose)
    hp_pert = p.hp_W.at[:, :3].add(jax.random.normal(k2, (L, 3), F64) * 0.08)
    # fix scale gauge: also fix second pose translation via strong prior
    p = p._replace(
        T_WS=T_pert,
        hp_W=hp_pert,
        pose_prior_T=p.pose_prior_T.at[1].set(T_gt[1]),
        pose_prior_sqrt_info=p.pose_prior_sqrt_info.at[1].set(jnp.eye(6, dtype=F64) * 1e4),
        pose_prior_valid=jnp.zeros(K, bool).at[1].set(True),
    )

    cfg = gn.SolverConfig(max_iterations=12)
    p_opt, cost = jax.jit(gn.optimize, static_argnums=2)(p, cams, cfg)

    err_t = np.linalg.norm(np.asarray(p_opt.T_WS[:, :3] - T_gt[:, :3]), axis=-1)
    assert err_t.max() < 0.01, err_t
    # landmark error
    err_l = np.linalg.norm(np.asarray(p_opt.hp_W[:, :3] - hp_gt[:, :3]), axis=-1)
    assert np.median(err_l) < 0.03


def test_pose_only_mode_keeps_landmarks():
    key = jax.random.PRNGKey(3)
    p, cams, T_gt, hp_gt = build_synthetic(key, noise_px=0.0)
    K = p.K
    p = p._replace(
        sb_fixed=jnp.ones(K, bool),
        pose_fixed=jnp.zeros(K, bool).at[0].set(True),
    )
    dpose = jnp.zeros((K, 6), F64).at[2].set(
        jnp.array([0.04, -0.03, 0.02, 0.01, 0.0, -0.01], F64)
    )
    p = p._replace(T_WS=jax.vmap(se3.retract)(p.T_WS, dpose))
    cfg = gn.SolverConfig(max_iterations=6, estimate_landmarks=False)
    p_opt, cost = gn.optimize(p, cams, cfg)
    np.testing.assert_allclose(np.asarray(p_opt.hp_W), np.asarray(hp_gt), atol=0)
    err_t = np.linalg.norm(np.asarray(p_opt.T_WS[:, :3] - T_gt[:, :3]), axis=-1)
    assert err_t.max() < 1e-3


def test_frozen_poses_do_not_move():
    key = jax.random.PRNGKey(4)
    p, cams, T_gt, hp_gt = build_synthetic(key)
    K = p.K
    p = p._replace(
        pose_fixed=jnp.ones(K, bool).at[K - 1].set(False),
        sb_fixed=jnp.ones(K, bool),
    )
    T_before = np.asarray(p.T_WS)
    cfg = gn.SolverConfig(max_iterations=3)
    p_opt, _ = gn.optimize(p, cams, cfg)
    np.testing.assert_allclose(
        np.asarray(p_opt.T_WS[: K - 1]), T_before[: K - 1], atol=1e-12
    )


def test_invalid_obs_masked():
    key = jax.random.PRNGKey(5)
    p, cams, T_gt, hp_gt = build_synthetic(key, noise_px=0.0)
    # corrupt half of the observations but mark them invalid
    N = p.obs_uv.shape[0]
    bad = jnp.arange(N) % 2 == 0
    p = p._replace(
        obs_uv=jnp.where(bad[:, None], p.obs_uv + 500.0, p.obs_uv),
        obs_valid=~bad,
        pose_fixed=jnp.zeros(p.K, bool).at[0].set(True),
        sb_fixed=jnp.ones(p.K, bool),
    )
    cfg = gn.SolverConfig(max_iterations=4)
    p_opt, cost = gn.optimize(p, cams, cfg)
    err_t = np.linalg.norm(np.asarray(p_opt.T_WS[:, :3] - T_gt[:, :3]), axis=-1)
    assert err_t.max() < 1e-3


def test_rel_analytic_jacobian_matches_autodiff():
    """Closed-form relative-pose Jacobians == jacfwd through retract+log
    (exactness of the Jl^{-1} correction, also away from zero residual)."""
    import jax

    from okvis2x_tpu.core import se3
    from okvis2x_tpu.factors import priors
    from okvis2x_tpu.solver import problem as prb

    rng = np.random.default_rng(11)
    K = 3
    p = prb.empty_problem(K=K, L=1, C=1, N=1, M=0, R=2, G=0,
                          dtype=jnp.float64)
    T = np.zeros((K, 7))
    for k in range(K):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        T[k] = np.concatenate([rng.normal(scale=2.0, size=3), q])
    # a rel measurement NOT equal to the current estimate (finite residual)
    qm = rng.normal(size=4)
    qm /= np.linalg.norm(qm)
    Trel = np.concatenate([rng.normal(size=3), qm])
    S = np.linalg.cholesky(
        np.eye(6) + 0.1 * np.diag(rng.uniform(size=6))
    ).T
    p = p._replace(
        T_WS=jnp.asarray(T),
        frame_valid=jnp.ones(K, bool),
        rel_i=jnp.array([0, 1], jnp.int32),
        rel_j=jnp.array([1, 2], jnp.int32),
        rel_T=jnp.asarray(np.stack([Trel, Trel])),
        rel_sqrt_info=jnp.asarray(np.stack([S, S])),
        rel_valid=jnp.ones(2, bool),
    )

    r_an, Jrow_an, _ = gn._linearize_rel(p)

    def fd_one(i, j):
        def f(di, dj):
            return priors.relative_pose_residual(
                jnp.asarray(Trel),
                se3.retract(p.T_WS[i], di),
                se3.retract(p.T_WS[j], dj),
                jnp.asarray(S),
            )

        z = jnp.zeros(6, jnp.float64)
        r = f(z, z)
        Ji, Jj = jax.jacfwd(f, argnums=(0, 1))(z, z)
        return r, Ji, Jj

    for e, (i, j) in enumerate([(0, 1), (1, 2)]):
        r, Ji, Jj = fd_one(i, j)
        np.testing.assert_allclose(np.asarray(r_an[e]), np.asarray(r),
                                   atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(Jrow_an[e, :, i * 15 : i * 15 + 6]), np.asarray(Ji),
            atol=1e-9,
        )
        np.testing.assert_allclose(
            np.asarray(Jrow_an[e, :, j * 15 : j * 15 + 6]), np.asarray(Jj),
            atol=1e-9,
        )


def test_online_extrinsics_calibration():
    """Online extrinsics estimation (≙ OnlineCalibrationParameters +
    the reference's extrinsics-estimation estimator variants): a perturbed
    T_SC is pulled back to the true calibration by the reprojection factors
    under a loose extrinsics prior."""
    from okvis2x_tpu.core import se3
    from okvis2x_tpu.testing import synthetic_window_problem

    p, cams = synthetic_window_problem(
        K=6, L=128, N=1024, dtype=jnp.float64, noise_px=0.1
    )
    T_SC_true = np.asarray(p.T_SC)
    # perturb camera 1 extrinsics: 2 cm + ~1.7 deg
    d = jnp.asarray(np.array([0.02, -0.015, 0.01, 0.02, -0.015, 0.01]))
    T_SC_bad = np.asarray(p.T_SC).copy()
    T_SC_bad[1] = np.asarray(se3.retract(jnp.asarray(T_SC_true[1]), d))

    si = np.diag(np.concatenate([np.full(3, 1 / 5.0), np.full(3, 1 / 5.0)]))
    p_bad = p._replace(
        T_SC=jnp.asarray(T_SC_bad),
        ext_fixed=jnp.array([True, False]),  # cam0 fixes the gauge
        ext_prior_T=jnp.asarray(T_SC_bad),
        ext_prior_sqrt_info=jnp.asarray(np.tile(si, (2, 1, 1))),
        ext_prior_valid=jnp.ones(2, bool),
    )
    cfg = gn.SolverConfig(max_iterations=15, use_ext_priors=True)
    p_opt, cost = jax.jit(lambda pp: gn.optimize(pp, cams, cfg))(p_bad)

    err_before = np.linalg.norm(T_SC_bad[1][:3] - T_SC_true[1][:3])
    err_after = np.linalg.norm(
        np.asarray(p_opt.T_SC)[1][:3] - T_SC_true[1][:3]
    )
    assert err_after < 0.3 * err_before, (err_before, err_after)
    # with calibration off, extrinsics must not move
    cfg_off = gn.SolverConfig(max_iterations=3)
    p_off, _ = jax.jit(lambda pp: gn.optimize(pp, cams, cfg_off))(
        p_bad._replace(ext_fixed=jnp.ones(2, bool))
    )
    np.testing.assert_allclose(np.asarray(p_off.T_SC), T_SC_bad, atol=1e-12)
