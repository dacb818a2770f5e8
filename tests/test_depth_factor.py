"""Per-keypoint depth factor (≙ ceres::DepthErrorT tests, reference
okvis_ceres/test style: analytic-vs-numeric Jacobians, then solve-to-truth)."""

import jax
import jax.numpy as jnp
import numpy as np

from okvis2x_tpu.core import se3
from okvis2x_tpu.factors import depth as depth_mod
from okvis2x_tpu.solver import gauss_newton as gn
from okvis2x_tpu.solver import problem as prb

F64 = jnp.float64


def _rand_T(rng):
    w = rng.standard_normal(3) * 0.3
    t = rng.standard_normal(3)
    return se3.retract(se3.se3_identity(F64), jnp.asarray(np.r_[t, w], F64))


def test_depth_jacobians_match_finite_differences():
    rng = np.random.default_rng(0)
    T_WS = _rand_T(rng)
    T_SC = _rand_T(rng)
    hp_W = jnp.asarray(np.r_[rng.standard_normal(3) * 2 + [0, 0, 5], 1.0], F64)
    z, w = depth_mod.predicted_depth(T_WS, T_SC, hp_W)
    d_meas = float(z / w) + 0.2  # one-sided: predicted < measured -> active
    si = 10.0

    r, Jp, Jl, Je = depth_mod.linearize(T_WS, T_SC, hp_W, d_meas, si, True)
    assert abs(float(r) - si * (d_meas - float(z / w))) < 1e-9

    eps = 1e-7
    for k, (J, dim) in enumerate(((Jp, 6), (Jl, 3), (Je, 6))):
        for i in range(dim):
            d = np.zeros(dim)
            d[i] = eps
            args = [T_WS, T_SC, hp_W]
            if k == 0:
                args[0] = se3.retract(T_WS, jnp.asarray(d, F64))
            elif k == 1:
                args[2] = hp_W.at[:3].add(jnp.asarray(d, F64))
            else:
                args[1] = se3.retract(T_SC, jnp.asarray(d, F64))
            rp = depth_mod.residual(*args, d_meas, si, True)
            num = (float(rp) - float(r)) / eps
            assert abs(num - float(J[i])) < 1e-4, (k, i, num, float(J[i]))


def test_depth_onesided_gating():
    T = se3.se3_identity(F64)
    hp = jnp.asarray([0.0, 0.0, 5.0, 1.0], F64)
    # predicted depth 5 > measured 3 -> ignored one-sided, active two-sided
    r1 = depth_mod.residual(T, T, hp, 3.0, 1.0, True)
    r2 = depth_mod.residual(T, T, hp, 3.0, 1.0, False)
    assert float(r1) == 0.0
    assert abs(float(r2) + 2.0) < 1e-12
    rj, Jp, Jl, Je = depth_mod.linearize(T, T, hp, 3.0, 1.0, True)
    assert float(rj) == 0.0 and float(jnp.abs(Jl).sum()) == 0.0
    # point at infinity ignored in both
    hpinf = jnp.asarray([0.0, 0.0, 1.0, 0.0], F64)
    assert float(depth_mod.residual(T, T, hpinf, 3.0, 1.0, False)) == 0.0


def test_depth_priors_pull_landmarks_in_solver():
    """A landmark observed from one fixed pose with a (two-sided) depth
    measurement must converge to the measured depth along its ray."""
    from okvis2x_tpu.cameras import pinhole

    cam = pinhole.make_pinhole(320, 240, 200.0, 200.0, 160.0, 120.0, dtype=F64)
    cams = gn.stack_cameras([cam])
    p = prb.empty_problem(K=2, L=4, C=1, N=8, M=1, dtype=F64)
    true_depths = np.array([4.0, 5.0, 6.0, 7.0])
    uv0 = np.array([[160.0, 120.0], [180.0, 100.0], [140.0, 130.0], [200.0, 90.0]])
    hp = []
    for d, uv in zip(true_depths, uv0):
        ray, _ = pinhole.back_project(cam, jnp.asarray(uv, F64))
        hp.append(np.r_[np.asarray(ray) * d, 1.0])
    hp = np.array(hp)
    # perturb initial depths
    hp_init = hp.copy()
    hp_init[:, 2] *= 1.3

    p = p._replace(
        T_WS=p.T_WS,
        frame_valid=jnp.array([True, False]),
        pose_fixed=jnp.array([True, True]),
        sb_fixed=jnp.array([True, True]),
        hp_W=jnp.asarray(hp_init, F64),
        lm_valid=jnp.ones(4, bool),
        obs_frame=jnp.zeros(8, jnp.int32),
        obs_cam=jnp.zeros(8, jnp.int32),
        obs_lm=jnp.asarray(np.r_[np.arange(4), np.zeros(4)], jnp.int32),
        obs_uv=jnp.asarray(np.r_[uv0, np.zeros((4, 2))], F64),
        obs_valid=jnp.asarray(np.r_[np.ones(4), np.zeros(4)], bool),
        obs_depth=jnp.asarray(np.r_[true_depths, np.ones(4)], F64),
        obs_depth_si=jnp.full((8,), 100.0, F64),
        obs_depth_valid=jnp.asarray(np.r_[np.ones(4), np.zeros(4)], bool),
    )
    cfg = gn.SolverConfig(
        max_iterations=10, use_depth=True, depth_onesided=False,
        estimate_landmarks=True,
    )
    out, cost = jax.jit(
        lambda p: gn.optimize(p, cams, cfg)
    )(p)
    got = np.asarray(out.hp_W[:, 2] / out.hp_W[:, 3])
    np.testing.assert_allclose(got, true_depths, atol=1e-3)
