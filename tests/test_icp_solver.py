"""Per-point SubmapIcp rows inside the window solver (≙ the reference
adding live SubmapIcpError residuals to the realtime ceres problem,
ViGraph.cpp:1470, re-evaluated every iteration — NOT pre-compressed into a
relative-pose edge at a frozen linearisation point)."""

import jax
import jax.numpy as jnp
import numpy as np

from okvis2x_tpu.cameras import pinhole
from okvis2x_tpu.mapping import submap as sm_mod
from okvis2x_tpu.solver import gauss_newton as gn
from okvis2x_tpu.solver import problem as prb

F64 = jnp.float64
# 5 cm grid: the 0.3 m surface band spans ~6 voxels on either side of the
# zero-crossing, so field gradients are well-conditioned on both approach
# directions (a 0.2 m grid collapses the band into one voxel — the
# discretisation failure the reference's 2.5 cm octree avoids)
CFG_GRID = sm_mod.SubmapConfig(dim=96, res=0.05, band_samples=16)


def make_wall(dtype=jnp.float64):
    sm = sm_mod.new_submap(np.array([0, 0, 0, 0, 0, 0, 1.0]), CFG_GRID, dtype)
    xs = np.linspace(-1.8, 1.8, 72)
    gx, gy = np.meshgrid(xs, xs)
    end = np.stack([gx.ravel(), gy.ravel(), np.full(gx.size, 2.0)], -1)
    for _ in range(3):
        sm = sm_mod.integrate_rays(
            sm, CFG_GRID, jnp.zeros(3, dtype), jnp.asarray(end, dtype),
            jnp.ones(len(end), bool), 0.05,
        )
    return sm


def make_problem(dz=-0.10, Q=64, dtype=F64):
    """Two frames: frame 0 anchors the submap (pose prior), frame 1 owns
    points measured on the surface but initialised with a z offset."""
    rng = np.random.default_rng(5)
    p = prb.empty_problem(K=2, L=4, C=1, N=4, M=0, R=1, G=0, Q=Q, dtype=dtype)
    T0 = np.array([0, 0, 0, 0, 0, 0, 1.0])
    T1_bad = np.array([0.0, 0.0, dz, 0, 0, 0, 1.0])
    pts = np.stack(
        [rng.uniform(-1.5, 1.5, Q), rng.uniform(-1.5, 1.5, Q),
         np.full(Q, 2.0)], -1
    )
    sqrt_info = 100.0 * np.eye(6)
    p = p._replace(
        T_WS=jnp.asarray(np.stack([T0, T1_bad]), dtype),
        frame_valid=jnp.ones(2, bool),
        pose_fixed=jnp.asarray([True, False]),
        sb_fixed=jnp.ones(2, bool),
        lm_fixed=jnp.ones(4, bool),
        pose_prior_T=jnp.asarray(np.stack([T0, T0]), dtype),
        pose_prior_sqrt_info=jnp.asarray(np.stack([sqrt_info, 0 * sqrt_info]), dtype),
        pose_prior_valid=jnp.asarray([True, False]),
        icp_a=jnp.zeros(Q, jnp.int32),
        icp_b=jnp.ones(Q, jnp.int32),
        icp_p_B=jnp.asarray(pts, dtype),
        icp_si=jnp.full(Q, 1.0 / 0.1, dtype),
        icp_valid=jnp.ones(Q, bool),
        icp_map=make_wall(dtype),
    )
    cam = pinhole.make_pinhole(400.0, 400.0, 320.0, 240.0, 640, 480,
                               model="none", dist_params=[], dtype=dtype)
    cams = gn.stack_cameras([cam])
    return p, cams


def test_icp_jacobian_matches_fd():
    p, cams = make_problem(dz=-0.05, Q=8)
    cfg = gn.SolverConfig(icp_cfg=CFG_GRID, estimate_landmarks=False)
    r, Jrow, use = gn._linearize_icp(p, cfg)
    assert int(use.sum()) > 4
    # finite differences on the owner pose (frame 1, columns 15..21)
    from okvis2x_tpu.core import se3

    eps = 1e-6
    for ax in range(6):
        d = np.zeros(6)
        d[ax] = eps
        Tp = p._replace(
            T_WS=p.T_WS.at[1].set(se3.retract(p.T_WS[1], jnp.asarray(d)))
        )
        rp, _, _ = gn._linearize_icp(Tp, cfg)
        Tm = p._replace(
            T_WS=p.T_WS.at[1].set(se3.retract(p.T_WS[1], jnp.asarray(-d)))
        )
        rm, _, _ = gn._linearize_icp(Tm, cfg)
        num = (np.asarray(rp) - np.asarray(rm))[:, 0] / (2 * eps)
        ana = np.asarray(Jrow)[:, 0, 15 + ax]
        m = np.asarray(use)
        np.testing.assert_allclose(ana[m], num[m], rtol=1e-3, atol=1e-4)


def test_icp_rows_pull_pose_to_surface():
    p, cams = make_problem(dz=-0.10, Q=64)
    cfg = gn.SolverConfig(
        max_iterations=8, icp_cfg=CFG_GRID, estimate_landmarks=False,
    )
    p_opt, cost = gn.optimize(p, cams, cfg)
    # points measured at z=2.0 in the B frame sit at world 1.90 with the
    # offset start — on the free-space side of the wall; the solver must
    # pull frame 1 forward until they land on the zero-crossing (B z -> 0).
    # At this coarse 0.2 m test grid the occupied band is one voxel thick,
    # so only the free-side basin is well-conditioned (the fine brick grid
    # resolves the band over ~12 voxels — see test_brick.py); in a full
    # window IMU/prior factors bound the step size anyway.
    z1 = float(p_opt.T_WS[1, 2])
    assert abs(z1) < 0.05, (z1, float(cost))
    # anchor stayed put (fixed + prior)
    assert float(jnp.abs(p_opt.T_WS[0, :3]).max()) < 1e-6


def test_icp_rows_beat_frozen_edge():
    """Per-point rows pull the drifted pose onto the actual surface; a
    relative-pose edge compressed at the drifted linearisation point
    (the old `make_alignment_edge` path) is already satisfied there and
    freezes the drift in — the failure mode the reference avoids by
    keeping live SubmapIcpError residuals in the problem."""
    from okvis2x_tpu.mapping import icp_factor

    dz = -0.10
    p, cams = make_problem(dz=dz, Q=64)

    # path A: live per-point rows
    cfg = gn.SolverConfig(
        max_iterations=8, icp_cfg=CFG_GRID, estimate_landmarks=False,
    )
    p_live, _ = gn.optimize(p, cams, cfg)
    err_live = abs(float(p_live.T_WS[1, 2]))

    # path B: compress the same points into one relative-pose edge AT THE
    # DRIFTED STATE, then solve with only that edge (no icp rows)
    T_AB, sqrt_info, strength = icp_factor.make_alignment_edge(
        p.icp_map, CFG_GRID, p.T_WS[0], p.T_WS[1], p.icp_p_B,
        jnp.ones(p.icp_p_B.shape[0], bool), sigma=0.1,
    )
    p_edge = p._replace(
        icp_valid=jnp.zeros_like(p.icp_valid),
        rel_i=jnp.zeros(1, jnp.int32),
        rel_j=jnp.ones(1, jnp.int32),
        rel_T=T_AB[None],
        rel_sqrt_info=sqrt_info[None],
        rel_valid=jnp.ones(1, bool),
    )
    cfg_edge = gn.SolverConfig(max_iterations=8, estimate_landmarks=False)
    p_cmp, _ = gn.optimize(p_edge, cams, cfg_edge)
    err_edge = abs(float(p_cmp.T_WS[1, 2]) - 0.0)

    assert err_live < 0.03, err_live
    # the frozen edge keeps the pose near the drifted point
    assert err_edge > 0.05, err_edge
    assert err_live < 0.5 * err_edge, (err_live, err_edge)
