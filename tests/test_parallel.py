"""Distributed BA on the virtual 8-device CPU mesh: must agree with the
single-device solver (same problem, same LM schedule)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from okvis2x_tpu.parallel.dist_schur import optimize_distributed
from okvis2x_tpu.parallel.mesh import make_mesh
from okvis2x_tpu.solver import gauss_newton as gn
from okvis2x_tpu.testing import synthetic_window_problem


@pytest.mark.slow
def test_distributed_matches_single_device():
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    p, cams = synthetic_window_problem(K=4, L=64, N=1024, dtype=jnp.float32)
    cfg = gn.SolverConfig(max_iterations=4)

    p_single, cost_single = jax.jit(lambda q: gn.optimize(q, cams, cfg))(p)
    mesh = make_mesh(8)
    p_dist, cost_dist = optimize_distributed(p, cams, cfg, mesh)

    # f32 psum reduction order differs from the single-device sum, so the
    # LM trajectories diverge slightly — assert agreement, not bit-equality
    np.testing.assert_allclose(
        float(cost_dist), float(cost_single), rtol=1e-2
    )
    np.testing.assert_allclose(
        np.asarray(p_dist.T_WS), np.asarray(p_single.T_WS), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(p_dist.hp_W), np.asarray(p_single.hp_W), atol=2e-2
    )


@pytest.mark.slow
def test_distributed_cost_decreases():
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    p, cams = synthetic_window_problem(K=4, L=64, N=512, dtype=jnp.float32)
    cfg0 = gn.SolverConfig(max_iterations=0)
    cfg = gn.SolverConfig(max_iterations=5)
    mesh = make_mesh(8)
    _, cost0 = optimize_distributed(p, cams, cfg0, mesh)
    _, cost = optimize_distributed(p, cams, cfg, mesh)
    assert float(cost) < float(cost0) * 0.5
