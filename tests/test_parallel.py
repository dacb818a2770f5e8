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


def test_sharded_submap_integration_matches_single_device():
    """Ray-sharded brick integration (parallel/dist_submap.py) must produce
    the same submap as the single-device path: identical pool log-odds,
    table, and allocation count."""
    import numpy as np

    from okvis2x_tpu.core import se3
    from okvis2x_tpu.mapping import brick
    from okvis2x_tpu.parallel.dist_submap import integrate_rays_sharded
    from okvis2x_tpu.parallel.mesh import make_mesh

    cfg = brick.BrickConfig(
        table_dim=16, brick=4, res=0.1, pool_bricks=256,
        samples_per_ray=24, band_samples=4,
    )
    sm0 = brick.new_submap(jnp.asarray(se3.se3_identity(jnp.float32)), cfg)
    rng = np.random.default_rng(4)
    R = 64 * 8
    origin = jnp.zeros((3,), jnp.float32)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    end = jnp.asarray(d * rng.uniform(0.5, 3.0, (R, 1)).astype(np.float32))
    valid = jnp.ones((R,), bool)

    single = brick.integrate_rays(sm0, cfg, origin, end, valid, sigma=0.1)
    mesh = make_mesh(8)
    sharded = integrate_rays_sharded(
        sm0, cfg, origin, end, valid, mesh, sigma=0.1
    )
    assert int(single.n_alloc) == int(sharded.n_alloc) > 0
    np.testing.assert_array_equal(
        np.asarray(single.table) >= 0, np.asarray(sharded.table) >= 0
    )
    # same voxels written with the same mean updates (allocation ORDER may
    # differ between the replicated and local prefix sums, so compare
    # through the table indirection)
    ti = np.asarray(single.table)
    ts = np.asarray(sharded.table)
    sel = np.nonzero(ti >= 0)[0]
    b3 = cfg.b3
    lo_i = np.asarray(single.pool_lo)
    lo_s = np.asarray(sharded.pool_lo)
    for t in sel[:64]:
        a = lo_i[ti[t] * b3:(ti[t] + 1) * b3]
        b = lo_s[ts[t] * b3:(ts[t] + 1) * b3]
        np.testing.assert_allclose(a, b, atol=1e-5)
