"""Edge-sharded matrix-free pose-graph solver: must agree with the dense
pose-graph GN on small graphs, respect fixed poses, and give identical
results sharded over the 8-device CPU mesh vs single device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from okvis2x_tpu.core import se3
from okvis2x_tpu.graph.posegraph import optimize_pose_graph
from okvis2x_tpu.parallel.dist_posegraph import optimize_pose_graph_pcg
from okvis2x_tpu.parallel.mesh import make_mesh


def _circle_graph(K=16, seed=0, drift=0.05):
    """Ground-truth poses on a circle; noisy-odometry initialisation; exact
    odometry edges + one loop-closure edge (the classic PGO setup)."""
    rng = np.random.default_rng(seed)
    th = np.linspace(0, 2 * np.pi, K, endpoint=False)
    T_gt = np.zeros((K, 7))
    for k in range(K):
        t = np.array([np.cos(th[k]), np.sin(th[k]), 0.1 * np.sin(2 * th[k])])
        q = np.array(
            se3.delta_q(jnp.asarray([0.0, 0.0, th[k]], jnp.float64))
        )
        T_gt[k] = np.concatenate([t, q])

    def rel(a, b):
        return np.asarray(
            se3.se3_multiply(
                se3.se3_inverse(jnp.asarray(T_gt[a])), jnp.asarray(T_gt[b])
            )
        )

    ei, ej, eT = [], [], []
    for k in range(K - 1):
        ei.append(k), ej.append(k + 1), eT.append(rel(k, k + 1))
    ei.append(K - 1), ej.append(0), eT.append(rel(K - 1, 0))
    eS = np.tile(np.eye(6) * 10.0, (len(ei), 1, 1))

    # drifted initialisation: accumulate odometry with noise
    T0 = np.zeros((K, 7))
    T0[0] = T_gt[0]
    for k in range(1, K):
        noise = np.concatenate(
            [rng.normal(0, drift, 3), rng.normal(0, drift, 3)]
        )
        Tr = se3.retract(jnp.asarray(rel(k - 1, k)), jnp.asarray(noise))
        T0[k] = np.asarray(
            se3.se3_multiply(jnp.asarray(T0[k - 1]), Tr)
        )
    fixed = np.zeros(K, bool)
    fixed[0] = True
    return T_gt, T0, fixed, np.array(ei), np.array(ej), np.array(eT), eS


def test_pcg_matches_dense():
    T_gt, T0, fixed, ei, ej, eT, eS = _circle_graph()
    T_dense, cost_dense = optimize_pose_graph(
        T0, fixed, ei, ej, eT, eS, iterations=10
    )
    T_pcg, cost_pcg = optimize_pose_graph_pcg(
        T0, fixed, ei, ej, eT, eS, iterations=10, cg_iterations=96
    )
    # both should reach (near-)zero cost on a consistent graph
    assert cost_pcg < 1e-6
    np.testing.assert_allclose(cost_pcg, cost_dense, atol=1e-6)
    np.testing.assert_allclose(T_pcg[:, :3], T_dense[:, :3], atol=1e-4)
    # and recover ground truth (gauge fixed by pose 0)
    np.testing.assert_allclose(T_pcg[:, :3], T_gt[:, :3], atol=1e-4)


def test_pcg_respects_fixed_poses():
    T_gt, T0, fixed, ei, ej, eT, eS = _circle_graph(K=8)
    fixed = fixed.copy()
    fixed[3] = True
    T_pcg, _ = optimize_pose_graph_pcg(
        T0, fixed, ei, ej, eT, eS, iterations=6, cg_iterations=48
    )
    np.testing.assert_array_equal(T_pcg[0], T0[0])
    np.testing.assert_array_equal(T_pcg[3], T0[3])


@pytest.mark.slow
def test_pcg_mesh_matches_single_device():
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    T_gt, T0, fixed, ei, ej, eT, eS = _circle_graph(K=24, seed=3)
    T_one, cost_one = optimize_pose_graph_pcg(
        T0, fixed, ei, ej, eT, eS, iterations=8, cg_iterations=64
    )
    mesh = make_mesh(8)
    T_mesh, cost_mesh = optimize_pose_graph_pcg(
        T0, fixed, ei, ej, eT, eS, iterations=8, cg_iterations=64, mesh=mesh
    )
    np.testing.assert_allclose(cost_mesh, cost_one, rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(T_mesh, T_one, atol=1e-8)
