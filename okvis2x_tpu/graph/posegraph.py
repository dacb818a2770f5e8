"""Pose-graph utilities: MST edge selection + pose-graph optimisation.

Host-side graph structure (cheap, dynamic) + device solve:
  * `max_spanning_tree` — Kruskal maximum-spanning-tree over the
    covisibility graph, used to pick which two-pose edges to create during
    marginalisation (reference: okvis_util/include/okvis/MstGraph.hpp:91-121
    used by ViGraphEstimator::buildMst, okvis_ceres/src/
    ViGraphEstimator.cpp:935);
  * `optimize_pose_graph` — batched GN over relative-pose edges only, i.e. a
    BAProblem with no observations/IMU; used after loop closures
    (reference: the pose-graph stage of the full-graph optimisation).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from okvis2x_tpu.solver import gauss_newton as gn
from okvis2x_tpu.solver import problem as prb


class DisjointSet:
    def __init__(self):
        self.parent: Dict[int, int] = {}

    def find(self, x: int) -> int:
        while self.parent.setdefault(x, x) != x:
            self.parent[x] = self.parent[self.parent[x]]
            x = self.parent[x]
        return x

    def union(self, a: int, b: int) -> bool:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return False
        self.parent[ra] = rb
        return True


def max_spanning_tree(
    edges: Sequence[Tuple[int, int, float]]
) -> List[Tuple[int, int, float]]:
    """Kruskal MST maximising total weight; edges (i, j, weight)."""
    ds = DisjointSet()
    out = []
    for i, j, w in sorted(edges, key=lambda e: -e[2]):
        if ds.union(i, j):
            out.append((i, j, w))
    return out


def optimize_pose_graph(
    T_WS: np.ndarray,  # (K, 7) initial poses
    fixed: np.ndarray,  # (K,) bool
    edges_i: np.ndarray,
    edges_j: np.ndarray,
    edges_T: np.ndarray,  # (R, 7)
    edges_sqrt_info: np.ndarray,  # (R, 6, 6)
    iterations: int = 10,
    dtype=jnp.float64,
):
    """Pure pose-graph GN/LM: returns optimised (K, 7) poses."""
    K = T_WS.shape[0]
    R = len(edges_i)
    p = prb.empty_problem(K=K, L=1, C=1, N=1, M=1, R=R, dtype=dtype)
    p = p._replace(
        T_WS=jnp.asarray(T_WS, dtype),
        frame_valid=jnp.ones(K, bool),
        pose_fixed=jnp.asarray(fixed),
        sb_fixed=jnp.ones(K, bool),
        rel_i=jnp.asarray(edges_i, jnp.int32),
        rel_j=jnp.asarray(edges_j, jnp.int32),
        rel_T=jnp.asarray(edges_T, dtype),
        rel_sqrt_info=jnp.asarray(edges_sqrt_info, dtype),
        rel_valid=jnp.ones(R, bool),
    )
    # dummy camera (no observations are valid)
    from okvis2x_tpu.cameras import pinhole

    cam = pinhole.make_pinhole(1.0, 1.0, 0.0, 0.0, 2, 2, model="none", dtype=dtype)
    cams = gn.stack_cameras([cam])
    cfg = gn.SolverConfig(max_iterations=iterations, estimate_landmarks=False)
    p_opt, cost = gn.optimize(p, cams, cfg)
    return np.asarray(p_opt.T_WS), float(cost)
