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
    import jax

    # resolve f64-request → best available (f32 on TPU) once, silently
    dtype = jax.dtypes.canonicalize_dtype(dtype)
    K0 = T_WS.shape[0]
    R0 = len(edges_i)

    # capacity buckets: one compiled program serves every pose-graph size
    # in the bucket (an unbucketed K would recompile on every background
    # dispatch as keyframes accumulate).  Pow2 below 128, multiples of 128
    # above — the dense (6K)^2 solve grows quadratically, so pow2 padding
    # at 547 nodes would nearly double the program for nothing.
    def _bucket(n, base):
        c = base
        while c < n and c < 128:
            c *= 2
        if c < n:
            c = ((n + 127) // 128) * 128
        return c

    K = _bucket(K0, 16)
    R = _bucket(R0, 16)
    id7 = np.array([0, 0, 0, 0, 0, 0, 1.0])
    T_full = np.concatenate([np.asarray(T_WS), np.tile(id7, (K - K0, 1))])
    fix_full = np.concatenate([np.asarray(fixed, bool), np.ones(K - K0, bool)])
    valid_full = np.zeros(K, bool)
    valid_full[:K0] = True
    ei = np.zeros(R, np.int32)
    ej = np.zeros(R, np.int32)
    eT = np.tile(id7, (R, 1))
    eS = np.zeros((R, 6, 6))
    rv = np.zeros(R, bool)
    ei[:R0] = edges_i
    ej[:R0] = edges_j
    eT[:R0] = edges_T
    eS[:R0] = edges_sqrt_info
    rv[:R0] = True
    p = prb.empty_problem(K=K, L=1, C=1, N=1, M=1, R=R, dtype=dtype)
    p = p._replace(
        T_WS=jnp.asarray(T_full, dtype),
        frame_valid=jnp.asarray(valid_full),
        pose_fixed=jnp.asarray(fix_full),
        sb_fixed=jnp.ones(K, bool),
        rel_i=jnp.asarray(ei),
        rel_j=jnp.asarray(ej),
        rel_T=jnp.asarray(eT, dtype),
        rel_sqrt_info=jnp.asarray(eS, dtype),
        rel_valid=jnp.asarray(rv),
    )
    # dummy camera (no observations are valid)
    from okvis2x_tpu.cameras import pinhole

    cam = pinhole.make_pinhole(1.0, 1.0, 0.0, 0.0, 2, 2, model="none", dtype=dtype)
    cams = gn.stack_cameras([cam])
    cfg = gn.SolverConfig(max_iterations=iterations, estimate_landmarks=False)
    p_opt, cost = gn.optimize(p, cams, cfg)
    return np.asarray(p_opt.T_WS)[:K0], float(cost)
