"""Dual-graph architecture: background full-graph optimisation + realtime
synchronisation with backlog replay (≙ ViSlamBackend's realtimeGraph_/
fullGraph_ + synchroniseRealtimeAndFullGraph, ViSlamBackend.hpp:724-743)."""

import jax.numpy as jnp
import numpy as np

from okvis2x_tpu.core import se3
from okvis2x_tpu.graph import FrameState
from okvis2x_tpu.graph.fullgraph import FullGraphOptimizer

from test_loopclosure import circle_poses, make_est


def _drifted(gt, drift_rate=0.02):
    out = []
    for k, T in enumerate(gt):
        d = jnp.asarray(
            np.concatenate([np.array([1.0, 0.5, 0.1]) * drift_rate * k,
                            np.array([0, 0, drift_rate * k])])
        )
        out.append(np.asarray(se3.retract(jnp.asarray(T), d)))
    return out


def _build(est, gt, drifted, n):
    for k in range(n):
        f = FrameState(
            fid=k, timestamp=float(k), T_WS=drifted[k].copy(),
            sb=np.zeros(9), is_keyframe=True,
            pose_graph_frame=(k < n - 2),
        )
        if k < n - 4:
            est.archive_frames[k] = f
        else:
            est.frames.append(f)
    for k in range(n - 1):
        T_ij = np.asarray(
            se3.se3_multiply(
                se3.se3_inverse(jnp.asarray(gt[k])), jnp.asarray(gt[k + 1])
            )
        )
        e = dict(i=k, j=k + 1, T_ij=T_ij, sqrt_info=np.eye(6) * 100.0)
        if k < n - 4:
            est.archive_edges.append(e)
        else:
            est.rel_edges.append(e)


def _loop_edge(gt, n):
    return np.asarray(
        se3.se3_multiply(
            se3.se3_inverse(jnp.asarray(gt[0])), jnp.asarray(gt[n - 1])
        )
    )


def test_background_matches_synchronous():
    """dispatch + join + synchronise reproduces close_loop exactly when the
    realtime side is quiescent between snapshot and sync."""
    n = 12
    gt = circle_poses(n)
    drifted = _drifted(gt)

    est_sync = make_est()
    _build(est_sync, gt, drifted, n)
    est_bg = make_est()
    _build(est_bg, gt, drifted, n)

    T_loop = _loop_edge(gt, n)
    assert est_sync.close_loop(n - 1, 0, T_loop, np.eye(6) * 500.0,
                               iterations=15)

    opt = FullGraphOptimizer(iterations=15, dtype=est_bg.cfg.dtype)
    assert est_bg.add_loop_edge(n - 1, 0, T_loop, np.eye(6) * 500.0)
    assert opt.dispatch(est_bg)
    assert not opt.dispatch(est_bg)  # single in-flight optimisation
    assert opt.join(timeout=120.0)
    assert opt.is_loop_closure_available
    assert opt.synchronise(est_bg)
    assert not opt.is_loop_closure_available  # result consumed

    ns, _ = est_sync.pose_graph()
    nb, _ = est_bg.pose_graph()
    for a, b in zip(ns, nb):
        np.testing.assert_allclose(a.T_WS, b.T_WS, atol=1e-9)


def test_backlog_replay_after_snapshot():
    """States added between dispatch and synchronise (the backlog) are
    rigidly re-anchored by the anchor keyframe's correction."""
    n = 12
    gt = circle_poses(n)
    drifted = _drifted(gt)
    est = make_est()
    _build(est, gt, drifted, n)

    opt = FullGraphOptimizer(iterations=15, dtype=est.cfg.dtype)
    assert est.add_loop_edge(n - 1, 0, _loop_edge(gt, n), np.eye(6) * 500.0)
    assert opt.dispatch(est)

    # the realtime window keeps moving: a new (non-keyframe) state is added
    # after the snapshot, placed relative to the drifted anchor n-1
    T_rel = np.array([0.3, 0.0, 0.0, 0, 0, 0, 1.0])  # 0.3 m ahead
    T_new = np.asarray(
        se3.se3_multiply(jnp.asarray(drifted[n - 1]), jnp.asarray(T_rel))
    )
    v_before = np.array([1.0, 0.0, 0.0])
    est.frames.append(
        FrameState(fid=n, timestamp=float(n), T_WS=T_new.copy(),
                   sb=np.concatenate([v_before, np.zeros(6)]),
                   is_keyframe=False)
    )

    assert opt.join(timeout=120.0)
    anchor_before = est.frames[-2].T_WS.copy()  # fid n-1, pre-sync
    assert opt.synchronise(est)

    anchor_after = est.frames[-2].T_WS
    # anchor moved towards ground truth
    assert (
        np.linalg.norm(anchor_after[:3] - gt[n - 1][:3])
        < np.linalg.norm(anchor_before[:3] - gt[n - 1][:3])
    )
    # backlog frame keeps its relative pose to the anchor
    T_rel_after = np.asarray(
        se3.se3_multiply(
            se3.se3_inverse(jnp.asarray(anchor_after)),
            jnp.asarray(est.frames[-1].T_WS),
        )
    )
    np.testing.assert_allclose(T_rel_after[:3], T_rel[:3], atol=1e-6)
    # velocity rotated by the anchor's rotation change
    dq = np.asarray(
        se3.se3_multiply(
            jnp.asarray(anchor_after),
            se3.se3_inverse(jnp.asarray(anchor_before)),
        )
    )[3:7]
    dR = np.asarray(se3.quat_to_matrix(jnp.asarray(dq)))
    np.testing.assert_allclose(
        est.frames[-1].sb[0:3], dR @ v_before, atol=1e-6
    )


def test_loop_edge_persists_in_pose_graph():
    n = 12
    gt = circle_poses(n)
    est = make_est()
    _build(est, gt, _drifted(gt), n)
    assert est.close_loop(n - 1, 0, _loop_edge(gt, n), np.eye(6) * 500.0)
    _, edges = est.pose_graph()
    assert any(e.get("loop") for e in edges)
    # a second snapshot includes the loop constraint
    snap = est.snapshot_pose_graph()
    pairs = set(zip(snap["ei"].tolist(), snap["ej"].tolist()))
    fid2i = {fid: i for i, fid in enumerate(snap["fids"])}
    assert (fid2i[0], fid2i[n - 1]) in pairs


def test_dispatch_rejects_tiny_graph():
    est = make_est()
    est.frames.append(
        FrameState(fid=0, timestamp=0.0,
                   T_WS=np.array([0, 0, 0, 0, 0, 0, 1.0]),
                   sb=np.zeros(9), is_keyframe=True)
    )
    opt = FullGraphOptimizer()
    assert not opt.dispatch(est)
    assert not opt.is_loop_closure_available
    assert not opt.synchronise(est)


def test_background_pcg_path_matches_dense():
    """With pcg_threshold=0 the worker routes through the edge-sharded
    matrix-free PCG solver (parallel/dist_posegraph); results must agree
    with the dense pose-graph solve."""
    n = 12
    gt = circle_poses(n)
    drifted = _drifted(gt)
    T_loop = _loop_edge(gt, n)

    results = []
    for thresh in (256, 0):
        est = make_est()
        _build(est, gt, drifted, n)
        opt = FullGraphOptimizer(iterations=15, dtype=est.cfg.dtype,
                                 pcg_threshold=thresh)
        assert est.add_loop_edge(n - 1, 0, T_loop, np.eye(6) * 500.0)
        assert opt.dispatch(est)
        assert opt.join(timeout=120.0)
        assert opt.synchronise(est)
        ns, _ = est.pose_graph()
        results.append([f.T_WS.copy() for f in ns])

    for a, b in zip(*results):
        np.testing.assert_allclose(a, b, atol=1e-6)

def test_stale_result_discarded_after_correction():
    """A correction applied between dispatch and synchronise (loop-closure
    surgery, another sync, a GPS re-alignment) makes the in-flight
    snapshot stale: applying it would re-anchor the live window into the
    pre-correction world (measured: a 6.75 m teleport at t=160 s of the
    185 s circuit, baked into two-pose edges by marginalisation — final
    ATE 8.1 m).  The optimiser must discard the result instead."""
    n = 12
    gt = circle_poses(n)
    drifted = _drifted(gt)
    est = make_est()
    _build(est, gt, drifted, n)

    opt = FullGraphOptimizer(iterations=15, dtype=est.cfg.dtype)
    assert est.add_loop_edge(n - 1, 0, _loop_edge(gt, n), np.eye(6) * 500.0)
    assert opt.dispatch(est)
    assert opt.join(timeout=120.0)

    # a synchronous correction lands while the result is pending
    est.rigid_transform(np.array([5.0, 0, 0, 0, 0, 0, 1.0]),
                        session_only=False)
    poses_after_surgery = [f.T_WS.copy() for f in est.pose_graph()[0]]

    assert not opt.synchronise(est)  # stale -> discarded
    assert opt.n_stale_discarded == 1
    assert not opt.is_loop_closure_available  # consumed, not retriable
    for a, b in zip(poses_after_surgery, est.pose_graph()[0]):
        np.testing.assert_allclose(a, b.T_WS, atol=0)  # untouched

    # the next dispatch snapshots consistent state and applies cleanly
    assert opt.dispatch(est)
    assert opt.join(timeout=120.0)
    assert opt.synchronise(est)
