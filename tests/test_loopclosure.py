"""Loop-closure machinery: pose-graph correction of accumulated drift
(estimator-level; BoW retrieval and RANSAC verification are unit-tested in
test_bow_ransac.py).  Mirrors the intent of the reference's
attemptLoopClosure / optimiseFullGraph path."""

import jax.numpy as jnp
import numpy as np

from okvis2x_tpu.cameras import distortion as dist
from okvis2x_tpu.cameras import pinhole
from okvis2x_tpu.core import se3
from okvis2x_tpu.graph import EstimatorConfig, FrameState, SlidingWindowEstimator


def make_est():
    cam = pinhole.make_pinhole(
        fx=400.0, fy=400.0, cx=320.0, cy=240.0, width=640, height=480,
        model=dist.NONE,
    )
    cfg = EstimatorConfig(cap_frames=6, cap_landmarks=8, cap_obs=16,
                          cap_imu_links=5, cap_rel_edges=8)
    T_SC = np.array([[0, 0, 0, 0, 0, 0, 1.0]])
    return SlidingWindowEstimator(cfg, [cam], T_SC)


def circle_poses(n, radius=5.0):
    """Ground-truth keyframes around a circle (closes after n steps)."""
    out = []
    for k in range(n):
        th = 2 * np.pi * k / n
        t = np.array([radius * np.cos(th), radius * np.sin(th), 0.0])
        q = np.asarray(se3.delta_q(jnp.asarray([0.0, 0.0, th + np.pi / 2])))
        out.append(np.concatenate([t, q]))
    return out


def test_close_loop_corrects_drift():
    est = make_est()
    n = 12
    gt = circle_poses(n)

    # drifted estimates: growing yaw+translation error
    drift_rate = 0.02
    drifted = []
    for k, T in enumerate(gt):
        d = jnp.asarray(
            np.concatenate([np.array([1.0, 0.5, 0.1]) * drift_rate * k,
                            np.array([0, 0, drift_rate * k])])
        )
        drifted.append(np.asarray(se3.retract(jnp.asarray(T), d)))

    # archived pose-graph frames 0..n-3, active window n-2, n-1
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

    # odometry edges from ground truth (perfect relative measurements)
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

    # loop edge: last frame sees frame 0 at the ground-truth relative pose
    T_loop = np.asarray(
        se3.se3_multiply(
            se3.se3_inverse(jnp.asarray(gt[0])), jnp.asarray(gt[n - 1])
        )
    )
    ok = est.close_loop(n - 1, 0, T_loop, np.eye(6) * 500.0, iterations=15)
    assert ok

    nodes, _ = est.pose_graph()
    err = []
    for f in nodes:
        err.append(np.linalg.norm(f.T_WS[:3] - gt[f.fid][:3]))
    err = np.array(err)
    # drift before: up to drift_rate*(n-1)*|[1, .5, .1]| ≈ 0.25
    assert err.max() < 0.05, err


def test_close_loop_rejects_unknown_frames():
    est = make_est()
    est.frames.append(
        FrameState(fid=0, timestamp=0.0, T_WS=np.array([0, 0, 0, 0, 0, 0, 1.0]),
                   sb=np.zeros(9), is_keyframe=True)
    )
    assert not est.close_loop(0, 99, np.array([0, 0, 0, 0, 0, 0, 1.0]), np.eye(6))
