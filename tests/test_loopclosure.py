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


def test_expand_merge_recovers_drift():
    """VERDICT items 4/5 gate (estimator level): after a loop closure the
    recognised keyframe re-enters the window (addLoopClosureFrame), its
    archived observations re-expand (expandKeyframe/convertToObservations),
    duplicated landmarks merge (mergeLandmarks) — and the window
    re-optimisation then recovers the drift, which the pose-graph-only
    path cannot (no observation ties the drifted frames to the old map)."""
    cam = pinhole.make_pinhole(
        fx=400.0, fy=400.0, cx=320.0, cy=240.0, width=640, height=480,
        model=dist.NONE,
    )
    cfg = EstimatorConfig(cap_frames=8, cap_landmarks=128, cap_obs=512,
                          cap_imu_links=7, cap_rel_edges=8, max_iterations=25)
    T_SC = np.array([[0, 0, 0, 0, 0, 0, 1.0]])
    rng = np.random.default_rng(2)
    pts = np.stack(
        [rng.uniform(-2, 2, 40), rng.uniform(-1.5, 1.5, 40),
         rng.uniform(4, 7, 40)], -1
    )
    T_true = np.array([0, 0, 0, 0, 0, 0, 1.0])
    # residual drift AFTER the pose-graph loop correction (the reference
    # also merges only after attemptLoopClosure distributed the loop error;
    # larger offsets are robust-downweighted as outliers by design)
    drift = np.array([0.05, -0.03, 0.02])

    def project(T_WS, pt):
        T_CW = np.asarray(
            se3.se3_inverse(jnp.asarray(T_WS, jnp.float64))
        )
        p_C = np.asarray(se3.se3_apply(jnp.asarray(T_CW), jnp.asarray(pt)))
        uv, ok = pinhole.project(cam, jnp.asarray(p_C))
        return np.asarray(uv), bool(ok)

    def build(merge: bool):
        est = SlidingWindowEstimator(cfg, [cam], T_SC)
        # archived keyframe A at the true pose with true landmarks
        A = FrameState(fid=100, timestamp=0.0, T_WS=T_true.copy(),
                       sb=np.zeros(9), is_keyframe=True, pose_fixed=True,
                       pose_graph_frame=True)
        est.archive_frames[100] = A
        lidsA = []
        for pt in pts:
            lid = est._next_lid
            est._next_lid += 1
            est.arch_lm[lid] = np.concatenate([pt, [1.0]])
            lidsA.append(lid)
            uv, ok = project(T_true, pt)
            if ok:
                est.archive_observation(100, 0, lid, uv, 1.0, 1.0, 0.0)

        # window frames B, C: constant drift, self-consistent duplicated map
        lidsB = {}
        for k, fid in enumerate((200, 201)):
            T_drift = T_true.copy()
            T_drift[:3] += drift
            T_drift[0] += 0.02 * k
            # expanded pose-graph frames: free poses, no IMU chain (this
            # bare test has no IMU data; phantom identity links would
            # inject bogus zero-motion + gravity residuals)
            est.frames.append(FrameState(
                fid=fid, timestamp=1.0 + 0.1 * k, T_WS=T_drift,
                sb=np.zeros(9), is_keyframe=True, sb_fixed=True,
                pose_graph_frame=True, expanded=True,
            ))
            for i, pt in enumerate(pts):
                true_Tk = T_true.copy()
                true_Tk[0] += 0.02 * k  # true relative motion matches belief
                uv, ok = project(true_Tk, pt)  # measured from TRUE pose
                if not ok:
                    continue
                if i not in lidsB:
                    lidsB[i] = est.add_landmark(
                        np.concatenate([pt + drift, [1.0]])
                    )
                est.add_observation(fid, 0, lidsB[i], uv)

        assert est.add_loopclosure_frame(100)
        # keep the old keyframe as the gauge anchor (production windows
        # carry frozen pose-graph frames; this bare problem has none)
        est._frame_by_id(100).pose_fixed = True
        if merge:
            for i, lid_new in lidsB.items():
                est.merge_landmarks(lidsA[i], lid_new)
        est.optimise()
        err = np.linalg.norm(est.frames[-1].T_WS[:3] - np.array([0.02, 0, 0]))
        return est, err

    est_m, err_merged = build(merge=True)
    _, err_plain = build(merge=False)
    # merged path: drift recovered
    assert err_merged < 0.01, (err_merged, err_plain)
    # pose-graph-only (no merge): drift remains
    assert err_plain > 0.04, (err_merged, err_plain)
    # bookkeeping: frame 100 is in the window, expanded, with live obs
    f100 = est_m._frame_by_id(100)
    assert f100.expanded and f100.pose_graph_frame
    assert (est_m.obs_fid == 100).sum() > 20
    # release: observations return to archive
    est_m.remove_loopclosure_frame(100)
    assert all(f.fid != 100 for f in est_m.frames)
    assert (est_m.arch_obs_fid == 100).sum() > 20


def test_pose_graph_sync_moves_archived_landmarks():
    """Archived landmark snapshots must move WITH their host keyframe when
    a pose-graph correction lands (≙ synchroniseRealtimeAndFullGraph
    transforming landmarks with their host frames,
    okvis_ceres/src/ViSlamBackend.cpp:1589-1870); hostless ones follow the
    rigid backlog delta.  Stale arch_lm after a metre-scale loop
    correction poisons expand_keyframe restores and the segmented
    final-BA initialisation."""
    est = make_est()
    Ta_old = np.array([1.0, 2.0, 0.0, 0, 0, 0, 1.0])
    est.archive_frames[100] = FrameState(
        fid=100, timestamp=0.0, T_WS=Ta_old.copy(), sb=np.zeros(9),
        is_keyframe=True, pose_graph_frame=True,
    )
    # landmark hosted by fid 100 (archived observation links it)
    p_S = np.array([0.5, -0.2, 3.0])  # point fixed in A's body frame
    hp = np.concatenate(
        [np.asarray(se3.se3_apply(jnp.asarray(Ta_old), jnp.asarray(p_S))),
         [1.0]]
    )
    est.arch_lm[7] = hp.copy()
    est.archive_observation(100, 0, 7, np.array([320.0, 240.0]))
    # hostless landmark: no archived observation anywhere
    est.arch_lm[8] = np.array([9.0, 9.0, 9.0, 1.0])
    # anchor window frame, also a snapshot node
    Tb_old = np.array([2.0, 2.0, 0.0, 0, 0, 0, 1.0])
    est.frames.append(FrameState(
        fid=200, timestamp=1.0, T_WS=Tb_old.copy(), sb=np.zeros(9),
        is_keyframe=True,
    ))

    Ta_new = np.asarray(se3.retract(
        jnp.asarray(Ta_old), jnp.asarray([0.3, -0.1, 0.05, 0.0, 0.0, 0.2])
    ))
    Tb_new = Tb_old.copy()
    Tb_new[0] += 0.1
    ok = est.apply_pose_graph_result([100, 200], np.stack([Ta_new, Tb_new]))
    assert ok
    # hosted: rigid in the host frame => T_new * p_S
    expect = np.asarray(se3.se3_apply(jnp.asarray(Ta_new), jnp.asarray(p_S)))
    assert np.allclose(est.arch_lm[7][:3], expect, atol=1e-9), est.arch_lm[7]
    # hostless: anchor delta is a pure +0.1 x-translation
    assert np.allclose(est.arch_lm[8][:3], [9.1, 9.0, 9.0], atol=1e-9)
