"""Multi-session mapping: component save/load + relocalisation of a new
session against a loaded map (≙ Frontend::loadComponent building per-
component DBoW databases, okvis_frontend/src/Frontend.cpp:163-201, and the
multi-session place-recognition path Frontend.cpp:813-857)."""

import jax.numpy as jnp
import numpy as np
import pytest

from okvis2x_tpu.cameras import distortion as dist
from okvis2x_tpu.cameras import pinhole
from okvis2x_tpu.core import se3
from okvis2x_tpu.graph import EstimatorConfig, FrameState, SlidingWindowEstimator
from okvis2x_tpu.pipeline.vio import PipelineConfig, VioPipeline


def _cam():
    return pinhole.make_pinhole(
        fx=400.0, fy=400.0, cx=320.0, cy=240.0, width=640, height=480,
        model=dist.NONE,
    )


def _pipe(seed=0, **cfg_kw):
    cam = _cam()
    est_cfg = EstimatorConfig(cap_frames=6, cap_landmarks=64, cap_obs=128,
                              cap_imu_links=5, cap_rel_edges=8)
    T_SC = np.array([[0, 0, 0, 0, 0, 0, 1.0]])
    return VioPipeline([cam], T_SC, est_cfg,
                       PipelineConfig(vocab_k=32, **cfg_kw))


def _pose(x, yaw=0.0):
    q = np.asarray(se3.delta_q(jnp.asarray([0.0, 0.0, yaw])))
    return np.concatenate([np.array([x, 0.0, 0.0]), q])


def _make_session_a(tmp_path, rng):
    """Session A: a straight 6-keyframe corridor with descriptors +
    landmark snapshots; returns (component path, per-frame data)."""
    pipe = _pipe()
    est = pipe.est
    n, n_kp = 6, 80
    frames = []
    for k in range(n):
        T = _pose(2.0 * k)
        est.archive_frames[k] = FrameState(
            fid=k, timestamp=float(k), T_WS=T.copy(), sb=np.zeros(9),
            is_keyframe=True, pose_graph_frame=True,
        )
        if k:
            T_ij = np.asarray(
                se3.se3_multiply(
                    se3.se3_inverse(jnp.asarray(_pose(2.0 * (k - 1)))),
                    jnp.asarray(T),
                )
            )
            est.archive_edges.append(
                dict(i=k - 1, j=k, T_ij=T_ij, sqrt_info=np.eye(6) * 100.0)
            )
        # landmarks ~5 m ahead of the camera (optical axis = +z, a
        # side-looking corridor as the rig moves along +x)
        pts = np.array([2.0 * k, 0, 5.0]) + rng.normal(
            scale=[2.0, 1.5, 0.8], size=(n_kp, 3)
        )
        packed = rng.integers(0, 2**32, (n_kp, 12), dtype=np.uint64).astype(
            np.uint32
        )
        cam = pipe.cameras[0]
        T_SW = se3.se3_inverse(jnp.asarray(T))
        p_C = np.asarray(
            jnp.stack([se3.se3_apply(T_SW, jnp.asarray(p)) for p in pts])
        )
        uv, ok = pinhole.project(cam, jnp.asarray(p_C))
        uv, ok = np.asarray(uv), np.asarray(ok)
        pipe.kf_records[k] = dict(
            t=float(k), packed=packed, valid=ok.copy(), uv=uv,
            lm_pos=np.where(ok[:, None], pts, np.nan),
            T_WS=T.copy(), path=2.0 * k,
        )
        frames.append(dict(T=T, pts=pts, packed=packed, ok=ok))
    path = str(tmp_path / "session_a.npz")
    pipe.save_component(path)
    return path, frames


def test_component_roundtrip_and_reloc(tmp_path):
    rng = np.random.default_rng(5)
    comp_path, frames_a = _make_session_a(tmp_path, rng)

    pipe = _pipe()
    assert pipe.load_component(comp_path)
    assert pipe.vocab is not None  # bootstrapped from the component
    assert len(pipe.components) == 1
    comp = pipe.components[0]
    assert len(comp["records"]) == 6
    # component nodes entered the pose graph as fixed negative-fid frames
    neg = [f for f in pipe.est.archive_frames if f < 0]
    assert len(neg) == 6
    assert all(pipe.est.archive_frames[f].pose_fixed for f in neg)

    # session B: starts at A's keyframe 3, but its own world frame is
    # offset by 1.5 m lateral + 0.1 rad yaw (inter-session offset)
    k_match = 3
    T_true = frames_a[k_match]["T"]  # pose in the MAP frame
    dT_off = np.asarray(
        se3.se3_multiply(
            jnp.asarray(np.concatenate([[0, 1.5, 0.3], [0, 0, 0, 1.0]])),
            jnp.asarray(
                np.concatenate(
                    [[0, 0, 0], np.asarray(se3.delta_q(jnp.asarray([0, 0, 0.1])))]
                )
            ),
        )
    )
    T_B = np.asarray(
        se3.se3_multiply(jnp.asarray(dT_off), jnp.asarray(T_true))
    )  # what session B believes its pose is
    est = pipe.est
    fid = est.add_state if False else None  # (manual state below)
    f = FrameState(fid=0, timestamp=0.0, T_WS=T_B.copy(), sb=np.zeros(9),
                   is_keyframe=True)
    est.frames.append(f)
    est._next_fid = 1

    # B observes A's frame-3 landmarks from T_true: uv from the TRUE pose,
    # descriptors identical to A's (perfect re-detection)
    rec_a = frames_a[k_match]
    cam = pipe.cameras[0]
    T_SW = se3.se3_inverse(jnp.asarray(T_true))
    p_C = np.asarray(
        jnp.stack([se3.se3_apply(T_SW, jnp.asarray(p)) for p in rec_a["pts"]])
    )
    uv, ok = pinhole.project(cam, jnp.asarray(p_C))
    rec_b = dict(
        t=0.0, packed=rec_a["packed"].copy(),
        valid=np.asarray(ok), uv=np.asarray(uv),
        lm_pos=np.full((len(rec_a["pts"]), 3), np.nan),
        T_WS=T_B.copy(), path=0.0,
    )
    pipe.kf_records[0] = rec_b

    from okvis2x_tpu.frontend import bow, descriptor

    # bow.assign handles both the flat and the (shipped) hierarchical
    # vocabulary — the pipeline now loads resources/vocab_b64l64.npz
    words = np.asarray(
        bow.assign(
            descriptor.unpack_pm1(
                jnp.asarray(rec_b["packed"]), jnp.asarray(rec_b["valid"])
            ),
            pipe.vocab,
        )
    )
    assert pipe._attempt_relocalisation(0, words, rec_b)
    assert pipe.relocalised
    assert pipe.n_relocalisations == 1

    # the session pose is now expressed in the map frame: the 1.5 m / 0.1
    # rad inter-session offset collapses to RANSAC-level accuracy
    T_after = est.get_state(0).T_WS
    err = np.linalg.norm(T_after[:3] - T_true[:3])
    assert err < 0.2, err
    q_err = 2 * np.arccos(
        np.clip(abs(np.dot(T_after[3:7], T_true[3:7])), 0, 1)
    )
    assert q_err < 0.05, q_err


def test_reloc_requires_records(tmp_path):
    pipe = _pipe()
    est = pipe.est
    est.archive_frames[0] = FrameState(
        fid=0, timestamp=0.0, T_WS=_pose(0.0), sb=np.zeros(9),
        is_keyframe=True, pose_graph_frame=True,
    )
    path = str(tmp_path / "bare.npz")
    from okvis2x_tpu.graph import component as comp_mod

    comp_mod.save_component(path, est)  # no records
    pipe_b = _pipe()
    assert not pipe_b.load_component(path)


def test_import_component_frames_remaps_negative():
    est = _pipe().est
    fid_map = est.import_component_frames(
        [0, 1], [10.0, 11.0],
        np.stack([_pose(0.0), _pose(1.0)]),
        [dict(i=0, j=1, T_ij=_pose(1.0), sqrt_info=np.eye(6))],
        fixed=True,
    )
    assert set(fid_map.values()) == {-1, -2}
    assert est.archive_frames[-1].pose_fixed
    e = est.archive_edges[-1]
    assert e["i"] == -1 and e["j"] == -2
    # timestamps shifted before the session
    assert est.archive_frames[-1].timestamp < -1e5
