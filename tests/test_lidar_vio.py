"""LiDAR-VI pipeline plumbing test: sweeps deskew + integrate + live
alignment edges flow into the estimator (structure test on a tiny synthetic
setup; full-dataset LiDAR accuracy runs on hardware milestones)."""

import numpy as np
import pytest

from okvis2x_tpu.cameras import distortion as dist
from okvis2x_tpu.cameras import pinhole
from okvis2x_tpu.graph import EstimatorConfig, FrameState
from okvis2x_tpu.io.xdataset import LidarSweep
from okvis2x_tpu.mapping.submap import SubmapConfig
from okvis2x_tpu.pipeline.submapping import SubmappingConfig
from okvis2x_tpu.pipeline.vio import PipelineConfig, VioPipeline
from okvis2x_tpu.pipeline.lidar_vio import LidarVioPipeline

RNG = np.random.default_rng(23)


def make_pipe():
    cam = pinhole.make_pinhole(
        fx=100.0, fy=100.0, cx=64.0, cy=48.0, width=128, height=96,
        model=dist.NONE,
    )
    est_cfg = EstimatorConfig(
        cap_frames=8, num_keyframes=3, num_imu_frames=2,
        cap_landmarks=64, cap_obs=256, cap_imu_links=7, cap_rel_edges=8,
    )
    vio = VioPipeline(
        [cam], np.array([[0, 0, 0, 0, 0, 0, 1.0]]), est_cfg,
        PipelineConfig(do_loop_closures=False),
    )
    sub_cfg = SubmappingConfig(
        submap=SubmapConfig(dim=64, res=0.2), min_frames_integrated=1,
        align_points=128,
    )
    return LidarVioPipeline(vio, sub_cfg)


def wall_sweep(t, n=400, z=3.0, offset=np.zeros(3)):
    xy = RNG.uniform(-2.5, 2.5, (n, 2))
    pts = np.concatenate([xy, np.full((n, 1), z)], -1) - offset
    return LidarSweep(
        t=t, t_point=np.linspace(t - 0.1, t, n), pts=pts,
        intensity=np.ones(n),
    )


def test_lidar_pipeline_integration_and_live_edges():
    pipe = make_pipe()
    est = pipe.est

    # seed estimator frames manually (no images needed for the LiDAR path)
    for k in range(3):
        est.frames.append(
            FrameState(fid=k, timestamp=0.1 * k,
                       T_WS=np.array([0.02 * k, 0, 0, 0, 0, 0, 1.0]),
                       sb=np.zeros(9), is_keyframe=True)
        )
    pipe.vio.last_kf_fid = 0

    out1 = pipe.process_lidar_sweep(wall_sweep(0.15))
    assert out1["integrated"]
    assert len(pipe.submapper.maps) == 1
    a = pipe.submapper.active
    assert a.n_frames == 1

    out2 = pipe.process_lidar_sweep(wall_sweep(0.25))
    assert out2["integrated"]
    # live frame-to-map alignment edge created once the map has content
    out3 = pipe.process_lidar_sweep(wall_sweep(0.3))
    live = [e for e in est.rel_edges if e.get("live")]
    if out3["live_edge"]:
        assert len(live) == 1
        # the wall constrains z strongly in the edge information
        H = live[0]["sqrt_info"].T @ live[0]["sqrt_info"]
        assert H[2, 2] > H[0, 0]

    # replacing, not accumulating
    pipe.process_lidar_sweep(wall_sweep(0.35))
    assert len([e for e in est.rel_edges if e.get("live")]) <= 1


def test_lidar_keyframe_trigger():
    pipe = make_pipe()
    est = pipe.est
    for k in range(2):
        est.frames.append(
            FrameState(fid=k, timestamp=0.1 * k,
                       T_WS=np.array([0, 0, 0, 0, 0, 0, 1.0]),
                       sb=np.zeros(9), is_keyframe=True)
        )
    pipe.vio.last_kf_fid = 0
    pipe.process_lidar_sweep(wall_sweep(0.15))
    pipe.process_lidar_sweep(wall_sweep(0.2))
    assert not pipe.request_keyframe
    # sweep observing a completely different wall -> low overlap -> trigger
    pipe.process_lidar_sweep(wall_sweep(0.25, offset=np.array([0, 0, 9.0])))
    assert pipe.request_keyframe


def _drift_recovery(cap_icp: int) -> float:
    """Build a wall map from true poses, then optimise a z-drifted frame
    with the live frame-to-map constraint; returns |z| error after solve."""
    cam = pinhole.make_pinhole(
        fx=100.0, fy=100.0, cx=64.0, cy=48.0, width=128, height=96,
        model=dist.NONE,
    )
    est_cfg = EstimatorConfig(
        cap_frames=8, num_keyframes=4, num_imu_frames=2,
        cap_landmarks=64, cap_obs=256, cap_imu_links=7, cap_rel_edges=8,
        cap_icp=cap_icp, max_iterations=6,
    )
    vio = VioPipeline(
        [cam], np.array([[0, 0, 0, 0, 0, 0, 1.0]]), est_cfg,
        PipelineConfig(do_loop_closures=False),
    )
    sub_cfg = SubmappingConfig(
        submap=SubmapConfig(dim=96, res=0.05, band_samples=16),
        min_frames_integrated=1, align_points=128, sensor_sigma=0.1,
    )
    # voxel filter at grid pitch (0.3 m default would decimate the wall
    # to ~150 points on a 5 cm grid and leave the surface unpainted)
    pipe = LidarVioPipeline(vio, sub_cfg, voxel=0.05,
                            max_points_per_sweep=4096)
    est = pipe.est

    for k in range(3):
        est.frames.append(
            FrameState(fid=k, timestamp=0.1 * k,
                       T_WS=np.array([0, 0, 0, 0, 0, 0, 1.0]),
                       sb=np.zeros(9), is_keyframe=True,
                       pose_fixed=True, sb_fixed=True,
                       pose_graph_frame=True)
        )
    pipe.vio.last_kf_fid = 0
    # dense wall paint (ray spacing ~ voxel pitch)
    for t in (0.15, 0.22, 0.28):
        xy = np.stack(np.meshgrid(np.linspace(-2, 2, 70),
                                  np.linspace(-1.5, 1.5, 52)), -1).reshape(-1, 2)
        n = len(xy)
        pts = np.concatenate([xy, np.full((n, 1), 2.0)], -1)
        pipe.process_lidar_sweep(LidarSweep(
            t=t, t_point=np.linspace(t - 0.05, t, n), pts=pts,
            intensity=np.ones(n),
        ))

    # drifted frame: believes it is 8 cm behind its true pose
    dz = -0.08
    # (seeded frames are pose-graph frames so no phantom IMU links tie the
    # drifted frame to them — the live map constraint acts alone)
    est.frames.append(
        FrameState(fid=3, timestamp=0.35,
                   T_WS=np.array([0, 0, dz, 0, 0, 0, 1.0]),
                   sb=np.zeros(9), is_keyframe=False, sb_fixed=True)
    )
    # sweep measured from the TRUE pose (wall at 2 m); timestamps bracket
    # only the drifted frame so deskew is identity (deskew between a truth
    # frame and the drifted frame would warp the points by the drift)
    xy = RNG.uniform(-1.8, 1.8, (300, 2))
    pts = np.concatenate([xy, np.full((300, 1), 2.0)], -1)
    pipe.process_lidar_sweep(LidarSweep(
        t=0.40, t_point=np.linspace(0.36, 0.40, 300), pts=pts,
        intensity=np.ones(300),
    ))
    est.optimise()
    return abs(float(est.frames[-1].T_WS[2]))


@pytest.mark.slow
def test_perpoint_icp_beats_compressed_edge():
    """VERDICT item 3 'done' gate: live per-point SubmapIcp rows inside the
    window LM recover a drifted pose better than the compressed
    relative-pose edge (which pins the drift at its frozen linearisation
    point)."""
    err_live = _drift_recovery(cap_icp=128)
    err_edge = _drift_recovery(cap_icp=0)
    assert err_live < 0.03, (err_live, err_edge)
    assert err_live < 0.5 * err_edge, (err_live, err_edge)
