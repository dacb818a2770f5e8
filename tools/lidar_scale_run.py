#!/usr/bin/env python
"""Hilti-scale tightly-coupled LiDAR-VI proof run.

Drives the full LidarVioPipeline (stereo + IMU + LiDAR) over the circuit
benchmark at Hilti'22-like scale: 60 s, ~600 motion-distorted sweeps
(ray times spread across each 0.1 s sweep, poses from the TRUE intra-sweep
trajectory — exercising the per-ray IMU deskew), multiple keyframe-anchored
occupancy submaps with map-to-map alignment edges feeding the estimator
(≙ the reference's LiDAR path, ThreadedSlam.cpp:781-845 + SubmappingInterface
lifecycle), and an ATE bound against ground truth.

The sweep geometry is a cylinder hall (wall r=13 m, floor, ceiling) ray-cast
analytically per ray; the visual stream is the cached circuit dataset.

Writes a JSON result (frames, sweeps, submaps, alignment edges, ATE).

Usage: python tools/lidar_scale_run.py [--duration 60] [--out LIDAR.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

R_WALL = 13.0
Z_FLOOR = -1.6
Z_CEIL = 4.2
RAYS_PER_SWEEP = 512
SWEEP_PERIOD = 0.1


def make_sweep(t_end: float, rng) -> "LidarSweep":
    """Analytic ray-cast sweep from the TRUE (moving) trajectory."""
    from okvis2x_tpu.core import se3np
    from okvis2x_tpu.io.synthetic import circuit_trajectory
    from okvis2x_tpu.io.xdataset import LidarSweep

    n = RAYS_PER_SWEEP
    t_point = t_end - SWEEP_PERIOD + np.linspace(0.0, SWEEP_PERIOD, n)
    az = np.linspace(-np.pi, np.pi, n, endpoint=False)
    el = 0.3 * np.sin(np.linspace(0, 16 * np.pi, n))  # interleaved rings
    d_S = np.stack(
        [np.cos(el) * np.cos(az), np.cos(el) * np.sin(az), np.sin(el)], -1
    )
    p, q, _, _, _ = circuit_trajectory(t_point)
    C = se3np.quat_to_matrix(q)  # (n, 3, 3)
    d_W = np.einsum("nij,nj->ni", C, d_S)
    o = p

    # ray-cast: cylinder |xy|=R_WALL, floor, ceiling; nearest positive hit
    s_best = np.full(n, np.inf)
    # cylinder: |o_xy + s d_xy|^2 = R^2
    a = (d_W[:, :2] ** 2).sum(1)
    b = 2 * (o[:, :2] * d_W[:, :2]).sum(1)
    c = (o[:, :2] ** 2).sum(1) - R_WALL**2
    disc = b * b - 4 * a * c
    ok = (disc > 0) & (a > 1e-9)
    s_cyl = np.where(ok, (-b + np.sqrt(np.maximum(disc, 0.0))) / (2 * a), np.inf)
    s_best = np.where((s_cyl > 0.1), np.minimum(s_best, s_cyl), s_best)
    for z_pl, down in ((Z_FLOOR, True), (Z_CEIL, False)):
        dz = d_W[:, 2]
        s_pl = np.where(np.abs(dz) > 1e-6, (z_pl - o[:, 2]) / dz, np.inf)
        s_best = np.where(s_pl > 0.1, np.minimum(s_best, s_pl), s_best)
    hit = np.isfinite(s_best) & (s_best < 25.0)
    p_hit = o + s_best[:, None] * d_W
    # back into the (moving) sensor frame + range noise
    p_S = np.einsum("nji,nj->ni", C, p_hit - o)
    p_S = p_S + rng.normal(0, 0.01, p_S.shape)
    return LidarSweep(
        t=t_end, t_point=t_point[hit], pts=p_S[hit],
        intensity=np.ones(int(hit.sum())),
    )


def run(duration=60.0, verbose=True, max_frames=0):
    from okvis2x_tpu.utils import jaxconfig

    jaxconfig.setup()

    from okvis2x_tpu.cameras import pinhole
    from okvis2x_tpu.graph import EstimatorConfig
    from okvis2x_tpu.io import euroc, trajectory_io
    from okvis2x_tpu.mapping.submap import SubmapConfig
    from okvis2x_tpu.pipeline.lidar_vio import LidarVioPipeline
    from okvis2x_tpu.pipeline.submapping import SubmappingConfig
    from okvis2x_tpu.pipeline.vio import PipelineConfig, VioPipeline
    from tools import slam_bench

    params = dict(
        duration=float(duration), frame_rate=20.0, imu_rate=200.0,
        width=752, height=480, fx=460.0, density=22.0, seed=3,
        scene_version=2,
    )
    ds_dir = slam_bench.ensure_dataset(params, verbose)
    ds = euroc.EurocDataset(ds_dir, num_cams=2)
    gt = ds.ground_truth

    cam = pinhole.make_pinhole(
        fx=params["fx"], fy=params["fx"], cx=params["width"] / 2,
        cy=params["height"] / 2, width=params["width"],
        height=params["height"], model="radtan",
        dist_params=[-0.25, 0.06, 1e-4, -1e-4],
    )
    baseline = 0.11
    T_SC = np.array(
        [[-baseline / 2, 0, 0, 0, 0, 0, 1.0],
         [baseline / 2, 0, 0, 0, 0, 0, 1.0]]
    )
    est_cfg = EstimatorConfig(cap_landmarks=1024, cap_obs=8192,
                              max_iterations=10)
    # the LiDAR keyframe trigger needs synchronous keyframe decisions
    pipe_cfg = PipelineConfig(
        max_keypoints=704, do_loop_closures=True, async_loop_closure=True,
        pose_refine=False, deferred_frontend=False,
    )
    vio = VioPipeline([cam, cam], T_SC, est_cfg, pipe_cfg)
    n_align = []
    sub_cfg = SubmappingConfig(
        submap=SubmapConfig(dim=128, res=0.2),  # 25.6 m cube
        new_submap_kf_count=20, min_frames_integrated=4,
        align_points=200, sensor_sigma=0.4,
    )
    pipe = LidarVioPipeline(vio, sub_cfg, voxel=0.3,
                            max_points_per_sweep=2048)
    orig_cb = pipe._on_align_edge

    def count_cb(edge):
        n_align.append(edge)
        orig_cb(edge)

    pipe.submapper.align_callback = count_cb

    rng = np.random.default_rng(5)
    n = n_sweeps = 0
    next_sweep_t = 0.4
    t0 = time.perf_counter()
    for kind, data in ds.events():
        if kind == "imu":
            pipe.add_imu_measurement(*data)
            continue
        if kind != "frames" or not data.paths[0]:
            continue
        # sweeps up to this frame time
        while next_sweep_t <= data.t:
            pipe.process_lidar_sweep(make_sweep(next_sweep_t, rng))
            n_sweeps += 1
            next_sweep_t += SWEEP_PERIOD
        images = [ds.load_image(p) for p in data.paths if p]
        pipe.process_frame(data.t, images)
        n += 1
        if verbose and n % 100 == 0:
            print(
                f"frame {n} sweeps={n_sweeps} "
                f"submaps={len(pipe.submapper.maps)} "
                f"align={len(n_align)} wall={time.perf_counter()-t0:.0f}s",
                file=sys.stderr, flush=True,
            )
        if max_frames and n >= max_frames:
            break
    vio.finish()

    ts = np.array([s[0] for s in vio.states_log])
    Ts = np.stack([s[1] for s in vio.states_log])
    ate_online = trajectory_io.ate_rmse(ts, Ts[:, :3], gt[:, 0], gt[:, 1:4])
    vio.est.final_ba()
    fts, fTs = vio.est.full_trajectory()
    ate_final = trajectory_io.ate_rmse(
        fts, fTs[:, :3], gt[:, 0], gt[:, 1:4]
    )
    return dict(
        frames=n, sweeps=n_sweeps,
        submaps=len(pipe.submapper.maps),
        align_edges=len(n_align),
        rel_edges_live=sum(
            1 for e in vio.est.rel_edges if e.get("live")
        ),
        ate_online_m=round(float(ate_online), 4),
        ate_final_m=round(float(ate_final), 4),
        loop_closures=vio.n_loop_closures,
        wall_s=round(time.perf_counter() - t0, 1),
    )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--duration", type=float, default=60.0)
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    res = run(duration=args.duration, max_frames=args.max_frames)
    print(json.dumps(res))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(res, f, indent=1)
