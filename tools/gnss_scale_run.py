#!/usr/bin/env python
"""GNSS-fused SLAM proof run at scale (≙ BASELINE configs[4]: VBR + GNSS).

Drives the full VIO pipeline over a long circuit with a 5 Hz GNSS stream in
a shifted + yawed G frame, including:

  * 4-dof T_GW initialisation from trajectory/fix least squares
    (estimator._attempt_gps_alignment ≙ attemptFullGpsAlignment,
    okvis_ceres/src/ViSlamBackend.cpp:2557-2758);
  * async GNSS position factors with IMU bridge preintegration inside the
    realtime window (factors/gps.py ≙ GpsErrorAsynchronous);
  * a DROPOUT window (fixes withheld) driving the status machine
    Initialised -> ReInitialising -> re-alignment on signal return;
  * dense-depth occupancy submaps active throughout (stereo depth
    integrated per keyframe, ≙ the submapping interface lifecycle).

Reports frames, fixes consumed, factor counts, status transitions, the
recovered-vs-true T_GW error (yaw + translation), online/final ATE in W,
and the GLOBAL (G-frame) ATE through the recovered T_GW — before/after
final BA.

Usage: python tools/gnss_scale_run.py [--duration 150] [--out GNSS.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

# must match io/synthetic.generate's GNSS writer
TRUE_YAW_G = 0.4
TRUE_T_G = np.array([30.0, -12.0, 4.0])


def run(duration=150.0, dropout=(55.0, 85.0), verbose=True, max_frames=0):
    from okvis2x_tpu.utils import jaxconfig

    jaxconfig.setup()

    import jax.numpy as jnp

    from okvis2x_tpu.cameras import pinhole
    from okvis2x_tpu.core import se3np
    from okvis2x_tpu.graph import EstimatorConfig
    from okvis2x_tpu.io import synthetic, trajectory_io
    from okvis2x_tpu.io.xdataset import XDataset
    from okvis2x_tpu.mapping.submap import SubmapConfig
    from okvis2x_tpu.pipeline.submapping import (SubmappingConfig,
                                                 SubmappingInterface)
    from okvis2x_tpu.pipeline.vio import PipelineConfig, VioPipeline
    from tools import slam_bench

    params = dict(
        duration=float(duration), frame_rate=20.0, imu_rate=200.0,
        width=752, height=480, fx=460.0, density=22.0, seed=3,
        scene_version=2, with_gps=True, gps_rate=5.0, gps_sigma=0.05,
    )
    ds_dir = slam_bench.dataset_dir(params)
    marker = os.path.join(ds_dir, "DONE.json")
    if not os.path.exists(marker):
        t0 = time.time()
        if verbose:
            print(f"generating GNSS circuit dataset -> {ds_dir}",
                  file=sys.stderr)
        synthetic.generate(ds_dir, **params, trajectory="circuit",
                           progress=verbose)
        with open(marker, "w") as f:
            json.dump(params, f)
        if verbose:
            print(f"generated in {time.time()-t0:.0f} s", file=sys.stderr)
    ds = XDataset(ds_dir, num_cams=2)
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
    est_cfg = EstimatorConfig(
        cap_landmarks=1024, cap_obs=8192, max_iterations=10,
        early_exit_rel=5e-4,
    )
    pipe_cfg = PipelineConfig(
        max_keypoints=704, do_loop_closures=True, async_loop_closure=True,
        pose_refine=False, deferred_frontend=True, pipeline_depth=1,
    )
    vio = VioPipeline([cam, cam], T_SC, est_cfg, pipe_cfg)
    t_pre = vio.precompile()
    if verbose:
        print(f"precompile: {t_pre:.1f} s", file=sys.stderr, flush=True)

    # dense-depth occupancy submaps, fed by keyframe stereo depth
    sub_cfg = SubmappingConfig(
        submap=SubmapConfig(dim=128, res=0.2),
        new_submap_kf_count=20, min_frames_integrated=4,
        align_points=200, sensor_sigma=0.4,
    )
    submapper = SubmappingInterface(sub_cfg)
    import jax

    from okvis2x_tpu.core import se3
    from okvis2x_tpu.models import stereo as stereo_mod

    fx = params["fx"]
    stereo_j = jax.jit(lambda l, r: stereo_mod.stereo_depth(
        l, r, fx, baseline, engine="census"))

    status_log = []  # (t, status) transitions
    n_fix_used = n_fix_dropped = 0
    n = 0
    last_status = vio.est.gps_status
    t0 = time.perf_counter()
    t_first = None
    for kind, data in ds.events():
        if kind == "imu":
            vio.add_imu_measurement(*data)
            continue
        if kind == "gps":
            t_g, pos, err = data
            if dropout[0] <= (t_g - (t_first or t_g)) <= dropout[1]:
                n_fix_dropped += 1
                continue  # signal loss window
            vio.add_gps_measurement(t_g, pos, err)
            n_fix_used += 1
            continue
        if kind != "frames" or not data.paths[0]:
            continue
        if t_first is None:
            t_first = data.t
        images = [ds.load_image(p) for p in data.paths if p]
        info = vio.process_frame(data.t, images)
        n += 1
        if vio.est.gps_status != last_status:
            status_log.append(
                (round(data.t - t_first, 2), vio.est.gps_status))
            last_status = vio.est.gps_status
        if info["is_keyframe"] and len(images) >= 2:
            # deferred frontend: the keyframe decision applies to
            # info["keyframe_fid"] (one frame back); the submap anchors on
            # that keyframe while the splat uses THIS frame's consistent
            # image+pose pair
            kf_fid = info.get("keyframe_fid") or info["fid"]
            try:
                T_WK = vio.est.get_state(kf_fid).T_WS
            except (KeyError, StopIteration):
                T_WK = info["T_WS"]
            sd = stereo_j(jnp.asarray(images[0], jnp.float32),
                          jnp.asarray(images[1], jnp.float32))
            T_WC = np.asarray(se3.se3_multiply(
                jnp.asarray(info["T_WS"]), jnp.asarray(T_SC[0])))
            submapper.integrate_depth(
                kf_fid, T_WK, T_WC, cam,
                np.asarray(sd.depth), np.asarray(sd.sigma),
            )
        if verbose and n % 200 == 0:
            print(
                f"frame {n} gps={vio.est.gps_status} fixes={n_fix_used} "
                f"submaps={len(submapper.maps)} "
                f"loops={vio.n_loop_closures} "
                f"wall={time.perf_counter()-t0:.0f}s",
                file=sys.stderr, flush=True,
            )
        if max_frames and n >= max_frames:
            break
    vio.finish()

    def _tgw_error(T_GW):
        yaw = 2 * np.arctan2(T_GW[5], T_GW[6])
        dyaw = abs((yaw - TRUE_YAW_G + np.pi) % (2 * np.pi) - np.pi)
        dt_ = np.linalg.norm(T_GW[:3] - TRUE_T_G)
        return float(np.degrees(dyaw)), float(dt_)

    def _ate_global(ts, Ts):
        """UNALIGNED RMSE of the G-frame trajectory (through recovered
        T_GW) against the TRUE G-frame ground truth — the metric a GNSS
        user consumes.  Umeyama-aligned ATE is invariant to any rigid
        T_GW, so alignment here would just reproduce the local ATE and
        say nothing about the recovered transform."""
        T_GW = vio.est.T_GW
        p_G = se3np.se3_apply(T_GW, Ts[:, :3])
        Rg = se3np.quat_to_matrix(se3np.delta_q(
            np.array([0, 0, TRUE_YAW_G])))
        gt_G = gt[:, 1:4] @ Rg.T + TRUE_T_G
        ia, ib = trajectory_io.associate(ts, gt[:, 0])
        if len(ia) < 3:
            return float("nan")
        err = np.linalg.norm(p_G[ia] - gt_G[ib], axis=1)
        return float(np.sqrt((err ** 2).mean()))

    ts = np.array([s[0] for s in vio.states_log])
    Ts = np.stack([s[1] for s in vio.states_log])
    ate_online = trajectory_io.ate_rmse(ts, Ts[:, :3], gt[:, 0], gt[:, 1:4])
    ate_g_online = _ate_global(ts, Ts)
    yaw_err_deg, t_err_m = _tgw_error(vio.est.T_GW)

    t_fba0 = time.perf_counter()
    vio.est.final_ba()
    fts, fTs = vio.est.full_trajectory()
    ate_final = trajectory_io.ate_rmse(fts, fTs[:, :3], gt[:, 0], gt[:, 1:4])
    ate_g_final = _ate_global(fts, fTs)

    return dict(
        frames=n, duration_s=duration,
        gps_fixes_used=n_fix_used, gps_fixes_dropped=n_fix_dropped,
        dropout_window_s=list(dropout),
        gps_status_transitions=status_log,
        gps_status_final=vio.est.gps_status,
        t_gw_yaw_error_deg=round(yaw_err_deg, 3),
        t_gw_translation_error_m=round(t_err_m, 4),
        submaps=len(submapper.maps),
        loop_closures=vio.n_loop_closures,
        ate_online_m=round(float(ate_online), 4),
        ate_final_m=round(float(ate_final), 4),
        ate_global_online_m=round(float(ate_g_online), 4),
        ate_global_final_m=round(float(ate_g_final), 4),
        final_ba_s=round(time.perf_counter() - t_fba0, 1),
        precompile_s=round(t_pre, 1),
        wall_s=round(time.perf_counter() - t0, 1),
    )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--duration", type=float, default=150.0)
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    res = run(duration=args.duration, max_frames=args.max_frames)
    print(json.dumps(res))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(res, f, indent=1)
