#!/usr/bin/env python
"""Synchronous dataset app: VIO / SLAM / RGB-D / depth-network / LiDAR
submapping on EuRoC-layout (and extended) datasets.

The counterpart of the reference's CLI binaries (okvis_apps/src/
okvis_app_synchronous.cpp = --mode vio|slam; okvis2x_app_synchronous.cpp =
--mode rgbd|lidar; okvis2x_app_network_synchronous.cpp = --mode depth):
reads an okvis2.yaml-schema config + a dataset directory, runs the pipeline
synchronously, writes TUM trajectories (online + final-BA), submap exports,
and reports ATE against ground truth when available.

Usage:
  python apps/okvis2x_app.py --dataset /path/to/MH_01 \
      [--config config.yaml] [--mode vio|slam|depth|rgbd|lidar] \
      [--reader auto|euroc|xdataset|leica|rpg] [--output out/] \
      [--max-frames N] [--synthetic-test]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def pick_reader(name: str, ds_dir: str, num_cams: int):
    from okvis2x_tpu.io import euroc, leica, rpg, xdataset

    if name == "auto":
        if os.path.exists(os.path.join(ds_dir, "imu_bottom.csv")):
            name = "leica"
        elif os.path.exists(os.path.join(ds_dir, "left_images.txt")):
            name = "rpg"
        elif os.path.exists(os.path.join(ds_dir, "mav0", "depth0")) or \
                os.path.exists(os.path.join(ds_dir, "mav0", "lidar0")) or \
                os.path.exists(os.path.join(ds_dir, "mav0", "gps0")):
            name = "xdataset"
        else:
            name = "euroc"
    if name == "euroc":
        return euroc.EurocDataset(ds_dir, num_cams=num_cams)
    if name == "xdataset":
        return xdataset.XDataset(ds_dir, num_cams=num_cams)
    if name == "leica":
        return leica.LeicaDataset(ds_dir)
    if name == "rpg":
        return rpg.RpgDataset(ds_dir)
    raise ValueError(name)


def record_mode(args):
    """Dataset recorder (≙ okvis_apps/src/okvis_app_realsense_recorder.cpp):
    sensor callbacks → DatasetWriter, EuRoC layout. Uses the live Realsense
    when librealsense is present, else replays --dataset through the fake
    driver (deterministic CI path)."""
    from okvis2x_tpu.io.dataset_writer import DatasetWriter
    from okvis2x_tpu.io.realsense import FakeRealsense, Realsense

    writer = DatasetWriter(args.record)
    if args.dataset:
        ds = pick_reader(args.reader, args.dataset, 2)
        rs = FakeRealsense(ds)
    else:
        rs = Realsense()
    rs.set_imu_callback(writer.add_imu)
    rs.set_images_callback(writer.add_images)
    rs.set_depth_callback(lambda t, d: writer.add_depth(t, d))
    rs.start_streaming()
    try:
        if args.dataset:
            # fake driver: wait for the replay to finish naturally
            rs.wait_done()
            rs.stop_streaming()
        else:
            import time as _time

            _time.sleep(args.max_frames / 30.0 if args.max_frames else 10.0)
            rs.stop_streaming()
    finally:
        writer.close()
    print(f"recorded dataset at {args.record}")
    return None


def _submapping_config(args):
    from okvis2x_tpu.pipeline.submapping import SubmappingConfig

    if args.se2_config:
        from okvis2x_tpu.io.config import load_submap_config

        return SubmappingConfig.from_se2(load_submap_config(args.se2_config))
    return SubmappingConfig()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", required=False, help="dataset dir")
    ap.add_argument("--config", default=None, help="okvis2.yaml config")
    ap.add_argument("--se2-config", default=None,
                    help="se2.yaml submap config (grid resolution honoured: "
                    "fine resolutions use the brick-sparse grid)")
    ap.add_argument(
        "--mode", default="slam",
        choices=["vio", "slam", "depth", "rgbd", "lidar"],
    )
    ap.add_argument(
        "--reader", default="auto",
        choices=["auto", "euroc", "xdataset", "leica", "rpg"],
    )
    ap.add_argument("--output", default="out")
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument(
        "--synthetic-test", action="store_true",
        help="generate a synthetic dataset into --output/synth and run on it",
    )
    ap.add_argument("--final-ba", action="store_true", default=True)
    ap.add_argument(
        "--record", default=None, metavar="DIR",
        help="recorder mode (≙ okvis_app_realsense_recorder): stream the "
        "live camera (or --dataset replay) into an EuRoC-layout dataset "
        "at DIR, no estimation",
    )
    ap.add_argument("--imu-csv", default=None,
                    help="dump raw IMU to this CSV (≙ setImuCsvFile)")
    ap.add_argument("--tracks-csv", default=None,
                    help="dump cam0 keypoint tracks CSV (≙ setTracksCsvFile)")
    args = ap.parse_args()

    if args.record:
        return record_mode(args)

    # configure JAX (platform override, compile cache) BEFORE importing any
    # module with jnp constants — those initialise the default backend
    from okvis2x_tpu.utils import jaxconfig, timing

    jaxconfig.setup()

    from okvis2x_tpu.graph import EstimatorConfig
    from okvis2x_tpu.io import synthetic, trajectory_io
    from okvis2x_tpu.pipeline.vio import PipelineConfig, VioPipeline

    os.makedirs(args.output, exist_ok=True)

    vi = None
    if args.synthetic_test:
        ds_dir = os.path.join(args.output, "synth")
        cam, T_SC, gt = synthetic.generate(
            ds_dir, duration=4.0,
            with_depth=(args.mode == "rgbd"),
            with_lidar=(args.mode == "lidar"),
        )
        cameras = [cam, cam]
        if args.reader == "auto" and args.mode in ("rgbd", "lidar"):
            args.reader = "xdataset"
    else:
        assert args.dataset, "--dataset required (or use --synthetic-test)"
        ds_dir = args.dataset
        assert args.config, "--config required for real datasets"
        from okvis2x_tpu.io import config as cfg_mod

        vi = cfg_mod.load(args.config)
        cameras = [c.camera for c in vi.cameras[:2]]
        T_SC = np.stack([c.T_SC for c in vi.cameras[:2]])
        main._cam0_is_colour = vi.cameras[0].is_colour
        gt = None

    ds = pick_reader(args.reader, ds_dir, len(cameras))
    if getattr(ds, "ground_truth", None) is not None:
        gt = ds.ground_truth

    if vi is not None:
        oc = vi.camera.online_calibration
        est_cfg = EstimatorConfig(
            num_keyframes=vi.estimator.num_keyframes,
            num_imu_frames=vi.estimator.num_imu_frames,
            max_iterations=vi.estimator.realtime_max_iterations,
            imu=vi.imu,
            do_extrinsics=oc.do_extrinsics,
            do_extrinsics_final_ba=oc.do_extrinsics_final_ba,
            extrinsics_sigma_r=oc.sigma_r,
            extrinsics_sigma_alpha=oc.sigma_alpha,
            extrinsics_sigma_r_final_ba=oc.sigma_r_final_ba,
            extrinsics_sigma_alpha_final_ba=oc.sigma_alpha_final_ba,
        )
    else:
        est_cfg = EstimatorConfig()
    pipe_cfg = PipelineConfig(
        do_loop_closures=(args.mode != "vio"),
        # dual-graph mode: full-graph optimisation overlaps the realtime
        # window on a background thread (synchronised on later frames)
        async_loop_closure=(args.mode != "vio"),
    )
    vio = VioPipeline(cameras, T_SC, est_cfg, pipe_cfg)
    pipe = vio
    if args.imu_csv:
        vio.set_imu_csv_file(args.imu_csv)
    if args.tracks_csv:
        vio.set_tracks_csv_file(0, args.tracks_csv)

    submapper = None
    if args.mode in ("depth", "rgbd"):
        from okvis2x_tpu.pipeline.submapping import (
            SubmappingConfig, SubmappingInterface,
        )

        submapper = SubmappingInterface(_submapping_config(args))
    elif args.mode == "lidar":
        from okvis2x_tpu.pipeline.lidar_vio import LidarVioPipeline

        pipe = LidarVioPipeline(vio, _submapping_config(args))
        submapper = pipe.submapper

    n = 0
    t0 = time.time()
    depth_by_t = {}
    if args.mode == "rgbd" and hasattr(ds, "depth_frames"):
        depth_by_t = dict(ds.depth_frames)

    for kind, data in ds.events():
        if kind == "imu":
            pipe.add_imu_measurement(*data)
            continue
        if kind == "gps":
            t_g, pos, err = data
            vio.add_gps_measurement(t_g, pos, err)
            continue
        if kind == "lidar":
            if args.mode == "lidar":
                with timing.Timer("8 LidarSweep"):
                    pipe.process_lidar_sweep(data)
            continue
        if kind == "depth":
            continue  # consumed via depth_by_t at the matching frame
        if kind != "frames" or not data.paths[0]:
            continue
        images = [ds.load_image(p) for p in data.paths if p]
        with timing.Timer("1 ProcessFrame"):
            if args.mode == "rgbd":
                dpath = depth_by_t.get(data.t)
                dimg = ds.load_depth(dpath) if dpath else None
                dimgs = [dimg] + [None] * (len(images) - 1)
                info = vio.process_frame(data.t, images, depth_images=dimgs)
            else:
                info = pipe.process_frame(data.t, images)
        n += 1

        if args.mode == "rgbd" and info["is_keyframe"] and len(images) >= 2:
            # learned depth fusion (≙ DepthFusionProcessor.cpp:78-497):
            # stereo depth + multi-view depth from the previous keyframes
            # (trained MvsNet when resources/mvs_net.npz is shipped, else
            # classical plane sweep), inverse-variance fused (:418-420)
            # and integrated into the occupancy submaps
            import jax
            import jax.numpy as jnp

            from okvis2x_tpu.core import se3, se3np
            from okvis2x_tpu.models import mvs as mvs_mod
            from okvis2x_tpu.models import stereo as stereo_mod

            with timing.Timer("9 DepthFusionAndIntegrate"):
                fx = float(np.asarray(cameras[0].fxfycxcy)[0])
                fy = float(np.asarray(cameras[0].fxfycxcy)[1])
                cx = float(np.asarray(cameras[0].fxfycxcy)[2])
                cy = float(np.asarray(cameras[0].fxfycxcy)[3])
                baseline = float(
                    np.linalg.norm(T_SC[1][:3] - T_SC[0][:3]))
                if not hasattr(main, "_fuse_jit"):
                    Kmat = jnp.asarray(
                        [[fx, 0, cx], [0, fy, cy], [0, 0, 1]],
                        jnp.float32)

                    def _fuse(l, r, srcs, T_rs):
                        sd = stereo_mod.stereo_depth(l, r, fx, baseline)
                        md = mvs_mod.mvs_depth(l, srcs, Kmat, T_rs)
                        d, s = stereo_mod.fuse_depths(
                            jnp.where(sd.valid, sd.depth, 0.0), sd.sigma,
                            jnp.where(md.valid, md.depth, 0.0), md.sigma,
                        )[:2]
                        return d, s

                    main._fuse_jit = jax.jit(_fuse)
                    main._kf_hist = []
                T_WC = np.asarray(se3.se3_multiply(
                    jnp.asarray(info["T_WS"]), jnp.asarray(T_SC[0])))
                hist = main._kf_hist
                if len(hist) >= 2:
                    srcs = jnp.stack(
                        [jnp.asarray(h[0]) for h in hist[-2:]])
                    # pose of each source in the ref camera frame
                    T_rs = np.stack([
                        se3np.se3_multiply(
                            se3np.se3_inverse(T_WC), h[1])
                        for h in hist[-2:]
                    ])
                    d, s = main._fuse_jit(
                        jnp.asarray(images[0]), jnp.asarray(images[1]),
                        srcs, jnp.asarray(T_rs, jnp.float32))
                    kf_fid = info.get("keyframe_fid") or info["fid"]
                    try:
                        T_WK = pipe.est.get_state(kf_fid).T_WS
                    except (KeyError, StopIteration):
                        T_WK = info["T_WS"]
                    submapper.integrate_depth(
                        kf_fid, T_WK, T_WC, cameras[0],
                        np.asarray(d), np.asarray(s),
                    )
                hist.append((np.asarray(images[0]), T_WC))
                del hist[:-4]

        if args.mode == "depth" and info["is_keyframe"] and len(images) >= 2:
            import jax
            import jax.numpy as jnp

            from okvis2x_tpu.core import se3
            from okvis2x_tpu.models import stereo as stereo_mod

            with timing.Timer("9 DepthAndIntegrate"):
                fx = float(np.asarray(cameras[0].fxfycxcy)[0])
                baseline = float(
                    np.linalg.norm(T_SC[1][:3] - T_SC[0][:3])
                )
                if not hasattr(main, "_stereo_jit"):
                    main._stereo_jit = jax.jit(
                        lambda l, r: stereo_mod.stereo_depth(l, r, fx, baseline)
                    )
                sd = main._stereo_jit(
                    jnp.asarray(images[0]), jnp.asarray(images[1])
                )
                T_WS = info["T_WS"]
                T_WC = np.asarray(
                    se3.se3_multiply(jnp.asarray(T_WS), jnp.asarray(T_SC[0]))
                )
                # colour integration when cam0 is an rgb camera
                # (okvis2.yaml camera_type; ≙ isColour warp into
                # OccupancyColIdMap, SubmappingInterface.cpp:848-888)
                col_img = None
                if getattr(main, "_cam0_is_colour", False):
                    col_img = np.asarray(images[0], np.float32)
                    if col_img.max() > 1.5:
                        col_img = col_img / 255.0
                kf_fid = info.get("keyframe_fid") or info["fid"]
                try:
                    T_WK = pipe.est.get_state(kf_fid).T_WS
                except (KeyError, StopIteration):
                    T_WK = T_WS
                submapper.integrate_depth(
                    kf_fid, T_WK, T_WC, cameras[0],
                    np.asarray(sd.depth), np.asarray(sd.sigma),
                    colour=col_img,
                )

        if n % 50 == 0:
            print(f"frame {n}  t={time.time()-t0:.1f}s  "
                  f"kf={info['is_keyframe']} map={info['n_map']}")
        if args.max_frames and n >= args.max_frames:
            break

    vio.finish()  # drain + synchronise any in-flight full-graph optimisation

    # online trajectory
    ts = np.array([s[0] for s in vio.states_log])
    Ts = np.stack([s[1] for s in vio.states_log])
    trajectory_io.write_tum(os.path.join(args.output, "trajectory.tum"), ts, Ts)

    if args.final_ba and args.mode != "vio":
        cost = vio.est.final_ba()
        print(f"final BA cost: {cost:.1f}")
        fts, fTs = vio.est.full_trajectory()
        trajectory_io.write_tum(
            os.path.join(args.output, "final_trajectory.tum"), fts, fTs
        )

    if submapper is not None:
        submapper.export_occupied_ply(os.path.join(args.output, "map.ply"))

    print(timing.report())
    if gt is not None:
        ate = trajectory_io.ate_rmse(ts, Ts[:, :3], gt[:, 0], gt[:, 1:4])
        print(f"ATE RMSE (online): {ate:.4f} m over {len(ts)} frames, "
              f"{vio.n_loop_closures} loop closures")
        return ate
    return None


if __name__ == "__main__":
    main()
