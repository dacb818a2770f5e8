"""Synchronous rosbag node (≙ okvis_ros2/src/okvis_node_synchronous.cpp):
bag → Subscriber → pipeline → Publisher → trajectories, end to end."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from okvis2x_tpu.io import euroc, rosbag1, synthetic


MINIMAL_YAML = """%YAML:1.0
cameras:
  - T_SC: [1.0, 0.0, 0.0, -0.055,
           0.0, 1.0, 0.0, 0.0,
           0.0, 0.0, 1.0, 0.0,
           0.0, 0.0, 0.0, 1.0]
    image_dimension: [160, 120]
    distortion_coefficients: [-0.25, 0.06, 0.0001, -0.0001]
    distortion_type: radialtangential
    focal_length: [280.0, 280.0]
    principal_point: [80.0, 60.0]
  - T_SC: [1.0, 0.0, 0.0, 0.055,
           0.0, 1.0, 0.0, 0.0,
           0.0, 0.0, 1.0, 0.0,
           0.0, 0.0, 0.0, 1.0]
    image_dimension: [160, 120]
    distortion_coefficients: [-0.25, 0.06, 0.0001, -0.0001]
    distortion_type: radialtangential
    focal_length: [280.0, 280.0]
    principal_point: [80.0, 60.0]
imu_parameters:
  rate: 200
estimator_parameters:
  num_keyframes: 3
  num_imu_frames: 2
  realtime_max_iterations: 3
"""


def test_node_synchronous_replays_bag(tmp_path):
    # render a short synthetic dataset, repack as a ROS1 bag
    ds_dir = str(tmp_path / "synth")
    synthetic.generate(
        ds_dir, duration=1.2, frame_rate=10.0, width=160, height=120,
        n_points=200,
    )
    ds = euroc.EurocDataset(ds_dir)
    bag_path = str(tmp_path / "seq.bag")
    with rosbag1.Rosbag1Writer(bag_path) as bag:
        for kind, data in ds.events():
            if kind == "imu":
                t, gyr, acc = data
                ns = int(round(t * 1e9))
                bag.write("/imu0", "sensor_msgs/Imu", ns,
                          rosbag1.encode_imu(ns, gyr, acc))
            elif kind == "frames" and data.paths[0]:
                ns = int(round(data.t * 1e9))
                for c, p in enumerate(data.paths):
                    if not p:
                        continue
                    img = (ds.load_image(p) * 255).astype(np.uint8) \
                        if ds.load_image(p).dtype != np.uint8 \
                        else ds.load_image(p)
                    bag.write(
                        f"/cam{c}/image_raw", "sensor_msgs/Image", ns,
                        rosbag1.encode_image(ns, img),
                    )

    cfg_path = str(tmp_path / "mini.yaml")
    with open(cfg_path, "w") as f:
        f.write(MINIMAL_YAML)

    from apps.okvis2x_node_synchronous import main

    out = str(tmp_path / "out")
    rc = main([
        "--bag", bag_path, "--config", cfg_path, "--output", out,
        "--max-frames", "5", "--max-keypoints", "128",
        "--no-loop-closures",
    ])
    assert rc == 0
    online = np.loadtxt(os.path.join(out, "okvis2_trajectory.csv"))
    final = np.loadtxt(os.path.join(out, "okvis2_final_trajectory.csv"))
    assert online.shape[0] >= 5 and online.shape[1] == 8
    assert final.shape[0] >= 1 and np.isfinite(final).all()
