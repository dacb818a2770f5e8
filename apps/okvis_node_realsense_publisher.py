#!/usr/bin/env python
"""Realsense raw-stream publisher node (≙ the reference's
`okvis_node_realsense_publisher`, okvis_ros2/src/
okvis_node_realsense_publisher.cpp): opens the Realsense driver (or the
deterministic fake replaying a dataset) and publishes raw IMU + camera
(+ depth) streams through `okvis2x_tpu.ros2.RePublisher` — no estimation,
just sensor bridging for recording or remote processing."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import argparse

import numpy as np


def run_publisher(transport, driver, prefix="realsense", num_cams=2):
    """Wire a Realsense-like driver's callbacks onto RePublisher topics.
    Returns the RePublisher (topics: <prefix>/cam{i}/image, <prefix>/imu,
    <prefix>/depth)."""
    from okvis2x_tpu.ros2 import RePublisher

    repub = RePublisher(transport, prefix=prefix, num_cams=num_cams)
    driver.set_imu_callback(lambda t, g, a: repub.republish_imu(t, g, a))
    driver.set_images_callback(
        lambda t, imgs: repub.republish_images(t, imgs)
    )
    driver.set_depth_callback(
        lambda t, d: repub.republish_network_depth(t, np.asarray(d))
    )
    return repub


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fake-dataset", default=None,
                    help="replay a EuRoC-layout dataset as a fake device")
    ap.add_argument("--prefix", default="realsense")
    args = ap.parse_args()

    from okvis2x_tpu.io.realsense import FakeRealsense, Realsense

    if args.fake_dataset:
        from okvis2x_tpu.io.euroc import EurocDataset

        driver = FakeRealsense(EurocDataset(args.fake_dataset))
    else:
        driver = Realsense()

    try:
        import rclpy
        from rclpy.node import Node

        from okvis2x_tpu.ros2.transport import RclpyTransport

        rclpy.init()
        node = Node("okvis_node_realsense_publisher")
        transport = RclpyTransport(node)
        run_publisher(transport, driver, prefix=args.prefix)
        driver.start_streaming()
        rclpy.spin(node)
    except ImportError:
        from okvis2x_tpu.ros2 import LocalTransport

        transport = LocalTransport()
        run_publisher(transport, driver, prefix=args.prefix)
        driver.start_streaming()
        if hasattr(driver, "wait_done"):
            driver.wait_done()
        driver.stop_streaming()
        total = sum(transport.count(t) for t in transport.history)
        print(f"published {total} messages on "
              f"{len(transport.history)} topics (local transport)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
