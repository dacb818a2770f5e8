#!/usr/bin/env python
"""ROS2 network node: depth network in the loop (≙ the reference's
`okvis2x_network_node`, okvis_ros2/src/okvis2x_network_node.cpp, compiled
as the stereo / depth-fusion variants of
okvis_apps/src/okvis2x_app_network_synchronous.cpp).

Subscribes stereo image + IMU topics, runs the stereo depth network on the
left/right pair (models/stereo.py census path or models/stereo_net.py flax
net), feeds the RGB-D pipeline with the predicted depth + sigma, and
re-publishes the network outputs on `<prefix>Depth` / `<prefix>Sigma`
topics (≙ Publisher::setupNetworkTopics, Publisher.cpp:431-437) through
`okvis2x_tpu.ros2.RePublisher`.

Like okvis2x_node, the whole graph is middleware-independent
(`build_network_graph` over any Transport); main() adds the rclpy bridge.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def build_network_graph(transport, cameras, T_SC, est_cfg=None,
                        pipe_cfg=None, prefix="okvis", in_prefix="",
                        num_cams=2, max_disp=32, use_net=False):
    """Subscriber -> stereo-depth network -> RGB-D pipeline -> Publisher +
    RePublisher."""
    import jax
    import jax.numpy as jnp

    from okvis2x_node import PipelineNodeCore
    from okvis2x_tpu.api import State
    from okvis2x_tpu.models import stereo as stereo_mod
    from okvis2x_tpu.ros2 import Publisher, RePublisher, Subscriber

    pub = Publisher(transport, prefix=prefix)
    repub = RePublisher(transport, prefix=prefix + "/network",
                        num_cams=num_cams)

    cam0 = cameras[0]
    fx = float(np.asarray(cam0.fxfycxcy)[0])
    baseline = float(np.linalg.norm(T_SC[1][:3] - T_SC[0][:3])) or 0.1

    depth_fn = jax.jit(
        lambda l, r: stereo_mod.stereo_depth(l, r, fx, baseline,
                                             max_disp=max_disp)
    )

    def on_state(t, T_WS, sb, info):
        pub.process_state_update(
            State(id=info["fid"], timestamp=t, T_WS=T_WS, v_W=sb[:3],
                  b_g=sb[3:6], b_a=sb[6:9], omega_S=np.zeros(3),
                  is_keyframe=info["is_keyframe"]),
        )

    core = PipelineNodeCore(cameras, T_SC, est_cfg=est_cfg,
                            pipe_cfg=pipe_cfg, on_state=on_state)

    class _Target:
        def on_images(self, t, images, depth_images=None):
            if depth_images is None and len(images) >= 2:
                sd = depth_fn(jnp.asarray(images[0], jnp.float32),
                              jnp.asarray(images[1], jnp.float32))
                depth = np.asarray(sd.depth)
                sigma = np.asarray(sd.sigma)
                repub.republish_network_depth(t, depth, sigma)
                # depth prior for cam0 only (the network's reference view)
                depth_images = [depth] + [None] * (len(images) - 1)
            core.on_images(t, images, depth_images=depth_images)

        def on_imu(self, t, gyr, acc):
            pub.add_imu_measurement(t, gyr, acc)
            core.on_imu(t, gyr, acc)

    sub = Subscriber(transport, _Target(), num_cams=num_cams,
                     prefix=in_prefix)
    return core, pub, repub, sub


def main():
    try:
        import rclpy
        from rclpy.node import Node
    except ImportError:
        print("rclpy not available; use build_network_graph over a "
              "LocalTransport.", file=sys.stderr)
        return 1

    from sensor_msgs.msg import Image as RosImage, Imu as RosImu

    from okvis2x_tpu.ros2 import messages as m
    from okvis2x_tpu.ros2.transport import RclpyTransport

    class NetworkNode(Node):
        def __init__(self):
            super().__init__("okvis2x_network_node")
            self.declare_parameter("config", "")
            cfg_path = self.get_parameter("config").value
            from okvis2x_tpu.io import config as cfg_mod

            vi = cfg_mod.load(cfg_path)
            cameras = [c.camera for c in vi.cameras[:2]]
            T_SC = np.stack([c.T_SC for c in vi.cameras[:2]])
            self.transport = RclpyTransport(self)
            self.graph = build_network_graph(
                self.transport, cameras, T_SC, num_cams=len(cameras)
            )
            self.create_subscription(RosImu, "imu0", self._imu_cb, 100)
            for i in range(len(cameras)):
                self.create_subscription(
                    RosImage, f"cam{i}/image_raw", self._make_img_cb(i), 10
                )

        def _imu_cb(self, msg):
            t = msg.header.stamp.sec + msg.header.stamp.nanosec * 1e-9
            self.transport._dispatch(
                "imu",
                m.Imu(m.Header(t, "imu"),
                      np.array([msg.angular_velocity.x,
                                msg.angular_velocity.y,
                                msg.angular_velocity.z]),
                      np.array([msg.linear_acceleration.x,
                                msg.linear_acceleration.y,
                                msg.linear_acceleration.z])),
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
    node = NetworkNode()
    rclpy.spin(node)
    return 0


if __name__ == "__main__":
    sys.exit(main())
