"""ROS2 layer over the in-process transport: Publisher estimator-update
fan-out, realtime propagation rate limiting, submap mesh caching/cutoff,
RePublisher passthrough, Subscriber frame synchronisation."""

import numpy as np

from okvis2x_tpu.api import State
from okvis2x_tpu.ros2 import LocalTransport, Publisher, RePublisher, Subscriber
from okvis2x_tpu.ros2 import messages as m


def _state(k, t):
    return State(
        id=k, timestamp=t,
        T_WS=np.array([float(k), 0, 0, 0, 0, 0, 1.0]),
        v_W=np.array([1.0, 0, 0]), b_g=np.zeros(3), b_a=np.zeros(3),
        omega_S=np.zeros(3), is_keyframe=True,
    )


def test_publisher_estimator_update():
    tr = LocalTransport()
    pub = Publisher(tr, prefix="okvis")
    lms = np.array([[1.0, 2, 3, 1.0], [2.0, 4, 6, 2.0]])  # homogeneous
    for k in range(3):
        pub.process_state_update(_state(k, 0.1 * k), landmarks=lms)

    odom = tr.last("okvis/odometry")
    assert isinstance(odom, m.Odometry) and odom.T_WB[0] == 2.0
    assert tr.count("okvis/odometry") == 3
    assert tr.count("okvis/transform") == 3
    path = tr.last("okvis/path")
    assert path.poses.shape == (3, 7)
    pc = tr.last("okvis/points_matched")
    np.testing.assert_allclose(pc.points[1], [1.0, 2.0, 3.0])  # dehomogenised


def test_publisher_path_rewritten_on_loop_closure():
    tr = LocalTransport()
    pub = Publisher(tr)
    pub.process_state_update(_state(0, 0.0))
    # loop closure moves state 0
    s0_new = _state(0, 0.0)
    s0_new.T_WS = np.array([9.0, 9, 9, 0, 0, 0, 1.0])
    pub.process_state_update(_state(1, 0.1), updated_states=[s0_new])
    path = tr.last("okvis/path")
    np.testing.assert_allclose(path.poses[0][:3], [9.0, 9, 9])


def test_publisher_csv(tmp_path):
    f = str(tmp_path / "traj.csv")
    tr = LocalTransport()
    pub = Publisher(tr)
    pub.set_csv_file(f)
    pub.process_state_update(_state(0, 1.5))
    pub.close()
    lines = open(f).read().strip().splitlines()
    assert lines[0].startswith("# timestamp")
    assert lines[1].startswith("1500000000, 0.0")


def test_realtime_propagation_rate_limit():
    tr = LocalTransport()
    pub = Publisher(tr, odometry_rate=20.0)
    pub.process_state_update(_state(0, 0.0))
    g = 9.81
    for k in range(1, 101):  # 100 Hz IMU for 1 s
        pub.add_imu_measurement(0.01 * k, np.zeros(3), np.array([0, 0, g]))
    n = tr.count("okvis/propagated_odometry")
    assert 15 <= n <= 25  # ~20 Hz from 100 Hz input
    prop = tr.last("okvis/propagated_odometry")
    # constant velocity 1 m/s under hover acceleration
    np.testing.assert_allclose(prop.T_WB[0], prop.header.stamp, atol=0.05)


def test_submap_meshes_cache_and_cutoff():
    tr = LocalTransport()
    pub = Publisher(tr, mesh_z_cutoff=0.5)
    verts = np.array([[0, 0, 0.0], [1, 0, 0.0], [0, 1, 0.0],
                      [0, 0, 2.0], [1, 0, 2.0], [0, 1, 2.0]])
    tris = np.array([[0, 1, 2], [3, 4, 5]])
    pub.publish_submaps({7: np.array([0, 0, 0, 0, 0, 0, 1.0])},
                        {7: (verts, tris)}, t=1.0)
    arr = tr.last("okvis/submap_meshes")
    assert len(arr.markers) == 1
    # the z=2 triangle is cut off
    assert arr.markers[0].triangles.shape == (1, 3)
    pub.republish_meshes()
    assert tr.count("okvis/submap_meshes") == 2


def test_republisher_passthrough():
    tr = LocalTransport()
    rp = RePublisher(tr, prefix="ns", num_cams=2)
    img = np.zeros((4, 6), np.uint8)
    rp.republish_images(0.5, [img, img])
    rp.republish_imu(0.5, np.ones(3), np.ones(3))
    rp.republish_network_depth(0.5, np.ones((4, 6), np.float32),
                               np.ones((4, 6), np.float32) * 0.1)
    assert tr.count("ns/cam0/image") == 1
    assert tr.count("ns/cam1/image") == 1
    assert tr.last("ns/imu").gyr[0] == 1.0
    assert tr.last("ns/depth").encoding == "32FC1"
    assert tr.last("ns/depth_sigma").data[0, 0] == np.float32(0.1)


class _FakeTarget:
    def __init__(self):
        self.frames = []
        self.imu = []
        self.gps = []

    def on_images(self, t, images, depth_images=None):
        self.frames.append((t, images, depth_images))

    def on_imu(self, t, gyr, acc):
        self.imu.append(t)

    def on_gps(self, t, pos, sigma):
        self.gps.append((t, tuple(pos)))


def test_subscriber_synchronises_stereo():
    tr = LocalTransport()
    tgt = _FakeTarget()
    Subscriber(tr, tgt, num_cams=2, prefix="ns", gps_topic="ns/gps")
    cam0 = tr.advertise("ns/cam0/image")
    cam1 = tr.advertise("ns/cam1/image")
    imu = tr.advertise("ns/imu")
    gps = tr.advertise("ns/gps")

    img = np.zeros((2, 2), np.uint8)
    imu.publish(m.Imu(m.Header(0.005), np.zeros(3), np.zeros(3)))
    cam0.publish(m.Image(m.Header(0.01), img))
    assert not tgt.frames  # waiting for cam1
    cam1.publish(m.Image(m.Header(0.0101), img))  # within tolerance
    assert len(tgt.frames) == 1 and abs(tgt.frames[0][0] - 0.01) < 1e-6
    assert tgt.imu == [0.005]
    gps.publish(m.NavSat(m.Header(0.02), np.array([1.0, 2, 3]), 0.5))
    assert tgt.gps == [(0.02, (1.0, 2.0, 3.0))]


def test_node_graph_end_to_end(tmp_path):
    """build_node_graph over LocalTransport: publish raw sensor streams in,
    odometry/path out (the whole okvis2x_node minus rclpy)."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "apps"))
    from okvis2x_node import build_node_graph
    from okvis2x_tpu.graph import EstimatorConfig
    from okvis2x_tpu.io import euroc, synthetic
    from okvis2x_tpu.pipeline.vio import PipelineConfig

    out = str(tmp_path / "ds")
    cam, T_SC, gt = synthetic.generate(
        out, duration=1.2, frame_rate=10.0, width=160, height=120
    )
    ds = euroc.EurocDataset(out)

    tr = LocalTransport()
    est_cfg = EstimatorConfig(num_keyframes=3, num_imu_frames=2,
                              cap_frames=6, cap_landmarks=256, cap_obs=2048,
                              cap_imu_links=5, cap_imu_samples=64,
                              max_iterations=3)
    pipe_cfg = PipelineConfig(max_keypoints=128, octaves=1,
                              harris_threshold=1e-6)
    core, pub, sub = build_node_graph(tr, [cam, cam], T_SC,
                                      est_cfg=est_cfg, pipe_cfg=pipe_cfg,
                                      odometry_rate=50.0)
    cam0 = tr.advertise("cam0/image")
    cam1 = tr.advertise("cam1/image")
    imu = tr.advertise("imu")
    n = 0
    for kind, data in ds.events():
        if kind == "imu":
            t, gyr, acc = data
            imu.publish(m.Imu(m.Header(t), np.asarray(gyr), np.asarray(acc)))
        elif data.paths[0]:
            img = ds.load_image(data.paths[0])
            img1 = ds.load_image(data.paths[1])
            cam0.publish(m.Image(m.Header(data.t), img))
            cam1.publish(m.Image(m.Header(data.t), img1))
            n += 1
    assert tr.count("okvis/odometry") == n
    assert tr.count("okvis/path") == n
    assert tr.count("okvis/propagated_odometry") > 5
    path = tr.last("okvis/path")
    assert path.poses.shape[0] == n


def test_realsense_publisher_graph(tmp_path):
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "apps"))
    from okvis_node_realsense_publisher import run_publisher
    from okvis2x_tpu.io import euroc, synthetic
    from okvis2x_tpu.io.realsense import FakeRealsense

    out = str(tmp_path / "ds")
    synthetic.generate(out, duration=0.6, frame_rate=10.0, width=64,
                       height=48)
    driver = FakeRealsense(euroc.EurocDataset(out))
    tr = LocalTransport()
    run_publisher(tr, driver, prefix="rs")
    driver.start_streaming()
    driver.wait_done()
    driver.stop_streaming()
    assert tr.count("rs/imu") > 10
    assert tr.count("rs/cam0/image") >= 3
    assert tr.count("rs/cam1/image") == tr.count("rs/cam0/image")


def test_network_node_graph(tmp_path):
    """build_network_graph: stereo depth net in the loop, depth+sigma
    republished on the network topics (≙ okvis2x_network_node)."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "apps"))
    from okvis2x_network_node import build_network_graph
    from okvis2x_tpu.graph import EstimatorConfig
    from okvis2x_tpu.io import euroc, synthetic
    from okvis2x_tpu.pipeline.vio import PipelineConfig

    out = str(tmp_path / "ds")
    cam, T_SC, gt = synthetic.generate(
        out, duration=0.8, frame_rate=10.0, width=96, height=64
    )
    ds = euroc.EurocDataset(out)
    tr = LocalTransport()
    est_cfg = EstimatorConfig(num_keyframes=3, num_imu_frames=2,
                              cap_frames=6, cap_landmarks=128, cap_obs=1024,
                              cap_imu_links=5, cap_imu_samples=64,
                              max_iterations=2)
    pipe_cfg = PipelineConfig(max_keypoints=64, octaves=1,
                              harris_threshold=1e-6)
    build_network_graph(tr, [cam, cam], T_SC, est_cfg=est_cfg,
                        pipe_cfg=pipe_cfg, max_disp=16)
    cam0 = tr.advertise("cam0/image")
    cam1 = tr.advertise("cam1/image")
    imu = tr.advertise("imu")
    n = 0
    for kind, data in ds.events():
        if kind == "imu":
            t, gyr, acc = data
            imu.publish(m.Imu(m.Header(t), np.asarray(gyr), np.asarray(acc)))
        elif data.paths[0]:
            cam0.publish(m.Image(m.Header(data.t),
                                 ds.load_image(data.paths[0])))
            cam1.publish(m.Image(m.Header(data.t),
                                 ds.load_image(data.paths[1])))
            n += 1
    assert n >= 3
    assert tr.count("okvis/network/depth") == n
    assert tr.count("okvis/network/depth_sigma") == n
    assert tr.count("okvis/odometry") == n
    d = tr.last("okvis/network/depth").data
    assert d.shape == (64, 96) and np.isfinite(d[d > 0]).all()
