"""Pure-Python rosbag support: ROS1 v2.0 bag + ROS2 sqlite/CDR round-trips
and the hilti/vbr bag→MRL converters (≙ reference tools/*_bag2mrl.py,
okvis_apps/scripts/bag_creator.py, okvis_ros2 RosbagReader)."""

import os
import struct
import subprocess
import sys

import numpy as np

from okvis2x_tpu.io import bag_convert, rosbag1, rosbag2

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _rng():
    return np.random.default_rng(7)


def test_rosbag1_roundtrip(tmp_path):
    rng = _rng()
    path = str(tmp_path / "t.bag")
    img = rng.integers(0, 255, (24, 32), dtype=np.uint8)
    with rosbag1.Rosbag1Writer(path) as bag:
        bag.write(
            "/cam0/image_raw", "sensor_msgs/Image", 1_000_000_007,
            rosbag1.encode_image(1_000_000_007, img),
        )
        bag.write(
            "/imu0", "sensor_msgs/Imu", 1_000_000_009,
            rosbag1.encode_imu(1_000_000_009, [0.1, -0.2, 0.3], [9.0, 0.1, -0.4]),
        )

    msgs = list(rosbag1.Rosbag1Reader(path).messages())
    assert [m.topic for m in msgs] == ["/cam0/image_raw", "/imu0"]
    im = rosbag1.decode_image(msgs[0].raw)
    assert im.t_ns == 1_000_000_007
    np.testing.assert_array_equal(im.data, img)
    imu = rosbag1.decode_imu(msgs[1].raw)
    np.testing.assert_allclose(imu.gyr, [0.1, -0.2, 0.3])
    np.testing.assert_allclose(imu.acc, [9.0, 0.1, -0.4])

    # topic filter
    only = list(rosbag1.Rosbag1Reader(path).messages(topics=["/imu0"]))
    assert len(only) == 1 and only[0].msgtype == "sensor_msgs/Imu"


def _hesai_cloud(t0_ns, n, rng):
    """PointCloud2 blob in the Hilti Hesai layout: x,y,z f32; intensity f32
    @16; absolute f64 seconds timestamp @24; ring u16 @32; stride 48."""
    fields = [
        rosbag1.PointField("x", 0, 7, 1),
        rosbag1.PointField("y", 4, 7, 1),
        rosbag1.PointField("z", 8, 7, 1),
        rosbag1.PointField("intensity", 16, 7, 1),
        rosbag1.PointField("timestamp", 24, 8, 1),
        rosbag1.PointField("ring", 32, 4, 1),
    ]
    xyz = rng.normal(size=(n, 3)).astype(np.float32)
    buf = bytearray(48 * n)
    for i in range(n):
        struct.pack_into(
            "<fff", buf, 48 * i, xyz[i, 0], xyz[i, 1], xyz[i, 2]
        )
        struct.pack_into("<f", buf, 48 * i + 16, float(i))
        struct.pack_into("<d", buf, 48 * i + 24, t0_ns * 1e-9 + i * 1e-6)
        struct.pack_into("<H", buf, 48 * i + 32, i % 32)
    return fields, bytes(buf), xyz


def test_pointcloud2_decode_and_hilti_convert(tmp_path):
    rng = _rng()
    t0 = 2_000_000_000
    fields, blob, xyz = _hesai_cloud(t0, 16, rng)
    raw = rosbag1.encode_pointcloud2(t0, fields, 48, blob, 16)
    pc = rosbag1.decode_pointcloud2(raw)
    arr = pc.arrays()
    np.testing.assert_allclose(arr["x"], xyz[:, 0])
    np.testing.assert_allclose(arr["ring"], np.arange(16) % 32)

    # full hilti-preset conversion
    bag_path = str(tmp_path / "hilti.bag")
    img = rng.integers(0, 255, (16, 20), dtype=np.uint8)
    with rosbag1.Rosbag1Writer(bag_path) as bag:
        for i in range(5):
            bag.write(
                f"/alphasense/cam{i}/image_raw", "sensor_msgs/Image", t0 + i,
                rosbag1.encode_image(t0 + i, img),
            )
        bag.write(
            "/alphasense/imu", "sensor_msgs/Imu", t0,
            rosbag1.encode_imu(t0, [0, 0, 0.1], [0, 0, 9.81]),
        )
        bag.write(
            "/hesai/pandar", "sensor_msgs/PointCloud2", t0, raw
        )
    out = str(tmp_path / "mrl")
    counts = bag_convert.convert_bag(bag_path, out, bag_convert.HILTI)
    assert counts == {"images": 5, "imu": 1, "lidar_points": 16, "gps": 0}
    assert os.path.exists(os.path.join(out, "cam4", "data.csv"))
    lidar = np.loadtxt(
        os.path.join(out, "lidar0", "data.csv"), delimiter=",", skiprows=1
    )
    assert lidar.shape == (16, 6)
    # absolute per-point stamps, monotonically increasing
    assert lidar[0, 0] >= t0 and np.all(np.diff(lidar[:, 0]) > 0)


def test_vbr_convert_relative_stamps_and_zero_drop(tmp_path):
    rng = _rng()
    t0 = 3_000_000_000
    # ouster layout: x,y,z f32; intensity f32 @16; t u32 ns @20; ring u8 @26
    fields = [
        rosbag1.PointField("x", 0, 7, 1),
        rosbag1.PointField("y", 4, 7, 1),
        rosbag1.PointField("z", 8, 7, 1),
        rosbag1.PointField("intensity", 16, 7, 1),
        rosbag1.PointField("t", 20, 6, 1),
        rosbag1.PointField("ring", 26, 2, 1),
    ]
    n = 8
    buf = bytearray(32 * n)
    for i in range(n):
        x = 0.0 if i == 3 else 1.0 + i  # one all-zero return
        struct.pack_into("<fff", buf, 32 * i, x, 0.0 if i == 3 else 2.0, 0.0 if i == 3 else 3.0)
        struct.pack_into("<f", buf, 32 * i + 16, 10.0 * i)
        struct.pack_into("<I", buf, 32 * i + 20, 1000 * i)
        struct.pack_into("<B", buf, 32 * i + 26, i % 4)
    raw = rosbag1.encode_pointcloud2(t0, fields, 32, bytes(buf), n)

    bag_path = str(tmp_path / "vbr.bag")
    img = rng.integers(0, 255, (12, 16), dtype=np.uint8)
    with rosbag1.Rosbag1Writer(bag_path) as bag:
        bag.write(
            "/camera_left/image_raw", "sensor_msgs/Image", t0,
            rosbag1.encode_image(t0, img),
        )
        bag.write(
            "/camera_right/image_raw", "sensor_msgs/Image", t0,
            rosbag1.encode_image(t0, img),
        )
        bag.write(
            "/imu/data", "sensor_msgs/Imu", t0,
            rosbag1.encode_imu(t0, [0, 0, 0], [0, 0, 9.81]),
        )
        bag.write("/ouster/points", "sensor_msgs/PointCloud2", t0, raw)
    out = str(tmp_path / "mrl")
    counts = bag_convert.convert_bag(bag_path, out, bag_convert.VBR)
    assert counts["images"] == 2 and counts["lidar_points"] == n - 1
    lidar = np.loadtxt(
        os.path.join(out, "lidar0", "data.csv"), delimiter=",", skiprows=1
    )
    # stamps = header + relative t
    assert lidar[0, 0] == t0
    assert lidar[-1, 0] == t0 + 1000 * (n - 1)
    assert not np.any(np.all(lidar[:, 1:4] == 0, axis=1))


def test_rosbag2_roundtrip(tmp_path):
    rng = _rng()
    d = str(tmp_path / "bag2")
    img = rng.integers(0, 255, (10, 14), dtype=np.uint8)
    with rosbag2.Rosbag2Writer(d) as bag:
        bag.write(
            "/cam0/image_raw", "sensor_msgs/msg/Image", 5_000_000_001,
            rosbag2.encode_image(5_000_000_001, img),
        )
        bag.write(
            "/imu", "sensor_msgs/msg/Imu", 5_000_000_002,
            rosbag2.encode_imu(5_000_000_002, [1e-3, 2e-3, 3e-3], [0, 0, 9.8]),
        )
    r = rosbag2.Rosbag2Reader(d)
    assert r.topics() == {
        "/cam0/image_raw": "sensor_msgs/msg/Image",
        "/imu": "sensor_msgs/msg/Imu",
    }
    msgs = list(r.messages())
    assert len(msgs) == 2
    im = rosbag2.decode_image(msgs[0].raw)
    assert im.t_ns == 5_000_000_001
    np.testing.assert_array_equal(im.data, img)
    imu = rosbag2.decode_imu(msgs[1].raw)
    np.testing.assert_allclose(imu.gyr, [1e-3, 2e-3, 3e-3])
    assert os.path.exists(os.path.join(d, "metadata.yaml"))


def test_bag_creator_cli_roundtrip(tmp_path):
    """dataset folder -> bag (tools/bag_creator.py) -> reader sees streams."""
    rng = _rng()
    ds = tmp_path / "ds"
    (ds / "cam0" / "data").mkdir(parents=True)
    (ds / "imu0").mkdir(parents=True)
    from PIL import Image

    for i in range(3):
        t = 1_000_000_000 + i * 50_000_000
        Image.fromarray(
            rng.integers(0, 255, (8, 8), dtype=np.uint8)
        ).save(ds / "cam0" / "data" / f"{t}.png")
    import csv as _csv

    with open(ds / "cam0" / "data.csv", "w", newline="") as f:
        w = _csv.writer(f)
        w.writerow(["#timestamp [ns]", "filename"])
    with open(ds / "imu0" / "data.csv", "w", newline="") as f:
        w = _csv.writer(f)
        w.writerow(["#timestamp [ns]", "w_x", "w_y", "w_z", "a_x", "a_y", "a_z"])
        for i in range(5):
            w.writerow([1_000_000_000 + i * 5_000_000, 0, 0, 0.1, 0, 0, 9.81])

    out_bag = str(tmp_path / "out.bag")
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "bag_creator.py"),
         "--folder", str(ds), "--output-bag", out_bag],
        capture_output=True, text=True,
    )
    assert res.returncode == 0, res.stderr
    msgs = list(rosbag1.Rosbag1Reader(out_bag).messages())
    kinds = {m.msgtype for m in msgs}
    assert kinds == {"sensor_msgs/Image", "sensor_msgs/Imu"}
    assert sum(m.msgtype == "sensor_msgs/Image" for m in msgs) == 3
    assert sum(m.msgtype == "sensor_msgs/Imu" for m in msgs) == 5


def test_navsatfix_roundtrip():
    # ROS1 wire format: header + status/service + lat/lon/alt + cov + type
    hdr = struct.pack("<III", 0, 7, 11) + struct.pack("<I", 0)
    body = hdr + struct.pack("<bH", 1, 1)
    body += struct.pack("<3d", 48.1, 11.6, 520.0)
    body += struct.pack("<9d", *(np.arange(9, dtype=np.float64) + 1))
    body += struct.pack("<B", 2)
    fix = rosbag1.decode_navsatfix(body)
    assert fix.t_ns == 7_000_000_011
    assert fix.latitude == 48.1 and fix.altitude == 520.0
    np.testing.assert_allclose(fix.position_covariance[0], 1.0)
