#!/usr/bin/env python
"""Create a ROS1 bag from an EuRoC-layout dataset folder
(≙ reference okvis_apps/scripts/bag_creator.py, without needing ROS).

Folder layout consumed:
  dataset/camN/data.csv + camN/data/<t>.png   -> /camN/image_raw
  dataset/imu0/data.csv                        -> /imu0

Usage: python tools/bag_creator.py --folder <dataset> --output-bag out.bag
"""

import argparse
import csv
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

from okvis2x_tpu.io import rosbag1  # noqa: E402


def main():
    ap = argparse.ArgumentParser(
        description="Create a ROS bag from images and IMU data."
    )
    ap.add_argument("--folder", required=True, help="dataset folder")
    ap.add_argument("--output-bag", default="output.bag")
    args = ap.parse_args()

    from PIL import Image

    events = []  # (t_ns, kind, payload)
    for entry in sorted(os.listdir(args.folder)):
        if entry.startswith("cam") and os.path.isdir(
            os.path.join(args.folder, entry)
        ):
            data_dir = os.path.join(args.folder, entry, "data")
            for fn in sorted(os.listdir(data_dir)):
                stem, ext = os.path.splitext(fn)
                if ext.lower() in (".png", ".jpg", ".bmp"):
                    events.append(
                        (int(stem), "img", (entry, os.path.join(data_dir, fn)))
                    )
    imu_csv = os.path.join(args.folder, "imu0", "data.csv")
    if os.path.exists(imu_csv):
        with open(imu_csv) as f:
            for row in csv.reader(f):
                if not row or row[0].startswith("#"):
                    continue
                t = int(row[0])
                vals = [float(v) for v in row[1:7]]
                events.append((t, "imu", vals))

    events.sort(key=lambda e: e[0])
    n_img = n_imu = 0
    with rosbag1.Rosbag1Writer(args.output_bag) as bag:
        for t, kind, payload in events:
            if kind == "img":
                cam, path = payload
                img = np.asarray(Image.open(path).convert("L"))
                bag.write(
                    f"/{cam}/image_raw", "sensor_msgs/Image", t,
                    rosbag1.encode_image(t, img, "mono8"),
                )
                n_img += 1
            else:
                bag.write(
                    "/imu0", "sensor_msgs/Imu", t,
                    rosbag1.encode_imu(t, payload[0:3], payload[3:6]),
                )
                n_imu += 1
    print(f"wrote {args.output_bag}: {n_img} images, {n_imu} imu samples")


if __name__ == "__main__":
    main()
