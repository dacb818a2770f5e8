#!/usr/bin/env python
"""Convert VBR (Vision Benchmark in Rome) rosbags to the MRL
(EuRoC-extended) folder layout (≙ reference tools/vbr_bag2mrl.py, with a
pure-Python bag reader — no ROS installation required).

Per-point Ouster timestamps (`t`, nanoseconds relative to the message
header stamp) are made absolute and the points written in time order;
all-zero returns are dropped, matching the reference converter.

Usage: python tools/vbr_bag2mrl.py <bag1.bag> [bag2.bag ...]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from okvis2x_tpu.io.bag_convert import VBR, convert_bag  # noqa: E402


def main():
    bags = sys.argv[1:]
    if not bags:
        sys.exit("No bag files provided.")
    for bag in bags:
        out = bag[:-4] if bag.endswith(".bag") else bag + "_mrl"
        print(f"Processing {bag} -> {out}")
        counts = convert_bag(bag, out, VBR)
        print(
            f"  images: {counts['images']}  imu: {counts['imu']}  "
            f"lidar points: {counts['lidar_points']}"
        )


if __name__ == "__main__":
    main()
