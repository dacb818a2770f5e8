#!/usr/bin/env python
"""Convert Hilti SLAM Challenge 2022 rosbags to the MRL (EuRoC-extended)
folder layout (≙ reference tools/hilti_bag2mrl.py, but with a pure-Python
bag reader — no ROS installation required).

Usage: python tools/hilti_bag2mrl.py <bag1.bag> [bag2.bag ...]
Writes each bag to a sibling folder named after the bag (without .bag).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from okvis2x_tpu.io.bag_convert import HILTI, convert_bag  # noqa: E402


def main():
    bags = sys.argv[1:]
    if not bags:
        sys.exit("No bag files provided.")
    for bag in bags:
        out = bag[:-4] if bag.endswith(".bag") else bag + "_mrl"
        print(f"Processing {bag} -> {out}")
        counts = convert_bag(bag, out, HILTI)
        print(
            f"  images: {counts['images']}  imu: {counts['imu']}  "
            f"lidar points: {counts['lidar_points']}"
        )


if __name__ == "__main__":
    main()
