#!/usr/bin/env python3
"""Convert an okvis2x trajectory CSV (t_ns, p_xyz, q_xyzw, ...) to TUM format.

Counterpart of the reference's tools/convert_to_tum.py: reads the estimator's
EuRoC-style output CSV and writes `<name>_tum.txt` with rows
`t_s tx ty tz qx qy qz qw` for evo-style evaluation tooling.
"""

import argparse
import os
import sys

import numpy as np


def convert(csv_path: str, out_path: str | None = None) -> str:
    rows = np.loadtxt(csv_path, delimiter=",", skiprows=1, ndmin=2)
    out_path = out_path or os.path.splitext(csv_path)[0] + "_tum.txt"
    with open(out_path, "w") as f:
        f.write("# timestamp_s tx ty tz qx qy qz qw\n")
        for r in rows:
            t = r[0] * 1e-9 if r[0] > 1e14 else r[0]
            f.write(
                f"{t} {r[1]} {r[2]} {r[3]} {r[4]} {r[5]} {r[6]} {r[7]}\n"
            )
    return out_path


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("csv", help="trajectory CSV (EuRoC/okvis layout)")
    ap.add_argument("-o", "--output", default=None)
    args = ap.parse_args()
    out = convert(args.csv, args.output)
    print(f"wrote {out}")


if __name__ == "__main__":
    sys.exit(main())
