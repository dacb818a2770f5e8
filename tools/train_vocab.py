#!/usr/bin/env python
"""Train the hierarchical BoW vocabulary offline and persist it under
okvis2x_tpu/resources/ (≙ DBoW2's shipped resources/small_voc.yml.gz,
loaded by the reference at okvis_frontend/src/Frontend.cpp:91-115).

Corpus: descriptors extracted by the real detector/descriptor stack from a
few hundred synthetic renders spanning both scene families (dot-box and
circuit-ceiling) at several seeds, densities and viewpoints — the container
has no network access, so the corpus is rendered, not downloaded.

Usage: python tools/train_vocab.py [--out okvis2x_tpu/resources/vocab_b64l64.npz]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def collect_descriptors(n_target=120_000, width=752, height=480, seed=0,
                        verbose=True):
    import jax
    import jax.numpy as jnp

    from okvis2x_tpu.cameras import pinhole, pinhole_np
    from okvis2x_tpu.core import se3np
    from okvis2x_tpu.frontend import descriptor, detector
    from okvis2x_tpu.io import synthetic

    cam = pinhole.make_pinhole(
        fx=460.0, fy=460.0, cx=width / 2, cy=height / 2, width=width,
        height=height, model="radtan", dist_params=[-0.25, 0.06, 1e-4, -1e-4],
    )
    cam_np = pinhole_np.to_numpy(cam)
    rng = np.random.default_rng(seed)

    @jax.jit
    def detect(img, ang):
        kp = detector.detect(
            img, max_keypoints=704, octaves=2, cell=32, per_cell=8,
            threshold=1e-7,
        )
        a = jnp.full((704,), jnp.float32(ang))
        packed, pm1 = descriptor.extract(img, kp.uv, a, kp.level, kp.valid)
        return pm1, kp.valid

    out = []
    scenes = []
    for s in range(6):
        scenes.append(synthetic.make_circuit_scene(
            density=float(rng.uniform(14, 30)), seed=100 + s,
            z_lo=float(rng.uniform(2.5, 4.0)), z_hi=float(rng.uniform(5, 8)),
        ))
    for s in range(4):
        scenes.append(synthetic.make_scene(
            n_points=int(rng.uniform(400, 1200)), seed=200 + s
        ))
    n = 0
    i = 0
    t0 = time.time()
    while n < n_target:
        pts, b, r = scenes[i % len(scenes)]
        # random viewpoint below the scene looking up (+z optical axis)
        center = pts.mean(0)
        pos = center + rng.uniform([-6, -6, -center[2] - 1],
                                   [6, 6, -center[2] + 0.5])
        yaw = rng.uniform(0, 2 * np.pi)
        q = np.array([0, 0, np.sin(yaw / 2), np.cos(yaw / 2)])
        T_WC = np.r_[pos, q]
        img = synthetic.render_image(cam_np, T_WC, pts, b, r, seed=1000 + i)
        pm1, valid = detect(jnp.asarray(img), float(rng.uniform(-3.14, 3.14)))
        v = np.asarray(valid)
        out.append(np.asarray(pm1, np.float32)[v])
        n += int(v.sum())
        i += 1
        if verbose and i % 25 == 0:
            print(f"  {i} views, {n} descriptors, {time.time()-t0:.0f}s",
                  file=sys.stderr, flush=True)
    return np.concatenate(out)[:n_target]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(__file__), "..", "okvis2x_tpu", "resources",
            "vocab_b64l64.npz",
        ),
    )
    ap.add_argument("--n", type=int, default=120_000)
    ap.add_argument("--branch", type=int, default=64)
    ap.add_argument("--leaf", type=int, default=64)
    args = ap.parse_args()

    from okvis2x_tpu.utils import jaxconfig

    jaxconfig.setup()
    import jax.numpy as jnp

    from okvis2x_tpu.frontend import bow

    desc = collect_descriptors(args.n)
    print(f"corpus: {desc.shape}", file=sys.stderr)
    t0 = time.time()
    vocab = bow.train_vocabulary_hier(
        jnp.asarray(desc), branch=args.branch, leaf=args.leaf, iters=8
    )
    print(f"trained in {time.time()-t0:.0f}s", file=sys.stderr)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    vocab.save(args.out)
    print(f"saved {args.out} ({os.path.getsize(args.out)/1024:.0f} KB)")


if __name__ == "__main__":
    main()
