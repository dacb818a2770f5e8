#!/usr/bin/env python
"""Train the StereoNet disparity + sigma model on synthetic renders.

The reference ships TorchScript stereo checkpoints
(`stereo-indoor-sigma.pt`, consumed at okvis_deep_learning/src/
Stereo2DepthProcessor.cpp:65-202) trained offline on real data.  This
container has zero egress, so the equivalent artifact is trained HERE, on
rendered stereo pairs with analytic ground-truth depth
(okvis2x_tpu/io/synthetic.py) — dot-field scenes rendered from random
viewpoints with a horizontal stereo baseline.

Loss: Gaussian negative log-likelihood on disparity (calibrates the sigma
head jointly, ≙ the reference's sigma-output models whose variances feed
inverse-variance depth fusion, DepthFusionProcessor.cpp:418-420).

Usage: python tools/train_stereo.py [--steps 1200] [--out ...npz]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def make_pair(cam_np, rng, scenes, H, W, fx, baseline):
    """Render (left, right, gt_disp) from a random viewpoint."""
    from okvis2x_tpu.core import se3np
    from okvis2x_tpu.io import synthetic

    pts, bright, rad = scenes[rng.integers(0, len(scenes))]
    center = pts.mean(0)
    pos = center + rng.uniform([-5, -5, -center[2] - 0.5],
                               [5, 5, -center[2] + 1.0])
    yaw = rng.uniform(0, 2 * np.pi)
    q = np.array([0, 0, np.sin(yaw / 2), np.cos(yaw / 2)])
    T_WC0 = np.r_[pos, q]
    # right camera: shifted along camera +x
    dx_W = se3np.quat_to_matrix(q) @ np.array([baseline, 0, 0])
    T_WC1 = np.r_[pos + dx_W, q]
    seed = int(rng.integers(0, 1 << 31))
    left = synthetic.render_image(cam_np, T_WC0, pts, bright, rad, seed=seed)
    right = synthetic.render_image(cam_np, T_WC1, pts, bright, rad, seed=seed)
    # sensor-noise augmentation: the learned model's edge over census is
    # robustness under noise (the clean analytic renders are census's
    # best case); both train and eval see the same corruption
    left = np.clip(left + rng.normal(0, 0.06, left.shape), 0, 1)
    right = np.clip(right + rng.normal(0, 0.06, right.shape), 0, 1)
    depth = synthetic.render_depth(cam_np, T_WC0, pts)
    disp = np.where(depth > 0.1, fx * baseline / np.maximum(depth, 0.1), 0.0)
    return (left.astype(np.float32), right.astype(np.float32),
            disp.astype(np.float32))


def make_pool(cam_np, rng, scenes, H, W, fx, baseline, n, noise=0.06):
    """Pre-render n CLEAN stereo pairs (noise added at sampling time): on a
    2-core host rendering dominates training, so the pool is rendered once
    and each step only draws fresh sensor noise + gain jitter."""
    from okvis2x_tpu.core import se3np
    from okvis2x_tpu.io import synthetic

    ls, rs, gs = [], [], []
    for _ in range(n):
        pts, bright, rad = scenes[rng.integers(0, len(scenes))]
        center = pts.mean(0)
        pos = center + rng.uniform([-5, -5, -center[2] - 0.5],
                                   [5, 5, -center[2] + 1.0])
        yaw = rng.uniform(0, 2 * np.pi)
        q = np.array([0, 0, np.sin(yaw / 2), np.cos(yaw / 2)])
        T_WC0 = np.r_[pos, q]
        dx_W = se3np.quat_to_matrix(q) @ np.array([baseline, 0, 0])
        T_WC1 = np.r_[pos + dx_W, q]
        seed = int(rng.integers(0, 1 << 31))
        ls.append(synthetic.render_image(
            cam_np, T_WC0, pts, bright, rad, noise=0.0, seed=seed))
        rs.append(synthetic.render_image(
            cam_np, T_WC1, pts, bright, rad, noise=0.0, seed=seed))
        depth = synthetic.render_depth(cam_np, T_WC0, pts)
        gs.append(np.where(
            depth > 0.1, fx * baseline / np.maximum(depth, 0.1), 0.0))
    return (np.stack(ls).astype(np.float32),
            np.stack(rs).astype(np.float32),
            np.stack(gs).astype(np.float32))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "okvis2x_tpu", "resources",
        "stereo_net.npz"))
    ap.add_argument("--steps", type=int, default=1200)
    ap.add_argument("--pool", type=int, default=320)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--height", type=int, default=192)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--lr", type=float, default=2e-4)
    args = ap.parse_args()

    from okvis2x_tpu.utils import jaxconfig

    jaxconfig.setup()
    import jax
    import jax.numpy as jnp
    import optax

    from okvis2x_tpu.cameras import pinhole, pinhole_np
    from okvis2x_tpu.io import synthetic
    from okvis2x_tpu.models import stereo_net

    H, W = args.height, args.width
    fx = 230.0
    baseline = 0.11
    cam = pinhole.make_pinhole(
        fx=fx, fy=fx, cx=W / 2, cy=H / 2, width=W, height=H,
        model="radtan", dist_params=[0.0, 0.0, 0.0, 0.0],
    )
    cam_np = pinhole_np.to_numpy(cam)
    rng = np.random.default_rng(0)
    scenes = []
    for s in range(6):
        scenes.append(synthetic.make_circuit_scene(
            density=float(rng.uniform(16, 30)), seed=300 + s))
    for s in range(6):
        scenes.append(synthetic.make_scene(
            n_points=int(rng.uniform(500, 1400)), seed=400 + s))

    net, params = stereo_net.init_stereo_net(jax.random.key(0), H, W)
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    def loss_fn(p, left, right, gt):
        def one(l, r, g):
            disp, sigma = net.apply(p, l, r)
            valid = (g > 0.5) & (g < net.max_disp - 1)
            e = disp - g
            nll = (e * e) / (2.0 * sigma * sigma) + jnp.log(sigma)
            v = valid.astype(jnp.float32)
            return jnp.sum(nll * v) / jnp.maximum(jnp.sum(v), 1.0)

        return jnp.mean(jax.vmap(one)(left, right, gt))

    @jax.jit
    def step(p, o, left, right, gt):
        l, g = jax.value_and_grad(loss_fn)(p, left, right, gt)
        updates, o = tx.update(g, o)
        return optax.apply_updates(p, updates), o, l

    t0 = time.time()
    pool_l, pool_r, pool_g = make_pool(
        cam_np, rng, scenes, H, W, fx, baseline, args.pool)
    print(f"rendered pool of {args.pool} pairs in {time.time()-t0:.0f}s",
          file=sys.stderr, flush=True)

    def batch():
        idx = rng.integers(0, args.pool, args.batch)
        gain = rng.uniform(0.8, 1.15, (args.batch, 1, 1)).astype(np.float32)
        nl = rng.normal(0, 0.06, (args.batch, H, W)).astype(np.float32)
        nr = rng.normal(0, 0.06, (args.batch, H, W)).astype(np.float32)
        return (jnp.asarray(np.clip(pool_l[idx] * gain + nl, 0, 1)),
                jnp.asarray(np.clip(pool_r[idx] * gain + nr, 0, 1)),
                jnp.asarray(pool_g[idx]))

    t0 = time.time()
    for it in range(args.steps):
        left, right, gt = batch()
        params, opt_state, l = step(params, opt_state, left, right, gt)
        if it % 50 == 0:
            print(f"step {it}  loss {float(l):.4f}  "
                  f"({time.time()-t0:.0f}s)", file=sys.stderr, flush=True)

    # ---- evaluation on held-out pairs: net vs census baseline
    from okvis2x_tpu.models import stereo as stereo_mod

    eval_rng = np.random.default_rng(999)
    apply_j = jax.jit(lambda p, l, r: net.apply(p, l, r))
    census_j = jax.jit(
        lambda l, r: stereo_mod.census_stereo(l, r, max_disp=64))
    err_net, err_cen, zs = [], [], []
    for _ in range(16):
        l, r, g = make_pair(cam_np, eval_rng, scenes, H, W, fx, baseline)
        disp, sigma = apply_j(params, jnp.asarray(l), jnp.asarray(r))
        dc, sc, vc = census_j(jnp.asarray(l), jnp.asarray(r))
        disp, sigma = np.asarray(disp), np.asarray(sigma)
        dc, vc = np.asarray(dc), np.asarray(vc)
        m = (g > 0.5) & (g < 63)
        if m.sum() == 0:
            continue
        err_net.append(np.sqrt(np.mean((disp[m] - g[m]) ** 2)))
        mc = m & vc
        if mc.sum():
            err_cen.append(np.sqrt(np.mean((dc[mc] - g[mc]) ** 2)))
        zs.append((disp[m] - g[m]) / np.maximum(sigma[m], 1e-3))
    rmse_net = float(np.mean(err_net))
    rmse_cen = float(np.mean(err_cen)) if err_cen else float("nan")
    z = np.concatenate(zs)
    print(f"held-out disparity RMSE: net {rmse_net:.3f} px vs census "
          f"{rmse_cen:.3f} px; sigma z-score std {z.std():.2f} "
          f"(1.0 = calibrated)")

    # ---- persist as a flat npz (loadable without orbax)
    flat = {}

    def rec(prefix, tree):
        for k, v in tree.items():
            kk = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                rec(kk, v)
            else:
                flat[kk] = np.asarray(v)

    rec("", jax.tree.map(lambda x: np.asarray(x), params))
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    np.savez_compressed(
        args.out, __meta_rmse_net=rmse_net, __meta_rmse_census=rmse_cen,
        __meta_sigma_z=float(z.std()), **flat)
    print(f"saved {args.out} ({os.path.getsize(args.out)/1024:.0f} KB)")


if __name__ == "__main__":
    main()
