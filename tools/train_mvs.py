#!/usr/bin/env python
"""Train the MvsNet multi-view depth + sigma model on synthetic renders.

The reference ships a TorchScript SimpleRecon-style MVS checkpoint
(`mvs-sigma.pt`, okvis_deep_learning/CMakeLists.txt:90-150) consumed by
DepthFusionProcessor.cpp:78-497, whose output is inverse-variance-fused
with the stereo prediction (:418-420).  This container has zero egress, so
the equivalent artifact is trained HERE on rendered multi-view sets with
analytic ground-truth depth (okvis2x_tpu/io/synthetic.py): a reference
view plus S=2 source views at known relative poses.

Loss: Gaussian negative log-likelihood on depth (calibrates the sigma head
jointly — the sigma is what the fusion weighs by).  Sensor-noise + gain
augmentation gives the learned model its edge over the classical
plane-sweep fallback (models/mvs.plane_sweep), exactly as the trained
stereo net earns its edge over census.

Usage: python tools/train_mvs.py [--steps 900] [--out ...npz]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def render_set(cam_np, cam, rng, scenes, n_src, baseline_range=(0.08, 0.35)):
    """Render (ref, sources (S,H,W), T_sr (S,4,4), gt_depth) from a random
    viewpoint with S nearby source views."""
    from okvis2x_tpu.core import se3np
    from okvis2x_tpu.io import synthetic

    pts, bright, rad = scenes[rng.integers(0, len(scenes))]
    center = pts.mean(0)
    pos = center + rng.uniform([-4, -4, -center[2] - 0.5],
                               [4, 4, -center[2] + 1.0])
    yaw = rng.uniform(0, 2 * np.pi)
    q = np.array([0, 0, np.sin(yaw / 2), np.cos(yaw / 2)])
    T_WC0 = np.r_[pos, q]
    seed = int(rng.integers(0, 1 << 31))
    ref = synthetic.render_image(cam_np, T_WC0, pts, bright, rad,
                                 noise=0.0, seed=seed)
    depth = synthetic.render_depth(cam, T_WC0, pts)

    srcs, T_srs, T_sr7s = [], [], []
    for s in range(n_src):
        # source views: sideways/vertical baseline + small yaw jitter —
        # the geometry the VIO pipeline provides (previous keyframes)
        dp = rng.uniform(-1, 1, 3)
        dp = dp / np.linalg.norm(dp) * rng.uniform(*baseline_range)
        dyaw = rng.uniform(-0.06, 0.06)
        qy = np.array([0, 0, np.sin(dyaw / 2), np.cos(dyaw / 2)])
        T_WCs = se3np.se3_multiply(
            np.r_[pos + se3np.quat_to_matrix(q) @ dp, q],
            np.r_[np.zeros(3), qy],
        )
        srcs.append(synthetic.render_image(
            cam_np, T_WCs, pts, bright, rad, noise=0.0, seed=seed + 7 + s))
        # ref-cam -> src-cam homogeneous matrix (mvs_net contract)
        T_sr7 = se3np.se3_multiply(se3np.se3_inverse(T_WCs), T_WC0)
        M = np.eye(4)
        M[:3, :3] = se3np.quat_to_matrix(T_sr7[3:7])
        M[:3, 3] = T_sr7[:3]
        T_srs.append(M)
        T_sr7s.append(T_sr7)
    return (ref.astype(np.float32), np.stack(srcs).astype(np.float32),
            np.stack(T_srs).astype(np.float32), depth.astype(np.float32),
            np.stack(T_sr7s).astype(np.float32))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "okvis2x_tpu", "resources",
        "mvs_net.npz"))
    ap.add_argument("--steps", type=int, default=900)
    ap.add_argument("--pool", type=int, default=200)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--height", type=int, default=192)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--n-src", type=int, default=2)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--noise", type=float, default=0.06)
    args = ap.parse_args()

    from okvis2x_tpu.utils import jaxconfig

    jaxconfig.setup()
    import jax
    import jax.numpy as jnp
    import optax

    from okvis2x_tpu.cameras import pinhole, pinhole_np
    from okvis2x_tpu.io import synthetic
    from okvis2x_tpu.models import mvs_net

    H, W = args.height, args.width
    fx = 230.0
    cam = pinhole.make_pinhole(
        fx=fx, fy=fx, cx=W / 2, cy=H / 2, width=W, height=H,
        model="radtan", dist_params=[0.0, 0.0, 0.0, 0.0],
    )
    cam_np = pinhole_np.to_numpy(cam)
    fxfycxcy = np.array([fx, fx, W / 2, H / 2], np.float32)
    rng = np.random.default_rng(0)
    scenes = []
    for s in range(6):
        scenes.append(synthetic.make_circuit_scene(
            density=float(rng.uniform(16, 30)), seed=500 + s))
    for s in range(6):
        scenes.append(synthetic.make_scene(
            n_points=int(rng.uniform(600, 1600)), seed=600 + s))

    net, params = mvs_net.init_mvs_net(
        jax.random.key(0), H, W, n_sources=args.n_src)
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)
    d_lo, d_hi = net.d_min + 0.05, net.d_max - 0.2

    def loss_fn(p, ref, srcs, T_sr, gt):
        def one(r, s, T, g):
            depth, sigma = net.apply(p, r, s, jnp.asarray(fxfycxcy), T)
            valid = (g > d_lo) & (g < d_hi)
            e = depth - g
            nll = (e * e) / (2.0 * sigma * sigma) + jnp.log(sigma)
            v = valid.astype(jnp.float32)
            return jnp.sum(nll * v) / jnp.maximum(jnp.sum(v), 1.0)

        return jnp.mean(jax.vmap(one)(ref, srcs, T_sr, gt))

    @jax.jit
    def step(p, o, ref, srcs, T_sr, gt):
        l, g = jax.value_and_grad(loss_fn)(p, ref, srcs, T_sr, gt)
        updates, o = tx.update(g, o)
        return optax.apply_updates(p, updates), o, l

    t0 = time.time()
    pr, ps, pT, pg = [], [], [], []
    for _ in range(args.pool):
        r, s, T, g, _ = render_set(cam_np, cam, rng, scenes, args.n_src)
        pr.append(r); ps.append(s); pT.append(T); pg.append(g)
    pr, ps = np.stack(pr), np.stack(ps)
    pT, pg = np.stack(pT), np.stack(pg)
    print(f"rendered pool of {args.pool} sets in {time.time()-t0:.0f}s",
          file=sys.stderr, flush=True)

    def batch():
        idx = rng.integers(0, args.pool, args.batch)
        gain = rng.uniform(0.8, 1.15, (args.batch, 1, 1)).astype(np.float32)
        nr = rng.normal(0, args.noise, (args.batch, H, W)).astype(np.float32)
        ns = rng.normal(
            0, args.noise, (args.batch, args.n_src, H, W)).astype(np.float32)
        return (jnp.asarray(np.clip(pr[idx] * gain + nr, 0, 1)),
                jnp.asarray(np.clip(ps[idx] * gain[:, None] + ns, 0, 1)),
                jnp.asarray(pT[idx]), jnp.asarray(pg[idx]))

    t0 = time.time()
    for it in range(args.steps):
        ref, srcs, T_sr, gt = batch()
        params, opt_state, l = step(params, opt_state, ref, srcs, T_sr, gt)
        if it % 50 == 0:
            print(f"step {it}  loss {float(l):.4f}  "
                  f"({time.time()-t0:.0f}s)", file=sys.stderr, flush=True)

    # ---- held-out evaluation: net vs classical plane sweep, both under the
    # same sensor noise (the dispatch gate in models/mvs.mvs_depth compares
    # these meta numbers)
    from okvis2x_tpu.core import se3np
    from okvis2x_tpu.models import mvs as mvs_mod

    eval_rng = np.random.default_rng(999)
    apply_j = jax.jit(lambda p, r, s, T: net.apply(
        p, r, s, jnp.asarray(fxfycxcy), T))
    K = np.array([[fx, 0, W / 2], [0, fx, H / 2], [0, 0, 1]], np.float32)
    sweep_j = jax.jit(lambda r, s, T7: mvs_mod.plane_sweep(
        r, s, jnp.asarray(K), T7,
        min_depth=net.d_min, max_depth=net.d_max, num_depths=48))
    err_net, err_ps, zs = [], [], []
    for _ in range(12):
        ref, srcs, T_sr, g, T_sr7 = render_set(cam_np, cam, eval_rng,
                                               scenes, args.n_src)
        ref = np.clip(ref + eval_rng.normal(0, args.noise, ref.shape),
                      0, 1).astype(np.float32)
        srcs = np.clip(
            srcs + eval_rng.normal(0, args.noise, srcs.shape), 0, 1
        ).astype(np.float32)
        depth, sigma = apply_j(params, jnp.asarray(ref), jnp.asarray(srcs),
                               jnp.asarray(T_sr))
        # plane_sweep takes T_ref_src as 7-vectors (pose of src in ref cam)
        T7 = np.stack([se3np.se3_inverse(t) for t in T_sr7])
        sw = sweep_j(jnp.asarray(ref), jnp.asarray(srcs), jnp.asarray(T7))
        depth, sigma = np.asarray(depth), np.asarray(sigma)
        swd, swv = np.asarray(sw.depth), np.asarray(sw.valid)
        m = (g > d_lo) & (g < d_hi)
        if m.sum() == 0:
            continue
        err_net.append(np.sqrt(np.mean((depth[m] - g[m]) ** 2)))
        mp = m & swv
        if mp.sum():
            err_ps.append(np.sqrt(np.mean((swd[mp] - g[mp]) ** 2)))
        zs.append((depth[m] - g[m]) / np.maximum(sigma[m], 1e-3))
    rmse_net = float(np.mean(err_net))
    rmse_ps = float(np.mean(err_ps)) if err_ps else float("nan")
    z = np.concatenate(zs)
    print(f"held-out depth RMSE: net {rmse_net:.3f} m vs plane-sweep "
          f"{rmse_ps:.3f} m; sigma z-score std {z.std():.2f} "
          f"(1.0 = calibrated)")

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
        args.out, __meta_rmse_net=rmse_net, __meta_rmse_plane_sweep=rmse_ps,
        __meta_sigma_z=float(z.std()), __meta_n_src=args.n_src,
        __meta_n_depths=net.n_depths,
        __meta_d_min=net.d_min, __meta_d_max=net.d_max, **flat)
    print(f"saved {args.out} ({os.path.getsize(args.out)/1024:.0f} KB)")


if __name__ == "__main__":
    main()
