#!/usr/bin/env python
"""Train the FastSCNN keypoint-classification net on the textured world.

The reference runs a TorchScript **fast-scnn** Cityscapes model and
downweights keypoints on sky (class 10) and people (class 11)
(okvis_cv/src/Frame.cpp:33-128 computeClassifications).  This container has
zero egress, so the artifact is trained HERE on the textured synthetic
world (okvis2x_tpu/io/synthetic.py::render_textured), whose renderer emits
exact per-pixel class maps: static structure, drifting-cloud sky, and
moving textured distractor clusters — the same two failure modes
(texture-at-infinity, dynamic objects) the reference's classifier rejects.

Labels map onto the Cityscapes id space the module already uses:
static -> 0 (road), sky -> 10 (SKY), distractor -> 11 (PERSON).

Usage: python tools/train_segmentation.py [--steps 600] [--out ...npz]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

CLS_MAP = {0: 0, 1: 10, 2: 11}  # renderer class -> cityscapes id


def render_pool(cam_np, world, rng, n, traj_span=180.0):
    """Rendered (img, cls) pairs from random circuit viewpoints/times."""
    from okvis2x_tpu.io import synthetic

    ims, cls = [], []
    for k in range(n):
        t = float(rng.uniform(0, traj_span))
        p, q, _, _, _ = synthetic.circuit_trajectory(np.array([t]))
        # viewpoint jitter off the exact trajectory
        pos = p[0] + rng.uniform(-0.5, 0.5, 3)
        T_WC = np.r_[pos, q[0]]
        img, c = synthetic.render_textured(
            cam_np, T_WC, world, t, seed=k, with_classes=True)
        ims.append(img)
        cls.append(c)
    return np.stack(ims), np.stack(cls)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "okvis2x_tpu", "resources",
        "fast_scnn.npz"))
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--pool", type=int, default=160)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--height", type=int, default=240)
    ap.add_argument("--width", type=int, default=376)
    ap.add_argument("--lr", type=float, default=6e-4)
    args = ap.parse_args()

    from okvis2x_tpu.utils import jaxconfig

    jaxconfig.setup()
    import jax
    import jax.numpy as jnp
    import optax

    from okvis2x_tpu.cameras import pinhole, pinhole_np
    from okvis2x_tpu.io import synthetic
    from okvis2x_tpu.models import segmentation as seg

    H, W = args.height, args.width
    cam = pinhole.make_pinhole(
        fx=230.0, fy=230.0, cx=W / 2, cy=H / 2, width=W, height=H,
        model="radtan", dist_params=[-0.25, 0.06, 1e-4, -1e-4],
    )
    cam_np = pinhole_np.to_numpy(cam)
    rng = np.random.default_rng(0)
    # several worlds for texture/distractor diversity
    worlds = [synthetic.make_textured_world(seed=700 + s, n_distractors=7)
              for s in range(4)]

    t0 = time.time()
    per = args.pool // len(worlds)
    ims, cls = [], []
    for w in worlds:
        i_, c_ = render_pool(cam_np, w, rng, per)
        ims.append(i_)
        cls.append(c_)
    ims = np.concatenate(ims)
    cls = np.concatenate(cls)
    # renderer class -> cityscapes id
    cs = np.zeros_like(cls)
    for k, v in CLS_MAP.items():
        cs[cls == k] = v
    print(f"rendered pool of {len(ims)} frames in {time.time()-t0:.0f}s; "
          f"class px: static {np.mean(cls==0):.2f} sky {np.mean(cls==1):.2f} "
          f"distractor {np.mean(cls==2)*100:.2f}%", file=sys.stderr,
          flush=True)

    net, params = seg.init_fast_scnn(jax.random.key(0), H, W)
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    # class weighting: distractor pixels are ~0.1% of the image but carry
    # the behaviourally-critical label
    wtab = np.ones(seg.NUM_CLASSES, np.float32)
    wtab[seg.SKY] = 1.0
    wtab[seg.PERSON] = 40.0
    wtab = jnp.asarray(wtab)

    def loss_fn(p, img, lab):
        def one(im, lb):
            logits = net.apply(p, im)
            ll = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(ll, lb[..., None], axis=-1)[..., 0]
            w = wtab[lb]
            return jnp.sum(nll * w) / jnp.sum(w)

        return jnp.mean(jax.vmap(one)(img, lab))

    @jax.jit
    def step(p, o, img, lab):
        l, g = jax.value_and_grad(loss_fn)(p, img, lab)
        updates, o = tx.update(g, o)
        return optax.apply_updates(p, updates), o, l

    t0 = time.time()
    for it in range(args.steps):
        idx = rng.integers(0, len(ims), args.batch)
        gain = rng.uniform(0.85, 1.1, (args.batch, 1, 1)).astype(np.float32)
        noise = rng.normal(0, 0.03, (args.batch, H, W)).astype(np.float32)
        img = jnp.asarray(np.clip(ims[idx] * gain + noise, 0, 1))
        lab = jnp.asarray(cs[idx].astype(np.int32))
        params, opt_state, l = step(params, opt_state, img, lab)
        if it % 50 == 0:
            print(f"step {it}  loss {float(l):.4f}  ({time.time()-t0:.0f}s)",
                  file=sys.stderr, flush=True)

    # ---- held-out eval: per-class IoU + keypoint-level downweight quality
    # vs the sky-heuristic fallback
    eval_rng = np.random.default_rng(999)
    ew = synthetic.make_textured_world(seed=901, n_distractors=7)
    ei, ec = render_pool(cam_np, ew, eval_rng, 16)
    apply_j = jax.jit(lambda p, im: jnp.argmax(net.apply(p, im), axis=-1))
    inter = np.zeros(3)
    union = np.zeros(3)
    kp_net_hit = kp_net_fa = kp_heu_hit = kp_heu_fa = 0
    kp_bad_total = kp_good_total = 0
    for im, c in zip(ei, ec):
        pred = np.asarray(apply_j(params, jnp.asarray(im)))
        pm = np.zeros_like(pred)
        pm[pred == seg.SKY] = 1
        pm[pred == seg.PERSON] = 2
        for k in range(3):
            inter[k] += np.sum((pm == k) & (c == k))
            union[k] += np.sum((pm == k) | (c == k))
        # keypoint-level: sample random "keypoints", ask whether weighting
        # flags the bad ones (sky or distractor) without flagging good ones
        ys = eval_rng.integers(8, im.shape[0] - 8, 300)
        xs = eval_rng.integers(8, im.shape[1] - 8, 300)
        uv = np.stack([xs, ys], -1).astype(np.float64)
        bad = c[ys, xs] != 0
        cls_kp = np.asarray(seg.sample_classes(
            jnp.asarray(net.apply(params, jnp.asarray(im))), jnp.asarray(uv)))
        w_net = np.asarray(seg.keypoint_weights_from_classes(
            jnp.asarray(cls_kp)))
        w_heu = np.asarray(seg.sky_heuristic_weights(
            jnp.asarray(im), jnp.asarray(uv)))
        kp_net_hit += int(np.sum((w_net > 1.5) & bad))
        kp_net_fa += int(np.sum((w_net > 1.5) & ~bad))
        kp_heu_hit += int(np.sum((w_heu > 1.5) & bad))
        kp_heu_fa += int(np.sum((w_heu > 1.5) & ~bad))
        kp_bad_total += int(bad.sum())
        kp_good_total += int((~bad).sum())
    iou = inter / np.maximum(union, 1)
    net_recall = kp_net_hit / max(kp_bad_total, 1)
    heu_recall = kp_heu_hit / max(kp_bad_total, 1)
    net_fa = kp_net_fa / max(kp_good_total, 1)
    heu_fa = kp_heu_fa / max(kp_good_total, 1)
    print(f"held-out IoU: static {iou[0]:.3f} sky {iou[1]:.3f} "
          f"distractor {iou[2]:.3f}")
    print(f"keypoint downweight recall/false-alarm: net {net_recall:.3f}/"
          f"{net_fa:.3f} vs heuristic {heu_recall:.3f}/{heu_fa:.3f}")

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
        args.out, __meta_iou_static=iou[0], __meta_iou_sky=iou[1],
        __meta_iou_distractor=iou[2], __meta_kp_recall_net=net_recall,
        __meta_kp_recall_heuristic=heu_recall,
        __meta_kp_falsealarm_net=net_fa,
        __meta_kp_falsealarm_heuristic=heu_fa, **flat)
    print(f"saved {args.out} ({os.path.getsize(args.out)/1024:.0f} KB)")


if __name__ == "__main__":
    main()
