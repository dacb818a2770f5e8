"""Learned multi-view-stereo depth network (SimpleRecon-style, compact).

Structure-parity counterpart of the reference's TorchScript MVS model
(`mvs-sigma.pt`, okvis_deep_learning/CMakeLists.txt:90-150, consumed at
DepthFusionProcessor.cpp:78-497): a shared feature CNN over the reference
and source frames, a metadata-augmented plane-sweep cost volume (feature
correlation + ray-angle + validity per hypothesis, reduced by a small MLP
— the SimpleRecon signature), 2-D aggregation, soft-argmin depth
regression over inverse depth, and a log-variance head.  Optionally takes
sparse depth hints (the estimator's landmark depths, as the reference
feeds DepthFusionProcessor) as an extra cost-volume channel.

Weights are randomly initialised — the environment cannot fetch pretrained
checkpoints — so accuracy-path runs use models/mvs.plane_sweep; this module
provides the trainable family and the exact I/O contract
(ref, sources, intrinsics, T_ref_src, sparse hints) -> (depth, sigma)
for when weights can be loaded via `load_params`.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from okvis2x_tpu.models.stereo_net import FeatureNet


def _warp_features(
    feat_src: jax.Array,  # (h, w, c) source features (1/4 res)
    fxfycxcy4: jax.Array,  # (4,) intrinsics at 1/4 resolution
    T_sr: jax.Array,  # (4, 4) ref-cam -> src-cam homogeneous matrix
    depth: jax.Array,  # () hypothesis depth (in the ref camera)
):
    """Back-project every 1/4-res ref pixel at `depth`, transform into the
    source camera and bilinearly sample source features; returns
    (warped (h, w, c), valid (h, w))."""
    h, w, c = feat_src.shape
    fx, fy, cx, cy = fxfycxcy4
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    X = (xs - cx) / fx * depth
    Y = (ys - cy) / fy * depth
    Z = jnp.full_like(X, depth)
    P = jnp.stack([X, Y, Z, jnp.ones_like(X)], axis=-1)  # (h, w, 4)
    Q = jnp.einsum("ij,hwj->hwi", T_sr, P)
    z = jnp.maximum(Q[..., 2], 1e-6)
    u = Q[..., 0] / z * fx + cx
    v = Q[..., 1] / z * fy + cy
    valid = (
        (Q[..., 2] > 1e-4)
        & (u >= 0) & (u <= w - 1) & (v >= 0) & (v <= h - 1)
    )
    u = jnp.clip(u, 0.0, w - 1.0)
    v = jnp.clip(v, 0.0, h - 1.0)
    x0 = jnp.floor(u).astype(jnp.int32)
    y0 = jnp.floor(v).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    wx = (u - x0)[..., None]
    wy = (v - y0)[..., None]
    f00 = feat_src[y0, x0]
    f01 = feat_src[y0, x1]
    f10 = feat_src[y1, x0]
    f11 = feat_src[y1, x1]
    warped = (
        f00 * (1 - wx) * (1 - wy)
        + f01 * wx * (1 - wy)
        + f10 * (1 - wx) * wy
        + f11 * wx * wy
    )
    return warped, valid


class MatchingMlp(nn.Module):
    """SimpleRecon-style metadata reducer: per (pixel, hypothesis) features
    [correlation, mean-abs-diff, ray-angle cosine, validity, hint-consistency]
    -> scalar matching score."""

    hidden: int = 16

    @nn.compact
    def __call__(self, x):  # (..., F)
        x = nn.Dense(self.hidden)(x)
        x = nn.relu(x)
        x = nn.Dense(self.hidden)(x)
        x = nn.relu(x)
        return nn.Dense(1)(x)[..., 0]


class CostAggregation(nn.Module):
    channels: int = 32

    @nn.compact
    def __call__(self, vol):  # (h, w, D)
        c = self.channels
        x = nn.Conv(c, (3, 3))(vol)
        x = nn.relu(x)
        x = nn.Conv(c, (3, 3))(x)
        x = nn.relu(x)
        x = nn.Conv(vol.shape[-1], (3, 3))(x)
        return vol + x


class SigmaHead(nn.Module):
    @nn.compact
    def __call__(self, feats):
        x = nn.Conv(32, (3, 3))(feats)
        x = nn.relu(x)
        x = nn.Conv(1, (3, 3))(x)
        return x[..., 0]


class MvsNet(nn.Module):
    """(ref, sources, intrinsics, poses[, hints]) -> (depth, sigma)."""

    n_depths: int = 32
    d_min: float = 0.25
    d_max: float = 8.0
    channels: int = 64

    @nn.compact
    def __call__(
        self,
        ref: jax.Array,  # (H, W) grayscale in [0, 1]
        sources: jax.Array,  # (S, H, W)
        fxfycxcy: jax.Array,  # (4,) full-res intrinsics (shared)
        T_sr: jax.Array,  # (S, 4, 4) ref-cam -> src-cam
        sparse_depth: Optional[jax.Array] = None,  # (H, W), 0 = no hint
    ) -> Tuple[jax.Array, jax.Array]:
        H, W = ref.shape
        feat = FeatureNet(self.channels)
        f_ref = feat(ref[..., None])  # (h, w, c), 1/4 res
        f_srcs = jax.vmap(lambda s: feat(s[..., None]))(sources)
        h, w, c = f_ref.shape
        k4 = fxfycxcy / 4.0

        # inverse-depth hypotheses (MVS convention)
        inv = jnp.linspace(1.0 / self.d_max, 1.0 / self.d_min, self.n_depths)
        depths = 1.0 / inv  # (D,)

        hint4 = None
        if sparse_depth is not None:
            hint4 = jax.image.resize(sparse_depth, (h, w), "nearest")

        def hypothesis(d):
            def per_src(f_src, T):
                warped, valid = _warp_features(f_src, k4, T, d)
                corr = jnp.mean(f_ref * warped, axis=-1)
                mad = jnp.mean(jnp.abs(f_ref - warped), axis=-1)
                return corr, mad, valid.astype(jnp.float32)

            corr, mad, valid = jax.vmap(per_src)(f_srcs, T_sr)
            nv = jnp.maximum(jnp.sum(valid, axis=0), 1.0)
            corr_m = jnp.sum(corr * valid, axis=0) / nv
            mad_m = jnp.sum(mad * valid, axis=0) / nv
            vfrac = jnp.mean(valid, axis=0)
            # geometric metadata: hint consistency in inverse depth
            if hint4 is not None:
                hint_ok = (hint4 > 1e-3).astype(jnp.float32)
                hint_err = hint_ok * jnp.abs(
                    1.0 / jnp.maximum(hint4, 1e-3) - 1.0 / d
                )
            else:
                hint_err = jnp.zeros((h, w), jnp.float32)
                hint_ok = jnp.zeros((h, w), jnp.float32)
            return jnp.stack(
                [corr_m, mad_m, vfrac, hint_err, hint_ok], axis=-1
            )  # (h, w, 5)

        meta = jnp.stack([hypothesis(d) for d in depths], axis=-2)  # (h,w,D,5)
        vol = MatchingMlp()(meta)  # (h, w, D)
        vol = CostAggregation()(vol)

        att = jax.nn.softmax(vol, axis=-1)
        inv_d = jnp.sum(att * inv, axis=-1)  # soft-argmin in inverse depth
        depth4 = 1.0 / jnp.maximum(inv_d, 1.0 / self.d_max)
        ent = -jnp.sum(att * jnp.log(jnp.maximum(att, 1e-9)), axis=-1)
        log_sigma4 = SigmaHead()(
            jnp.stack([depth4, ent, jnp.max(vol, axis=-1)], axis=-1)
        )

        depth = jax.image.resize(depth4, (H, W), "bilinear")
        sigma = jnp.exp(jax.image.resize(log_sigma4, (H, W), "bilinear")) + 0.01
        return depth, sigma


def init_mvs_net(
    key: jax.Array,
    height: int,
    width: int,
    n_sources: int = 2,
    n_depths: int = 32,
) -> Tuple[MvsNet, Any]:
    net = MvsNet(n_depths=n_depths)
    params = net.init(
        key,
        jnp.zeros((height, width), jnp.float32),
        jnp.zeros((n_sources, height, width), jnp.float32),
        jnp.array([100.0, 100.0, width / 2, height / 2], jnp.float32),
        jnp.tile(jnp.eye(4, dtype=jnp.float32), (n_sources, 1, 1)),
    )
    return net, params


import os

DEFAULT_WEIGHTS = os.path.join(
    os.path.dirname(__file__), "..", "resources", "mvs_net.npz"
)


def load_params(path: str = None):
    """Load trained parameters from the flat npz written by
    tools/train_mvs.py (keys are '/'-joined tree paths; __meta_* keys carry
    held-out eval metrics).  Returns (params, meta), or (None, {}) when no
    artifact exists (callers fall back to the classical plane sweep).
    Orbax checkpoint directories are also accepted."""
    import numpy as np

    path = path or DEFAULT_WEIGHTS
    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        return ocp.StandardCheckpointer().restore(path), {}
    if not os.path.exists(path):
        return None, {}
    raw = np.load(path)
    params: dict = {}
    meta = {}
    for k in raw.files:
        if k.startswith("__meta_"):
            meta[k[7:]] = float(raw[k])
            continue
        parts = [p for p in k.split("/") if p]
        d = params
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = jnp.asarray(raw[k])
    return params, meta
