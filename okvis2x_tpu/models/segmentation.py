"""Keypoint classification via semantic segmentation (fast-scnn family).

Fills the role of the reference's TorchScript **fast-scnn** Cityscapes
segmentation sampled at keypoint locations (okvis_cv/src/Frame.cpp:33-128,
`computeClassifications`): keypoints on dynamic content (person, class 11)
or texture-less infinity (sky, class 10) get downweighted in matching and
estimation.

`FastSCNN` is a compact flax implementation of the fast-scnn topology
(learning-to-downsample → global feature extractor with an FFM-style skip →
classifier).  Without downloadable pretrained weights, `classify_keypoints`
also offers a classical fallback: a brightness/gradient sky heuristic that
reproduces the only behaviourally-relevant effect on the datasets used
(downweighting sky keypoints).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

NUM_CLASSES = 19  # Cityscapes
SKY = 10
PERSON = 11


class _DSConv(nn.Module):
    ch: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            x.shape[-1], (3, 3), strides=self.stride,
            feature_group_count=x.shape[-1],
        )(x)
        x = nn.relu(x)
        x = nn.Conv(self.ch, (1, 1))(x)
        return nn.relu(x)


class FastSCNN(nn.Module):
    num_classes: int = NUM_CLASSES

    @nn.compact
    def __call__(self, img):  # (H, W) grayscale in [0,1]
        H, W = img.shape
        x = img[None, ..., None]
        # learning to downsample (/8)
        x = nn.relu(nn.Conv(32, (3, 3), strides=2)(x))
        x = _DSConv(48, 2)(x)
        x = _DSConv(64, 2)(x)
        skip = x
        # global feature extractor (/32) — bottleneck stack
        for ch, s in [(64, 2), (96, 2), (128, 1)]:
            x = _DSConv(ch, s)(x)
        # pyramid pooling lite: global average feature broadcast
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        x = x + nn.Conv(x.shape[-1], (1, 1))(g)
        # feature fusion
        x = jax.image.resize(x, skip.shape[:3] + (x.shape[-1],), "bilinear")
        x = nn.relu(nn.Conv(64, (1, 1))(x) + nn.Conv(64, (1, 1))(skip))
        # classifier
        x = _DSConv(64)(x)
        logits = nn.Conv(self.num_classes, (1, 1))(x)
        logits = jax.image.resize(
            logits, (1, H, W, self.num_classes), "bilinear"
        )
        return logits[0]


def init_fast_scnn(key, height: int, width: int):
    net = FastSCNN()
    params = net.init(key, jnp.zeros((height, width), jnp.float32))
    return net, params


def sample_classes(logits: jax.Array, uv: jax.Array) -> jax.Array:
    """Class id at keypoint locations (nearest pixel), ≙ the keypoint
    sampling in Frame::computeClassifications."""
    H, W = logits.shape[:2]
    x = jnp.clip(jnp.round(uv[:, 0]).astype(jnp.int32), 0, W - 1)
    y = jnp.clip(jnp.round(uv[:, 1]).astype(jnp.int32), 0, H - 1)
    return jnp.argmax(logits[y, x], axis=-1).astype(jnp.int32)


def keypoint_weights_from_classes(classes: jax.Array) -> jax.Array:
    """Sigma multipliers: sky/person keypoints are downweighted (≙ the
    reference downweighting classes 10/11)."""
    w = jnp.ones(classes.shape, jnp.float32)
    w = jnp.where(classes == SKY, 5.0, w)
    w = jnp.where(classes == PERSON, 3.0, w)
    return w


import os

DEFAULT_WEIGHTS = os.path.join(
    os.path.dirname(__file__), "..", "resources", "fast_scnn.npz"
)


def load_params(path: str = None):
    """Load trained FastSCNN parameters from the flat npz written by
    tools/train_segmentation.py; returns (params, meta) or (None, {}) when
    no artifact exists (callers fall back to the sky heuristic)."""
    import numpy as np

    path = path or DEFAULT_WEIGHTS
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


_NET = None  # (net, params, meta) | False after a miss


def trained_net():
    """Lazy-load the shipped classifier; None when absent."""
    global _NET
    if _NET is None:
        params, meta = load_params()
        _NET = False if params is None else (FastSCNN(), params, meta)
    return _NET or None


def keypoint_weights(img: jax.Array, uv: jax.Array,
                     engine: str = "auto") -> jax.Array:
    """Per-keypoint sigma multipliers (downweights sky/dynamic keypoints,
    ≙ Frame::computeClassifications + the matching/estimation
    downweighting).  Engine 'auto' uses the trained FastSCNN artifact when
    shipped, else the sky heuristic; 'net' demands the artifact; traceable
    under jit (the net parameters bake in as constants)."""
    net = trained_net() if engine in ("auto", "net") else None
    if engine == "net" and net is None:
        raise FileNotFoundError(
            "engine='net' requested but no trained segmentation artifact "
            "exists (run tools/train_segmentation.py)"
        )
    if net is not None:
        mod, params, _ = net
        logits = mod.apply(params, img)
        return keypoint_weights_from_classes(sample_classes(logits, uv))
    return sky_heuristic_weights(img, uv)


def sky_heuristic_weights(img: jax.Array, uv: jax.Array) -> jax.Array:
    """Training-free fallback: bright + low-gradient upper-image regions
    behave like sky; their keypoints get inflated sigmas."""
    H, W = img.shape
    gx = jnp.abs(jnp.diff(img, axis=1, prepend=img[:, :1]))
    gy = jnp.abs(jnp.diff(img, axis=0, prepend=img[:1]))
    grad = gx + gy
    x = jnp.clip(jnp.round(uv[:, 0]).astype(jnp.int32), 0, W - 1)
    y = jnp.clip(jnp.round(uv[:, 1]).astype(jnp.int32), 0, H - 1)
    bright = img[y, x] > 0.8
    flat = grad[y, x] < 0.02
    upper = uv[:, 1] < 0.4 * H
    sky = bright & flat & upper
    return jnp.where(sky, 5.0, 1.0)
