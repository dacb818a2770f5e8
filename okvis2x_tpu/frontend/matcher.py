"""Descriptor matching as MXU matmuls.

Replaces the reference's multithreaded Hamming matching loops
(okvis_frontend/src/Frontend.cpp:1745 `matchToMapByThread`: strided keypoint
loops with per-pair popcount) with the TPU-native formulation:

    descriptors as ±1 vectors  =>  hamming(a, b) = (BITS - a·b) / 2

so an (N, 384) x (384, M) bfloat16 matmul computes every pairwise Hamming
distance at once on the MXU — the 60-threshold, best-match and ratio logic
become argmin/top-k over the distance matrix.  Invalid descriptors are 0
rows/cols whose "distance" maps to BITS/2 (384/2 = 192), far above any
acceptance threshold (reference threshold: 60 bits).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from okvis2x_tpu.frontend.descriptor import DESC_BITS


class Matches(NamedTuple):
    idx_b: jax.Array  # (N,) best match in B for each A (int32)
    dist: jax.Array  # (N,) hamming distance of best match
    valid: jax.Array  # (N,) bool — passed threshold (+ optional checks)


def hamming_matrix(pm1_a: jax.Array, pm1_b: jax.Array) -> jax.Array:
    """(N, M) pairwise Hamming distances from ±1 bf16 descriptor matrices."""
    dots = jax.lax.dot_general(
        pm1_a,
        pm1_b,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return 0.5 * (DESC_BITS - dots)


def match(
    pm1_a: jax.Array,
    pm1_b: jax.Array,
    max_dist: float = 60.0,
    ratio: float = 0.0,
    mutual: bool = False,
) -> Matches:
    """Best-match A->B with distance threshold, optional Lowe ratio and
    mutual-consistency checks (reference uses absolute threshold 60/384
    bits, okvis2.yaml `matching_threshold`)."""
    D = hamming_matrix(pm1_a, pm1_b)
    neg = -D
    best2, idx2 = jax.lax.top_k(neg, 2)  # (N, 2): two smallest distances
    d1 = -best2[:, 0]
    d2 = -best2[:, 1]
    idx = idx2[:, 0]
    ok = d1 <= max_dist
    if ratio > 0:
        ok = ok & (d1 <= ratio * d2)
    if mutual:
        back = jnp.argmin(D, axis=0)  # (M,) best A for each B
        ok = ok & (back[idx] == jnp.arange(D.shape[0]))
    return Matches(idx_b=idx.astype(jnp.int32), dist=d1, valid=ok)


def match_masked(
    pm1_a: jax.Array,
    pm1_b: jax.Array,
    allowed: jax.Array,  # (N, M) bool — e.g. epipolar/projection gating
    max_dist: float = 60.0,
) -> Matches:
    """Best match restricted to an `allowed` candidate mask (the reference
    gates map-landmark matching by projected position / image distance;
    matchToMap builds per-keypoint candidate sets the same way)."""
    D = hamming_matrix(pm1_a, pm1_b)
    D = jnp.where(allowed, D, jnp.float32(DESC_BITS))
    idx = jnp.argmin(D, axis=1)
    d1 = jnp.take_along_axis(D, idx[:, None], axis=1)[:, 0]
    return Matches(idx_b=idx.astype(jnp.int32), dist=d1, valid=d1 <= max_dist)
