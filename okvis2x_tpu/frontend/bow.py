"""Bag-of-binary-words place recognition.

Replaces DBoW2 (reference: okvis_frontend/src/FBrisk.cpp + `Frontend::DBoW`
wrapper, Frontend.cpp:91-115, query filtering at :605) with a TPU-native
formulation:

  * vocabulary = k binary centroids; word assignment of a frame's
    descriptors is one ±1 bfloat16 matmul + argmin on the MXU (the k-ary
    tree descent of DBoW2 exists only to make CPUs fast — a flat matmul is
    faster on TPU for k ≤ a few thousand);
  * vocabulary training = binary k-means (majority vote centroids) on
    descriptors collected online or offline — no pretrained blob needed;
  * scoring = tf-idf weighted L1/cosine on sparse BoW vectors via a host
    inverted index (tiny, latency-insensitive), exactly DBoW2's scoring
    model.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from okvis2x_tpu.frontend.descriptor import DESC_BITS


def train_vocabulary(
    pm1: jax.Array,  # (N, 384) ±1 descriptors
    k: int = 256,
    iters: int = 8,
    seed: int = 0,
) -> jax.Array:
    """Binary k-means: returns (k, 384) ±1 bf16 centroids.

    Distance = Hamming via matmul; update = majority vote (sign of mean).
    """
    n = pm1.shape[0]
    key = jax.random.PRNGKey(seed)
    idx = jax.random.permutation(key, n)[:k]
    centers = pm1[idx].astype(jnp.float32)

    x = pm1.astype(jnp.float32)

    def step(centers, _):
        dots = x @ centers.T  # (N, k); hamming = (BITS - dots)/2
        assign = jnp.argmax(dots, axis=1)
        onehot = jax.nn.one_hot(assign, k, dtype=jnp.float32)  # (N, k)
        sums = onehot.T @ x  # (k, 384)
        counts = onehot.sum(axis=0)[:, None]
        new = jnp.where(counts > 0, jnp.sign(sums + 1e-6), centers)
        return new, None

    centers, _ = jax.lax.scan(step, centers, None, length=iters)
    return centers.astype(jnp.bfloat16)


def assign_words(pm1: jax.Array, vocab: jax.Array) -> jax.Array:
    """(N,) word ids by max correlation (= min Hamming)."""
    dots = jax.lax.dot_general(
        pm1, vocab,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return jnp.argmax(dots, axis=1).astype(jnp.int32)


class BowDatabase:
    """Host inverted index with tf-idf scoring (≙ DBoW2 Database::query)."""

    def __init__(self, k: int):
        self.k = k
        self.inv: List[Dict[int, float]] = [dict() for _ in range(k)]
        self.frame_tf: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}
        self.n_frames = 0
        self.word_df = np.zeros(k, np.int64)  # document frequency

    def _bow_vector(self, words: np.ndarray, valid: np.ndarray):
        w = words[valid]
        ids, counts = np.unique(w, return_counts=True)
        tf = counts / max(len(w), 1)
        return ids, tf

    def _idf(self) -> np.ndarray:
        return np.log(max(self.n_frames, 2) / np.maximum(self.word_df, 1))

    def add(self, frame_id: int, words: np.ndarray, valid: np.ndarray):
        ids, tf = self._bow_vector(words, valid)
        for wid, v in zip(ids, tf):
            self.inv[wid][frame_id] = float(v)
            self.word_df[wid] += 1
        self.frame_tf[frame_id] = (ids, tf)
        self.n_frames += 1

    def query(
        self,
        words: np.ndarray,
        valid: np.ndarray,
        exclude: set = frozenset(),
        top: int = 5,
    ) -> List[Tuple[int, float]]:
        """Returns [(frame_id, score)] best-first — cosine similarity of
        tf-idf vectors under the *current* idf (identical frames score 1.0,
        matching DBoW2's normalised scoring)."""
        if self.n_frames == 0:
            return []
        ids, tf = self._bow_vector(words, valid)
        idf = self._idf()
        q_idf = idf[ids]
        scores: Dict[int, float] = {}
        for wid, v, w_idf in zip(ids, tf, q_idf):
            for fid, u in self.inv[wid].items():
                if fid in exclude:
                    continue
                scores[fid] = scores.get(fid, 0.0) + v * u * w_idf * w_idf
        qn = float(np.linalg.norm(tf * q_idf)) + 1e-12
        out = []
        for fid, s in scores.items():
            f_ids, f_tf = self.frame_tf[fid]
            dn = float(np.linalg.norm(f_tf * idf[f_ids])) + 1e-12
            out.append((fid, s / (qn * dn)))
        out.sort(key=lambda x: -x[1])
        return out[:top]
