"""Binary bag-of-words vocabulary for place recognition, TPU-batched.

Replaces the reference's vendored DBoW2 stack (`/root/reference/
server_pose_graph/ThirdParty/DBoW/TemplatedVocabulary.h`, k=10 L=6 pretrained
vocabulary loaded from `brief_k10L6.bin`): here the vocabulary is *trained* on
descriptors from our own BRIEF pattern (hierarchical k-medoids under Hamming
distance), the quantization tree walk is a batched gather pipeline, BoW
vectors are dense `(W,)` arrays, and database queries score all keyframes at
once with one vectorized L1 pass — replacing the inverted-index scan
(`TemplatedDatabase.h:607-728`) with an embarrassingly parallel array op.

Scoring is DBoW2's normalized-L1: s(v, w) = 1 - 0.5 * |v/|v| - w/|w||_1.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["Vocabulary", "train_vocabulary", "quantize", "bow_vector",
           "score_database", "BowDatabase"]


class Vocabulary(NamedTuple):
    """Flattened hierarchical vocabulary.

    node_desc: (num_internal_levels, k^level... flattened per level) — we
    store per level l an array of shape (k^(l+1), 8): the candidate children
    descriptors for each node path; child index arithmetic replaces pointers.
    """

    level_desc: tuple  # tuple of (k^(l+1), 8) uint32 arrays, l = 0..L-1
    weights: jax.Array  # (W,) idf word weights
    k: int
    levels: int

    @property
    def num_words(self) -> int:
        return int(self.k ** self.levels)


def _hamming_np(a, b):
    """(N,8)x(M,8) uint32 -> (N,M) int popcount distances (numpy, train-time)."""
    x = a[:, None, :] ^ b[None, :, :]
    return np.unpackbits(x.view(np.uint8), axis=-1).sum(-1)


def _kmedoids_binary(desc: np.ndarray, k: int, rng, iters: int = 8) -> np.ndarray:
    """Binary k-means with bitwise-majority centroids (DBoW's scheme)."""
    n = desc.shape[0]
    if n <= k:
        out = np.zeros((k, 8), np.uint32)
        out[:n] = desc
        if n > 0:
            out[n:] = desc[rng.integers(0, n, k - n)]
        return out
    centers = desc[rng.choice(n, k, replace=False)]
    for _ in range(iters):
        d = _hamming_np(desc, centers)
        assign = d.argmin(1)
        bits = np.unpackbits(desc.view(np.uint8), axis=-1)  # (N, 256)
        new_centers = []
        for c in range(k):
            sel = bits[assign == c]
            if len(sel) == 0:
                new_centers.append(centers[c])
                continue
            maj = (sel.mean(0) >= 0.5).astype(np.uint8)
            new_centers.append(np.packbits(maj).view(np.uint32))
        centers = np.stack(new_centers)
    return centers.astype(np.uint32)


def train_vocabulary(descriptors: np.ndarray, k: int = 10, levels: int = 3,
                     seed: int = 0, weighting: str = "idf") -> Vocabulary:
    """Hierarchical binary k-means. descriptors: (N, 8) uint32."""
    rng = np.random.default_rng(seed)
    desc = np.asarray(descriptors, np.uint32)

    # level 0: k clusters of everything; level l: k clusters per leaf path
    groups = [desc]
    level_desc = []
    for l in range(levels):
        centers_l = np.zeros((k ** (l + 1), 8), np.uint32)
        next_groups = []
        for gi, g in enumerate(groups):
            centers = _kmedoids_binary(g, k, rng)
            centers_l[gi * k:(gi + 1) * k] = centers
            if l + 1 < levels:
                if len(g):
                    d = _hamming_np(g, centers)
                    assign = d.argmin(1)
                else:
                    assign = np.zeros(0, int)
                for c in range(k):
                    next_groups.append(g[assign == c] if len(g) else g)
        level_desc.append(jnp.asarray(centers_l))
        groups = next_groups

    # idf weights from training corpus
    w = np.ones(k ** levels, np.float32)
    if weighting == "idf" and len(desc):
        voc_tmp = Vocabulary(tuple(level_desc), jnp.asarray(w), k, levels)
        words = np.asarray(quantize(voc_tmp, jnp.asarray(desc)))
        counts = np.bincount(words, minlength=k ** levels).astype(np.float32)
        w = np.log(len(desc) / np.maximum(counts, 1.0)).astype(np.float32)
        w = np.maximum(w, 1e-3)
    return Vocabulary(tuple(level_desc), jnp.asarray(w), k, levels)


def quantize(voc: Vocabulary, descriptors: jax.Array) -> jax.Array:
    """(N, 8) uint32 -> (N,) int32 word ids. Batched tree descent."""
    n = descriptors.shape[0]
    node = jnp.zeros(n, jnp.int32)  # path index at current level
    for l in range(voc.levels):
        cand = voc.level_desc[l][node[:, None] * voc.k + jnp.arange(voc.k)[None, :]]
        x = jax.lax.population_count(descriptors[:, None, :] ^ cand)
        d = jnp.sum(x.astype(jnp.int32), axis=-1)  # (N, k)
        node = node * voc.k + jnp.argmin(d, axis=-1).astype(jnp.int32)
    return node


def bow_vector(voc: Vocabulary, descriptors: jax.Array,
               valid: jax.Array | None = None) -> jax.Array:
    """L1-normalized tf-idf BoW vector (W,) for one descriptor set."""
    words = quantize(voc, descriptors)
    ones = jnp.ones(descriptors.shape[0], jnp.float32)
    if valid is not None:
        ones = jnp.where(valid, ones, 0.0)
    v = jax.ops.segment_sum(ones, words, voc.num_words) * voc.weights
    return v / jnp.maximum(jnp.sum(jnp.abs(v)), 1e-12)


def score_database(query: jax.Array, db: jax.Array,
                   db_valid: jax.Array | None = None) -> jax.Array:
    """DBoW2 L1 score of `query` (W,) against all rows of `db` (N, W)."""
    s = 1.0 - 0.5 * jnp.sum(jnp.abs(query[None, :] - db), axis=-1)
    if db_valid is not None:
        s = jnp.where(db_valid, s, -1.0)
    return s


class BowDatabase:
    """Host-side fixed-capacity database of BoW vectors (the reference's
    `BriefDatabase` role: add + query-excluding-recent,
    `server_pose_graph.cpp:971-1062`)."""

    def __init__(self, voc: Vocabulary, capacity: int = 4096):
        self.voc = voc
        self.vectors = np.zeros((capacity, voc.num_words), np.float32)
        self.client = np.full(capacity, -1, np.int32)
        self.count = 0

    def add(self, vec: np.ndarray, client_id: int) -> int:
        idx = self.count
        self.vectors[idx] = vec
        self.client[idx] = client_id
        self.count += 1
        return idx

    def query(self, vec: np.ndarray, query_client: int,
              exclude_recent: int = 10, top_k: int = 4):
        """Scores against all stored frames; same-client frames within
        `exclude_recent` of the newest are masked (reference's max_id
        argument). Returns (indices, scores) of the top_k."""
        valid = np.arange(len(self.client)) < self.count
        same = self.client == query_client
        recent_cut = self.count - exclude_recent
        recent = np.arange(len(self.client)) >= max(recent_cut, 0)
        valid &= ~(same & recent)
        s = np.asarray(score_database(jnp.asarray(vec), jnp.asarray(self.vectors),
                                      jnp.asarray(valid)))
        order = np.argsort(-s)[:top_k]
        return order, s[order]
