"""Binary visual vocabulary: k-ary tree of 256-bit centroids.

TPU-native replacement for DBoW2::TemplatedVocabulary (reference:
Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h — k=10, L=5 tree built with
binary k-medians, transform() descends by min Hamming, :136-163). Here the
tree is dense arrays (one (nodes, k, 8) uint32 centroid table per level) and
`transform` descends ALL descriptors of a frame in parallel; the BoW vector
is a dense (n_words,) tf vector (vocabularies used here are ~1k-4k words, so
dense beats sparse bookkeeping on device AND on host).

Training is binary k-medians (majority-vote medians, Hamming assignment) on a
descriptor corpus — the same construction as DBoW2's create(); the reference
ships a pre-trained 1e5-word vocabulary file instead (stripped from this
fork), so we train our own (descriptors here are self-consistent with our
procedural rBRIEF pattern anyway).
"""

from __future__ import annotations

import numpy as np


def _popcount_rows(x: np.ndarray) -> np.ndarray:
    return np.unpackbits(x.view(np.uint8), axis=-1).sum(-1)


def _hamming_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(N,8) x (M,8) -> (N,M) int Hamming."""
    x = a[:, None, :] ^ b[None, :, :]
    return np.unpackbits(x.view(np.uint8), axis=-1).sum(-1)


def _majority(descs: np.ndarray) -> np.ndarray:
    """Bitwise majority vote (FORB::meanValue, DBoW2/FORB.cpp:40)."""
    bits = np.unpackbits(descs.view(np.uint8), axis=1)  # (N, 256)
    maj = (bits.sum(0) * 2 >= len(descs)).astype(np.uint8)
    return np.packbits(maj).view(np.uint32)


def _kmedians(descs: np.ndarray, k: int, rng, iters: int = 8):
    """Binary k-medians; returns (k, 8) centroids."""
    n = len(descs)
    if n <= k:
        out = np.zeros((k, 8), np.uint32)
        out[:n] = descs
        if n:
            out[n:] = descs[rng.integers(0, n, k - n)]
        return out
    cent = descs[rng.choice(n, k, replace=False)]
    for _ in range(iters):
        d = _hamming_np(descs, cent)
        assign = d.argmin(1)
        for j in range(k):
            sel = descs[assign == j]
            if len(sel):
                cent[j] = _majority(sel)
            else:
                cent[j] = descs[rng.integers(0, n)]
    return cent


class Vocabulary:
    """levels: list of (n_nodes_l, k, 8) uint32 arrays; words = k**L leaves."""

    def __init__(self, levels: list[np.ndarray], k: int):
        self.levels = levels
        self.k = k
        self.L = len(levels)
        self.n_words = k ** self.L

    # ------------------------------------------------------------- training
    @staticmethod
    def train(descs: np.ndarray, k: int = 10, L: int = 3, seed: int = 0) -> "Vocabulary":
        rng = np.random.default_rng(seed)
        levels = []
        # assignments of each descriptor to a node of the current level
        assign = np.zeros(len(descs), np.int64)
        n_nodes = 1
        for lvl in range(L):
            cents = np.zeros((n_nodes, k, 8), np.uint32)
            new_assign = np.zeros_like(assign)
            for node in range(n_nodes):
                sel = np.nonzero(assign == node)[0]
                sub = descs[sel] if len(sel) else descs[rng.integers(0, len(descs), k)]
                cents[node] = _kmedians(sub, k, rng)
                if len(sel):
                    d = _hamming_np(descs[sel], cents[node])
                    new_assign[sel] = node * k + d.argmin(1)
            levels.append(cents)
            assign = new_assign
            n_nodes *= k
        return Vocabulary(levels, k)

    @staticmethod
    def random(k: int = 10, L: int = 3, seed: int = 0, n_train: int = 20000) -> "Vocabulary":
        """Train on uniform random descriptors — a serviceable covering of
        Hamming space when no corpus is available."""
        rng = np.random.default_rng(seed)
        descs = rng.integers(0, 2**32, (n_train, 8), dtype=np.uint32)
        return Vocabulary.train(descs, k, L, seed)

    # ----------------------------------------------------------- persistence
    def save(self, path: str):
        np.savez_compressed(
            path, k=self.k, L=self.L,
            **{f"level_{i}": lv for i, lv in enumerate(self.levels)},
        )

    @staticmethod
    def load(path: str) -> "Vocabulary":
        z = np.load(path)
        L = int(z["L"])
        return Vocabulary([z[f"level_{i}"] for i in range(L)], int(z["k"]))

    # ------------------------------------------------------------ transform
    def transform(self, descs: np.ndarray, valid: np.ndarray):
        """Descend the tree for all descriptors at once.

        Returns (word_id (N,), node_id_l2 (N,) mid-level node for BoW-guided
        matching — the reference's levelsup=4 FeatureVector grouping,
        Frame.cc:995-1010)."""
        n = len(descs)
        node = np.zeros(n, np.int64)
        mid = np.zeros(n, np.int64)
        mid_level = max(self.L - 2, 0)
        for lvl in range(self.L):
            cents = self.levels[lvl][node]          # (N, k, 8)
            x = descs[:, None, :] ^ cents
            d = np.unpackbits(x.view(np.uint8), axis=-1).sum(-1)  # (N, k)
            node = node * self.k + d.argmin(1)
            if lvl == mid_level:
                mid = node.copy()
        word = np.where(valid, node, -1)
        mid = np.where(valid, mid, -1)
        return word, mid

    def bow_vector(self, word_id: np.ndarray) -> np.ndarray:
        """L1-normalized dense tf vector (n_words,) float32."""
        v = np.zeros(self.n_words, np.float32)
        w = word_id[word_id >= 0]
        np.add.at(v, w, 1.0)
        s = v.sum()
        return v / s if s > 0 else v


def score_l1(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """DBoW2 L1 score for L1-normalized vectors: s = sum_i min(a_i, b_i)
    (equivalent to 1 - 0.5|a-b|_1; ScoringObject.cpp L1Scoring). Broadcasts
    b over leading axes."""
    return np.minimum(a, b).sum(-1)


def score_l2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """DBoW2 L2 score: 1 - 0.5*|a/|a| - b/|b||_2 ~ dot for unit vectors
    (ScoringObject.cpp L2Scoring)."""
    an = a / np.maximum(np.linalg.norm(a, axis=-1, keepdims=True), 1e-12)
    bn = b / np.maximum(np.linalg.norm(b, axis=-1, keepdims=True), 1e-12)
    return (an * bn).sum(-1)


def score_bhattacharyya(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """DBoW2 Bhattacharyya coefficient: sum_i sqrt(a_i b_i)."""
    return np.sqrt(np.maximum(a * b, 0.0)).sum(-1)


def score_dot(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """DBoW2 dot-product scoring."""
    return (a * b).sum(-1)


SCORING = {
    "l1": score_l1,
    "l2": score_l2,
    "bhattacharyya": score_bhattacharyya,
    "dot": score_dot,
}
