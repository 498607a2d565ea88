"""Keyframe database: place-recognition queries over keyframe BoW vectors.

Replaces KeyFrameDatabase (reference: src/KeyFrameDatabase.cc — inverted file
mvInvertedFile[wordId], DetectNBestCandidates :669, DetectRelocalization-
Candidates :920). With dense ~1k-word BoW vectors the inverted file is
unnecessary: common-word counts and L1 scores are one masked matmul over the
(n_kf, n_words) matrix — the covisibility-group accumulation logic is kept
verbatim.
"""

from __future__ import annotations

import numpy as np

from .vocabulary import Vocabulary, score_l1


class KeyFrameDatabase:
    def __init__(self, voc: Vocabulary, max_kf: int):
        self.voc = voc
        self.bow = np.zeros((max_kf, voc.n_words), np.float32)
        self.word_mask = np.zeros((max_kf, voc.n_words), bool)
        self.present = np.zeros(max_kf, bool)
        # per-feature word/node ids for BoW-guided matching
        self.kf_word: dict[int, np.ndarray] = {}
        self.kf_node: dict[int, np.ndarray] = {}

    def _ensure_capacity(self, kf: int):
        n = len(self.present)
        if kf < n:
            return
        while n <= kf:
            n *= 2
        self.bow = np.concatenate([self.bow, np.zeros((n - len(self.bow), self.bow.shape[1]), np.float32)])
        self.word_mask = np.concatenate([self.word_mask, np.zeros((n - len(self.word_mask), self.word_mask.shape[1]), bool)])
        self.present = np.concatenate([self.present, np.zeros(n - len(self.present), bool)])

    def add(self, kf: int, descs: np.ndarray, valid: np.ndarray):
        self._ensure_capacity(kf)
        # jitted on-device tree descent (TemplatedVocabulary::transform,
        # :136-163, as one XLA program — SURVEY §2.2)
        word, node = self.voc.transform_on_device(descs, valid)
        v = self.voc.bow_vector(word)
        self.bow[kf] = v
        self.word_mask[kf] = v > 0
        self.present[kf] = True
        self.kf_word[kf] = word
        self.kf_node[kf] = node
        return word, node

    def erase(self, kf: int):
        if kf >= len(self.present):
            return
        self.present[kf] = False
        self.bow[kf] = 0
        self.word_mask[kf] = False

    # ----------------------------------------------------------------- query
    def _common_words(self, v_mask: np.ndarray) -> np.ndarray:
        return (self.word_mask & v_mask[None, :]).sum(-1)

    def detect_candidates(
        self,
        query_bow: np.ndarray,
        exclude: set[int],
        map_state,
        n_best: int = 3,
        min_score_cut: float = 0.8,
        final_acc_cut: float | None = None,
    ) -> list[int]:
        """DetectNBestCandidates: common-word count -> 0.8*max cutoff ->
        accumulated covisibility-group score -> top-N group champions.
        final_acc_cut, when set, keeps every group above cut*bestAccScore
        (the DetectRelocalizationCandidates 0.75 rule,
        KeyFrameDatabase.cc:920)."""
        v_mask = query_bow > 0
        common = self._common_words(v_mask)
        common[~self.present] = 0
        for k in exclude:
            if 0 <= k < len(common):
                common[k] = 0
        if common.max() == 0:
            return []
        th = max(min_score_cut * common.max(), 1)
        cands = np.nonzero(common >= th)[0]
        scores = score_l1(self.bow[cands], query_bow[None, :])

        # accumulate over each candidate's 10 best covisible neighbors; the
        # group's champion is its best-scoring member (pBestScoreKF)
        acc = []
        for c, s in zip(cands, scores):
            group = [int(c)] + map_state.covisible_kfs(int(c), k=10, min_weight=5)
            g_scores = [
                (float(score_l1(self.bow[g], query_bow)), int(g))
                for g in group
                if self.present[g] and g not in exclude
            ]
            if not g_scores:
                continue
            best_s, best_kf = max(g_scores)
            acc.append((sum(gs for gs, _ in g_scores), best_s, best_kf))
        if not acc:
            return []
        acc.sort(key=lambda x: -x[0])
        if final_acc_cut is not None:
            best_acc = acc[0][0]
            acc = [a for a in acc if a[0] >= final_acc_cut * best_acc]
        out = []
        for _, _, kf in acc:
            if kf not in out:
                out.append(kf)
            if n_best is not None and len(out) >= n_best:
                break
        return out

    def detect_relocalization_candidates(
        self, query_bow: np.ndarray, map_state, n_best: int = 5
    ) -> list[int]:
        """DetectRelocalizationCandidates (:920): same shape, 0.75 final
        accumulated-score cut, no exclusion set."""
        return self.detect_candidates(
            query_bow, set(), map_state, n_best=n_best, min_score_cut=0.8,
            final_acc_cut=0.75,
        )
