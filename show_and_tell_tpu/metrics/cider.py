"""CIDEr (Consensus-based Image Description Evaluation), exact-semantics port.

Reproduces the vendored ``pycocoevalcap/cider`` scorer precisely, including
its quirks — the parity gate depends on them:

- document frequency counted per *reference set* (one increment per image
  whose refs contain the n-gram; cider_scorer.py:93-103),
- ``ref_len = log(#images)`` and tf-idf weight
  ``tf * (ref_len - log(max(1, df)))`` (cider_scorer.py:113-124),
- clipped similarity ``sum(min(h, r) * r)`` normalised by both norms
  (cider_scorer.py:149-154),
- the "length" used by the Gaussian penalty counts **bigrams**, not words
  (``if n == 1: length += term_freq`` with n = len(ngram)-1,
  cider_scorer.py:126-127 — a reference quirk reproduced as-is),
- Gaussian length penalty ``exp(-delta^2 / (2 * sigma^2))`` with sigma = 6
  (cider_scorer.py:158; cider.py:18-22),
- mean over the 4 n-gram orders, divided by #refs, times 10
  (cider_scorer.py:174-178).

API: ``Cider().compute_score(gts, res) -> (mean, per-image array)``.
"""

from __future__ import annotations

import math
from collections import defaultdict
from typing import Dict, List, Tuple

import numpy as np

from show_and_tell_tpu.metrics.bleu import ngram_counts


def _precook(s: str, n: int = 4) -> Dict[tuple, int]:
    return ngram_counts(s, n)[1]


class CiderScorer:
    def __init__(self, n: int = 4, sigma: float = 6.0):
        self.n = n
        self.sigma = sigma
        self.crefs: List[List[Dict[tuple, int]]] = []
        self.ctest: List[Dict[tuple, int]] = []

    def append(self, test: str, refs) -> None:
        self.crefs.append([_precook(r, self.n) for r in refs])
        self.ctest.append(_precook(test, self.n))

    def _doc_freq(self) -> Dict[tuple, float]:
        df: Dict[tuple, float] = defaultdict(float)
        for refs in self.crefs:
            for ngram in set(ng for ref in refs for ng in ref):
                df[ngram] += 1
        return df

    def compute_score(self) -> Tuple[float, np.ndarray]:
        document_frequency = self._doc_freq()
        if document_frequency:
            assert len(self.ctest) >= max(document_frequency.values())
        ref_len = np.log(float(len(self.crefs)))

        def counts2vec(cnts):
            vec = [defaultdict(float) for _ in range(self.n)]
            norm = [0.0] * self.n
            length = 0
            for ngram, tf in cnts.items():
                df = np.log(max(1.0, document_frequency[ngram]))
                k = len(ngram) - 1
                vec[k][ngram] = float(tf) * (ref_len - df)
                norm[k] += vec[k][ngram] ** 2
                if k == 1:
                    length += tf  # bigram count — faithful quirk, see docstring
            return vec, [np.sqrt(x) for x in norm], length

        def sim(vh, vr, nh, nr, lh, lr):
            delta = float(lh - lr)
            val = np.zeros(self.n)
            for k in range(self.n):
                for ngram in vh[k]:
                    val[k] += min(vh[k][ngram], vr[k][ngram]) * vr[k][ngram]
                if nh[k] != 0 and nr[k] != 0:
                    val[k] /= nh[k] * nr[k]
                assert not math.isnan(val[k])
                val[k] *= np.e ** (-(delta ** 2) / (2 * self.sigma ** 2))
            return val

        scores = []
        for test, refs in zip(self.ctest, self.crefs):
            vec, norm, length = counts2vec(test)
            score = np.zeros(self.n)
            for ref in refs:
                vec_r, norm_r, length_r = counts2vec(ref)
                score += sim(vec, vec_r, norm, norm_r, length, length_r)
            scores.append(float(np.mean(score) / len(refs) * 10.0))
        return float(np.mean(scores)), np.array(scores)


class Cider:
    """Reference-compatible facade (pycocoevalcap/cider/cider.py surface)."""

    def __init__(self, n: int = 4, sigma: float = 6.0):
        self._n = n
        self._sigma = sigma

    def compute_score(self, gts: Dict, res: Dict):
        assert sorted(gts.keys()) == sorted(res.keys())
        scorer = CiderScorer(n=self._n, sigma=self._sigma)
        for img_id in sorted(gts.keys()):
            hypo, refs = res[img_id], gts[img_id]
            assert isinstance(hypo, list) and len(hypo) == 1
            assert isinstance(refs, list) and len(refs) > 0
            scorer.append(hypo[0], refs)
        return scorer.compute_score()

    def method(self):
        return "CIDEr"
