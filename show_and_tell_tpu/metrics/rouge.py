"""ROUGE-L: LCS-based F-measure with beta = 1.2.

Exact-semantics port of the vendored ``pycocoevalcap/rouge/rouge.py``:
token-level longest-common-subsequence length per reference
(rouge.py:13-34), max precision / max recall over references — note the
reference takes the max of each *independently* (rouge.py:66-67), not the
best single reference's (P, R) pair — and F-beta with beta = 1.2
(rouge.py:43,68-74). The LCS DP here is O(len_r * len_c) numpy rows instead
of nested Python lists; identical results.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np


def lcs_length(a: List[str], b: List[str]) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = np.zeros(len(b) + 1, dtype=np.int32)
    for x in a:
        cur = prev.copy()
        for j, y in enumerate(b, start=1):
            cur[j] = prev[j - 1] + 1 if x == y else max(prev[j], cur[j - 1])
        prev = cur
    return int(prev[-1])


class Rouge:
    def __init__(self):
        self.beta = 1.2

    def calc_score(self, candidate: List[str], refs: List[str]) -> float:
        assert len(candidate) == 1
        assert len(refs) > 0
        token_c = candidate[0].split(" ")
        prec, rec = [], []
        for reference in refs:
            token_r = reference.split(" ")
            lcs = lcs_length(token_r, token_c)
            prec.append(lcs / float(len(token_c)))
            rec.append(lcs / float(len(token_r)))
        prec_max, rec_max = max(prec), max(rec)
        if prec_max != 0 and rec_max != 0:
            return ((1 + self.beta ** 2) * prec_max * rec_max) / float(
                rec_max + self.beta ** 2 * prec_max
            )
        return 0.0

    def compute_score(self, gts: Dict, res: Dict):
        assert sorted(gts.keys()) == sorted(res.keys())
        scores = [self.calc_score(res[i], gts[i]) for i in sorted(gts.keys())]
        return float(np.mean(scores)), np.array(scores)

    def method(self):
        return "Rouge"
