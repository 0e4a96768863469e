"""METEOR scorer — native, JVM-free.

The reference drives ``meteor-1.5.jar`` over a stdio line protocol
(pycocoevalcap/meteor/meteor.py:18-56) — and the jar is not shipped
(meteor.py:12 references it; SURVEY.md §2.2), so the metric never actually
ran there. This module is a from-scratch METEOR implementation following the
METEOR 1.5 English task definition (Denkowski & Lavie 2014):

- matcher modules with METEOR 1.5's module weights, NOT renormalized:
  exact (w=1.0), Porter-stem (w=0.6), synonym (w=0.8, share-a-group over the
  compact embedded table in metrics/synonyms.py — WordNet itself is not
  available in this zero-egress image). The paraphrase module (w=0.6) is
  omitted: its matches simply never fire, exactly as if the module were
  disabled in the jar,
- METEOR 1.3/1.5 alignment resolution (Denkowski & Lavie 2011 §2.1): all
  modules propose matches over the full sentence pair simultaneously (a word
  pair's weight is that of the first supporting module in module order);
  the final one-to-one alignment is resolved by beam search (METEOR's beam
  width, 40) to lexicographically (1) maximize covered words, (2) minimize
  chunks, (3) minimize the sum of |i-j| match distances — (4) total match
  weight breaks remaining ties deterministically,
- content/function word distinction with delta = 0.75 (function words from a
  compact English closed-class list),
- weighted precision/recall over hypothesis/reference word counts,
  Fmean = P*R / (alpha*P + (1-alpha)*R), alpha = 0.85,
- fragmentation penalty gamma * (chunks / matches)^beta with the METEOR 1.5
  English parameters gamma = 0.45, beta = 2.15, applied UNCONDITIONALLY
  whenever matches > 0 (real METEOR does not zero it for single-chunk
  alignments; a perfect match therefore scores slightly below 1),
- multiple references: score each, keep the max (METEOR's multi-ref rule).

API contract identical to the reference wrapper:
``compute_score(gts, res) -> (mean, [per-image])``; thread-safe by being
stateless (the reference needs a lock around its subprocess's stdio,
meteor.py:26,34 — no shared process here, so no lock).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

from show_and_tell_tpu.metrics import synonyms as _synonyms

ALPHA = 0.85
BETA = 2.15
GAMMA = 0.45
DELTA = 0.75
W_EXACT = 1.0
W_STEM = 0.6
W_SYN = 0.8

_EMPTY: frozenset = frozenset()

# Compact English closed-class (function) word list for the delta weighting.
FUNCTION_WORDS = frozenset(
    """a an the this that these those some any each every no all both half
    i you he she it we they me him her us them my your his its our their
    mine yours hers ours theirs myself yourself himself herself itself
    ourselves themselves who whom whose which what
    and or but nor so yet for if while although though because since unless
    until when where as than whether
    in on at by with from to of off over under above below between among
    through during before after about against into onto upon out up down
    is am are was were be been being do does did have has had will would
    shall should may might can could must
    not n't 's 'm 're 've 'll 'd
    there here now then also just only very too quite rather
    """.split()
)


# ---------------------------------------------------------------------------
# Porter stemmer (classic algorithm, self-contained)
# ---------------------------------------------------------------------------

_VOWELS = "aeiou"


def _is_cons(word: str, i: int) -> bool:
    ch = word[i]
    if ch in _VOWELS:
        return False
    if ch == "y":
        return i == 0 or not _is_cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """Number of VC sequences."""
    form = "".join("c" if _is_cons(stem, i) else "v" for i in range(len(stem)))
    m = 0
    prev = None
    for ch in form:
        if prev == "v" and ch == "c":
            m += 1
        prev = ch
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _is_cons(word, len(word) - 1)
    )


def _cvc(word: str) -> bool:
    if len(word) < 3:
        return False
    if not (
        _is_cons(word, len(word) - 3)
        and not _is_cons(word, len(word) - 2)
        and _is_cons(word, len(word) - 1)
    ):
        return False
    return word[-1] not in "wxy"


def porter_stem(word: str) -> str:
    if len(word) <= 2:
        return word
    w = word

    # Step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # Step 1b
    flag = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed") and _has_vowel(w[:-2]):
        w = w[:-2]
        flag = True
    elif w.endswith("ing") and _has_vowel(w[:-3]):
        w = w[:-3]
        flag = True
    if flag:
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif _ends_double_cons(w) and not w.endswith(("l", "s", "z")):
            w = w[:-1]
        elif _measure(w) == 1 and _cvc(w):
            w += "e"

    # Step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # Step 2
    step2 = [
        ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
        ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
        ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
        ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
        ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
    ]
    for suf, rep in step2:
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break

    # Step 3
    step3 = [
        ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
        ("ical", "ic"), ("ful", ""), ("ness", ""),
    ]
    for suf, rep in step3:
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break

    # Step 4
    step4 = [
        "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
        "ment", "ent", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
    ]
    for suf in step4:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if suf == "ion":
                pass
            if _measure(stem) > 1:
                w = stem
            break
    else:
        if w.endswith("ion") and len(w) > 3 and w[-4] in "st" and _measure(w[:-3]) > 1:
            w = w[:-3]

    # Step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _cvc(stem)):
            w = stem
    # Step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]
    return w


# ---------------------------------------------------------------------------
# Alignment + score
# ---------------------------------------------------------------------------

# built after porter_stem exists (build_index stems each table word)
_SYN_INDEX = _synonyms.build_index()


def _syn_groups(word: str, stem: str) -> frozenset:
    """Group ids for a word: surface form unioned with its Porter stem —
    the morphological fallback documented in synonyms.build_index."""
    a = _SYN_INDEX.get(word, _EMPTY)
    b = _SYN_INDEX.get(stem, _EMPTY)
    return a | b if b else a


_BEAM = 40  # METEOR 1.5 Aligner beam width
_MAX_REF_RESOLVE = 128  # C++ path's bitmask width; greedy fallback beyond


def _candidate_matches(hyp: List[str], ref: List[str]) -> List[List[Tuple[int, float]]]:
    """All (ref_j, weight) candidates per hyp position — every module runs
    over the whole pair; a pair's weight is the first supporting module's
    (module order exact, stem, synonym)."""
    hyp_stems = [porter_stem(w) for w in hyp]
    ref_stems = [porter_stem(w) for w in ref]
    hyp_syn = [_syn_groups(w, s) for w, s in zip(hyp, hyp_stems)]
    ref_syn = [_syn_groups(w, s) for w, s in zip(ref, ref_stems)]
    cand: List[List[Tuple[int, float]]] = []
    for i in range(len(hyp)):
        row: List[Tuple[int, float]] = []
        for j in range(len(ref)):
            if hyp[i] == ref[j]:
                row.append((j, W_EXACT))
            elif hyp_stems[i] == ref_stems[j]:
                row.append((j, W_STEM))
            elif hyp_syn[i] and not hyp_syn[i].isdisjoint(ref_syn[j]):
                row.append((j, W_SYN))
        cand.append(row)
    return cand


def _align(hyp: List[str], ref: List[str]) -> List[Tuple[int, int, float]]:
    """One-to-one (hyp_i, ref_j, weight) alignment per METEOR 1.3/1.5
    resolution: over the pooled candidate matches, beam search (width 40)
    for the alignment that lexicographically maximizes matched words, then
    minimizes chunks, then minimizes summed |i-j| distance (total match
    weight as a deterministic final tie-break).

    Chunk counting is incremental: processing hyp positions left to right, a
    match (i, j) extends the current chunk iff position i-1 was matched to
    j-1. The C++ scorer (csrc/meteor.cpp) mirrors this procedure exactly —
    generation order, dedup rule, stable sorts — and is tested bit-equal."""
    if len(ref) > _MAX_REF_RESOLVE:
        return _align_greedy(hyp, ref)
    cand = _candidate_matches(hyp, ref)
    # state: (matches, chunks, dist, wsum, mask, prev_j, match_tuple);
    # prev_j = ref index matched at the immediately previous hyp position
    # (-1 if it was unmatched). (mask, prev_j) fully determines the future,
    # so only the best partial objective per key survives (exact dominance);
    # the beam truncation afterwards is METEOR's own approximation.
    states = [(0, 0, 0, 0.0, 0, -1, ())]
    for i in range(len(hyp)):
        raw = []
        for m, c, d, ws, mask, prev_j, ml in states:
            raw.append((m, c, d, ws, mask, -1, ml))  # hyp[i] unmatched
            for j, w in cand[i]:
                if (mask >> j) & 1:
                    continue
                # contiguous iff the previous hyp position was matched
                # (prev_j >= 0) to exactly j-1; the >= 0 guard keeps the
                # unmatched sentinel (-1) from colliding with j=0's j-1
                nc = c if (prev_j >= 0 and prev_j == j - 1) else c + 1
                raw.append(
                    (m + 1, nc, d + abs(i - j), ws + w, mask | (1 << j), j,
                     ml + ((i, j, w),))
                )
        # best per (mask, prev_j): stable-sort by key then objective, keep first
        raw.sort(key=lambda s: (s[4], s[5], -s[0], s[1], s[2], -s[3]))
        dedup = []
        last_key = None
        for s in raw:
            key = (s[4], s[5])
            if key != last_key:
                dedup.append(s)
                last_key = key
        dedup.sort(key=lambda s: (-s[0], s[1], s[2], -s[3], s[4], s[5]))
        states = dedup[:_BEAM]
    return list(states[0][6])


def _align_greedy(hyp: List[str], ref: List[str]) -> List[Tuple[int, int, float]]:
    """Leftmost-greedy staged fallback (used only beyond the resolver's
    128-word reference bound — never on caption-scale text)."""
    matches: List[Tuple[int, int, float]] = []
    used_h = [False] * len(hyp)
    used_r = [False] * len(ref)
    cand = _candidate_matches(hyp, ref)
    for stage_weight in (W_EXACT, W_STEM, W_SYN):
        for i in range(len(hyp)):
            if used_h[i]:
                continue
            for j, w in cand[i]:
                if not used_r[j] and w == stage_weight:
                    matches.append((i, j, w))
                    used_h[i] = True
                    used_r[j] = True
                    break
    return matches


def _count_chunks(matches: List[Tuple[int, int, float]]) -> int:
    if not matches:
        return 0
    ms = sorted(matches)
    chunks = 1
    for (i1, j1, _), (i2, j2, _) in zip(ms, ms[1:]):
        if not (i2 == i1 + 1 and j2 == j1 + 1):
            chunks += 1
    return chunks


def _word_weight(w: str) -> float:
    return DELTA if w not in FUNCTION_WORDS else 1.0 - DELTA


def meteor_sentence(hypothesis: str, references: Sequence[str]) -> float:
    hyp = hypothesis.split()
    if not hyp:
        return 0.0
    best = 0.0
    for reference in references:
        ref = reference.split()
        if not ref:
            continue
        matches = _align(hyp, ref)
        if not matches:
            continue
        w_hyp_total = sum(_word_weight(w) for w in hyp)
        w_ref_total = sum(_word_weight(w) for w in ref)
        m_hyp = sum(mw * _word_weight(hyp[i]) for i, _, mw in matches)
        m_ref = sum(mw * _word_weight(ref[j]) for _, j, mw in matches)
        if w_hyp_total == 0 or w_ref_total == 0:
            continue
        P = m_hyp / w_hyp_total
        R = m_ref / w_ref_total
        if P + R == 0:
            continue
        fmean = P * R / (ALPHA * P + (1 - ALPHA) * R)
        chunks = _count_chunks(matches)
        # METEOR 1.5 applies the fragmentation penalty unconditionally for
        # matches > 0 — no single-chunk or full-coverage special case.
        frag = chunks / float(len(matches))
        penalty = GAMMA * (frag ** BETA)
        score = (1.0 - penalty) * fmean
        best = max(best, score)
    return best


class Meteor:
    def compute_score(self, gts: Dict, res: Dict):
        assert sorted(gts.keys()) == sorted(res.keys())
        sentence_fn = _cpp_meteor_sentence if _cpp_available() else meteor_sentence
        scores = []
        for img_id in sorted(gts.keys()):
            assert len(res[img_id]) == 1
            scores.append(sentence_fn(res[img_id][0], gts[img_id]))
        return float(np.mean(scores)), scores

    def method(self):
        return "METEOR"


# --- C++ fast path (csrc/meteor.cpp via ctypes) -----------------------------

_CPP_LIB = None
_CPP_CHECKED = False


def _cpp_available() -> bool:
    # Negative results are NOT latched (csrc may be built after first probe).
    global _CPP_LIB, _CPP_CHECKED
    if _CPP_CHECKED:
        return _CPP_LIB is not None
    try:
        import ctypes
        import os

        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
            "csrc",
            "libmeteor.so",
        )
        if not os.path.exists(path):
            return False
        lib = ctypes.CDLL(path)
        lib.meteor_score.restype = ctypes.c_double
        lib.meteor_score.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
        lib.meteor_stem.restype = ctypes.c_void_p
        lib.meteor_stem.argtypes = [ctypes.c_char_p]
        lib.meteor_free.argtypes = [ctypes.c_void_p]
        lib.meteor_set_synonyms.argtypes = [ctypes.c_char_p]
        # share the one synonym table with the Python implementation
        lib.meteor_set_synonyms(_synonyms.serialize())
        _CPP_LIB = lib
        _CPP_CHECKED = True
        return True
    except Exception:
        _CPP_LIB = None
        return False


def _cpp_meteor_sentence(hypothesis: str, references: Sequence[str]) -> float:
    joined = "\x01".join(references)
    return float(
        _CPP_LIB.meteor_score(hypothesis.encode("utf-8", "ignore"), joined.encode("utf-8", "ignore"))
    )


def _cpp_stem(word: str) -> str:
    import ctypes

    ptr = _CPP_LIB.meteor_stem(word.encode())
    try:
        return ctypes.cast(ptr, ctypes.c_char_p).value.decode()
    finally:
        _CPP_LIB.meteor_free(ptr)
