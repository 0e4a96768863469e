"""Differential parity: our BLEU/CIDEr/ROUGE vs the *actual* reference
scorers.

The reference vendors Python-2-era scorers (pycocoevalcap). These tests load
that source from /root/reference at test time, apply mechanical py2->py3
syntax fixes in memory (xrange, iteritems, tuple-parameter unpacking), exec
it, and fuzz both implementations on random corpora — bit-level agreement is
the metric-parity gate (SURVEY.md §7 hard-part #3).

Skipped when the reference checkout isn't present.
"""

import os
import random
import re
import types

import numpy as np
import pytest

REF = "/root/reference/pycocoevalcap"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)


def _py3ify(src: str) -> str:
    src = src.replace("xrange", "range")
    src = src.replace(".iteritems()", ".items()")
    src = re.sub(r"\bprint (.+)$", r"print(\1)", src, flags=re.M)
    # py2 tuple parameter: def cook_test(test, (reflen, refmaxcounts), ...)
    src = src.replace(
        "def cook_test(test, (reflen, refmaxcounts), eff=None, n=4):",
        "def cook_test(test, reflen_refmaxcounts, eff=None, n=4):\n"
        "    (reflen, refmaxcounts) = reflen_refmaxcounts",
    )
    return src


def _load_ref_module(relpath: str, name: str):
    with open(os.path.join(REF, relpath)) as f:
        src = _py3ify(f.read())
    mod = types.ModuleType(name)
    mod.__dict__["__name__"] = name
    exec(compile(src, relpath, "exec"), mod.__dict__)
    return mod


def _corpus(seed, n_imgs=40, vocab=None):
    rng = random.Random(seed)
    vocab = vocab or ["a", "the", "man", "dog", "cat", "rides", "runs", "on",
                      "big", "red", "horse", "park", "sits", "green", "ball"]
    gts, res = {}, {}
    for i in range(n_imgs):
        gts[i] = [
            " ".join(rng.choices(vocab, k=rng.randint(3, 12)))
            for _ in range(rng.randint(1, 5))
        ]
        res[i] = [" ".join(rng.choices(vocab, k=rng.randint(1, 12)))]
    return gts, res


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_bleu_matches_reference(seed):
    ref = _load_ref_module("bleu/bleu_scorer.py", "ref_bleu_scorer")
    from show_and_tell_tpu.metrics.bleu import Bleu

    gts, res = _corpus(seed)
    scorer = ref.BleuScorer(n=4)
    for i in sorted(gts):
        scorer += (res[i][0], gts[i])
    ref_score, ref_per_img = scorer.compute_score(option="closest")
    our_score, our_per_img = Bleu(4).compute_score(gts, res)
    np.testing.assert_allclose(our_score, ref_score, rtol=1e-12)
    for k in range(4):
        np.testing.assert_allclose(our_per_img[k], ref_per_img[k], rtol=1e-12)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_cider_matches_reference(seed):
    ref = _load_ref_module("cider/cider_scorer.py", "ref_cider_scorer")
    from show_and_tell_tpu.metrics.cider import Cider

    gts, res = _corpus(seed)
    scorer = ref.CiderScorer(n=4, sigma=6.0)
    for i in sorted(gts):
        scorer += (res[i][0], gts[i])
    ref_mean, ref_scores = scorer.compute_score()
    our_mean, our_scores = Cider().compute_score(gts, res)
    np.testing.assert_allclose(our_mean, ref_mean, rtol=1e-10)
    np.testing.assert_allclose(our_scores, ref_scores, rtol=1e-10)


@pytest.mark.parametrize("seed", [0, 1])
def test_rouge_matches_reference(seed):
    ref = _load_ref_module("rouge/rouge.py", "ref_rouge")
    from show_and_tell_tpu.metrics.rouge import Rouge

    gts, res = _corpus(seed)
    ref_mean, ref_scores = ref.Rouge().compute_score(gts, res)
    our_mean, our_scores = Rouge().compute_score(gts, res)
    np.testing.assert_allclose(our_mean, ref_mean, rtol=1e-12)
    np.testing.assert_allclose(our_scores, ref_scores, rtol=1e-12)


def test_bleu_single_image_option_default():
    """Single-segment corpora auto-select 'average' reflen in the scorer
    (bleu_scorer.py:225-226) — verify against the reference on that path."""
    ref = _load_ref_module("bleu/bleu_scorer.py", "ref_bleu_scorer2")
    from show_and_tell_tpu.metrics.bleu import BleuScorer

    gts = ["a man on a horse", "a big red dog"]
    hyp = "a man with a dog"
    r = ref.BleuScorer(n=4)
    r += (hyp, gts)
    ref_score, _ = r.compute_score()
    ours = BleuScorer(4)
    ours.append(hyp, gts)
    our_score, _ = ours.compute_score()
    np.testing.assert_allclose(our_score, ref_score, rtol=1e-12)


def test_bleu_degenerate_cases_match_reference():
    """Empty hypotheses, single-word refs, repeated tokens — the epsilon
    paths (tiny/small) must agree bit-for-bit."""
    ref = _load_ref_module("bleu/bleu_scorer.py", "ref_bleu_scorer3")
    from show_and_tell_tpu.metrics.bleu import Bleu

    gts = {1: ["a"], 2: ["a b c d e"], 3: ["x x x", "x"]}
    res = {1: [""], 2: ["a"], 3: ["x x"]}
    scorer = ref.BleuScorer(n=4)
    for i in sorted(gts):
        scorer += (res[i][0], gts[i])
    ref_score, ref_per = scorer.compute_score(option="closest")
    our_score, our_per = Bleu(4).compute_score(gts, res)
    np.testing.assert_allclose(our_score, ref_score, rtol=1e-12)
    for k in range(4):
        np.testing.assert_allclose(our_per[k], ref_per[k], rtol=1e-12)


def test_cider_degenerate_cases_match_reference():
    ref = _load_ref_module("cider/cider_scorer.py", "ref_cider_scorer2")
    from show_and_tell_tpu.metrics.cider import Cider

    gts = {1: ["a"], 2: ["b b b"], 3: ["c d", "c d e"]}
    res = {1: ["a"], 2: [""], 3: ["c d"]}
    scorer = ref.CiderScorer(n=4, sigma=6.0)
    for i in sorted(gts):
        scorer += (res[i][0], gts[i])
    ref_mean, ref_scores = scorer.compute_score()
    our_mean, our_scores = Cider().compute_score(gts, res)
    np.testing.assert_allclose(our_mean, ref_mean, rtol=1e-10)
    np.testing.assert_allclose(our_scores, ref_scores, rtol=1e-10)
