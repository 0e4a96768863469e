"""Behavioral discrimination battery for the metric suite.

BLEU/CIDEr/ROUGE are pinned bit-exact against the reference scorers
(tests/test_reference_parity.py), but METEOR and SPICE have no runnable
reference in this image — their guarantees are formula goldens plus the
parser golden set. This battery adds the end-to-end property those can't
express: on realistic caption corpora, every scorer must rank a correct
candidate ABOVE systematically corrupted versions of itself (wrong
object, truncation, word-order shuffling, degenerate repetition).
A regression that, e.g., stops the SPICE parser emitting relation tuples
or breaks METEOR's fragmentation penalty shows up here as a lost ranking
even if per-module unit tests still pass.
"""

import pytest

from show_and_tell_tpu.metrics.bleu import Bleu
from show_and_tell_tpu.metrics.cider import Cider
from show_and_tell_tpu.metrics.meteor import Meteor
from show_and_tell_tpu.metrics.rouge import Rouge
from show_and_tell_tpu.metrics.spice import Spice

# image id -> reference captions (post-tokenizer form: lowercase, no
# punctuation) — small but realistic COCO-shaped corpus
REFS = {
    0: ["a man riding a horse on a beach",
        "a person rides a brown horse near the ocean"],
    1: ["a woman wearing a red dress and a hat",
        "a woman in a red dress holding a hat"],
    2: ["a plate of food on a wooden table",
        "a plate full of food sitting on a table"],
    3: ["two dogs playing with a ball in the grass",
        "dogs chasing a ball on a green lawn"],
    4: ["a group of people standing around a table",
        "several people gathered at a table"],
    5: ["a cat sleeping on a couch near a window",
        "a cat curled up on the sofa by a window"],
}

GOOD = {
    0: "a man riding a horse on a beach",
    1: "a woman wearing a red dress and a hat",
    2: "a plate of food on a wooden table",
    3: "two dogs playing with a ball in the grass",
    4: "a group of people standing around a table",
    5: "a cat sleeping on a couch near a window",
}

# the main object swapped for an unrelated one
WRONG_OBJECT = {
    0: "a man riding a bicycle on a beach",
    1: "a woman wearing a red scarf and a helmet",
    2: "a plate of shoes on a wooden table",
    3: "two cars playing with a ball in the grass",
    4: "a group of chairs standing around a table",
    5: "a dog sleeping on a couch near a door",
}

# first three words only
TRUNCATED = {i: " ".join(c.split()[:3]) for i, c in GOOD.items()}

# deterministic order shuffle (reversed — guaranteed different order,
# same bag of words)
SHUFFLED = {i: " ".join(reversed(c.split())) for i, c in GOOD.items()}

# degenerate high-frequency repetition
DEGENERATE = {i: "a a a a a a a a" for i in GOOD}


def _score(scorer_cls, res, *args):
    gts = {i: list(rs) for i, rs in REFS.items()}
    cand = {i: [res[i]] for i in res}
    score, _ = scorer_cls(*args).compute_score(gts, cand)
    return score


@pytest.mark.parametrize("corruption", ["wrong_object", "truncated",
                                        "shuffled", "degenerate"])
def test_ngram_metrics_rank_good_above_corrupted(corruption):
    bad = {"wrong_object": WRONG_OBJECT, "truncated": TRUNCATED,
           "shuffled": SHUFFLED, "degenerate": DEGENERATE}[corruption]
    good_bleu = _score(Bleu, GOOD, 4)[3]
    bad_bleu = _score(Bleu, bad, 4)[3]
    assert good_bleu > bad_bleu, (corruption, good_bleu, bad_bleu)
    for cls in (Cider, Rouge, Meteor):
        g, b = _score(cls, GOOD), _score(cls, bad)
        assert g > b, (cls.__name__, corruption, g, b)


@pytest.mark.parametrize("corruption", ["wrong_object", "truncated",
                                        "degenerate"])
def test_spice_ranks_good_above_corrupted(corruption):
    # SPICE scores scene-graph overlap, so word-order shuffling is
    # (correctly) not guaranteed to hurt it — the other corruptions are
    bad = {"wrong_object": WRONG_OBJECT, "truncated": TRUNCATED,
           "degenerate": DEGENERATE}[corruption]
    g, b = _score(Spice, GOOD), _score(Spice, bad)
    assert g > b, (corruption, g, b)


def test_good_candidates_score_high_absolute():
    # identical-to-one-reference candidates must score near the ceiling
    assert _score(Bleu, GOOD, 4)[3] > 0.95
    assert _score(Rouge, GOOD) > 0.95
    assert _score(Meteor, GOOD) > 0.9
    # SPICE recall is against the UNION of all refs' tuples, so a
    # candidate identical to ONE reference still misses the other
    # reference's extra tuples — ~0.79 here is the correct ceiling for
    # this corpus, not a parser deficiency
    assert _score(Spice, GOOD) > 0.75
    assert _score(Cider, GOOD) > 3.0  # tf-idf scaled, x10


def test_degenerate_scores_near_zero():
    assert _score(Bleu, DEGENERATE, 4)[3] < 0.05
    assert _score(Spice, DEGENERATE) < 0.15
    assert _score(Meteor, DEGENERATE) < 0.25
