"""Metric suite: hand-computed golden values + semantic invariants.

Golden values are derived analytically from the reference scorer formulas
(pycocoevalcap/{bleu,cider,rouge}), since the vendored Py2 scorers cannot
execute under Python 3."""

import math

import numpy as np
import pytest

from show_and_tell_tpu.metrics.bleu import Bleu
from show_and_tell_tpu.metrics.cider import Cider
from show_and_tell_tpu.metrics.meteor import Meteor, meteor_sentence, porter_stem
from show_and_tell_tpu.metrics.rouge import Rouge, lcs_length
from show_and_tell_tpu.metrics.spice import Spice, SpiceUnavailable, set_backend
from show_and_tell_tpu.metrics.tokenizer import PTBTokenizer, tokenize_caption


# --- BLEU -------------------------------------------------------------------


def test_bleu_identical():
    gts = {1: ["a man rides a horse"]}
    res = {1: ["a man rides a horse"]}
    score, per_img = Bleu(4).compute_score(gts, res)
    for s in score:
        assert s == pytest.approx(1.0, abs=1e-6)


def test_bleu_golden_short_hyp():
    # hyp "the cat sat" vs ref "the cat sat on the mat" (hand-derived from
    # bleu_scorer.py formulas: all precisions 1 up to n=3, 4-gram guess=0,
    # brevity penalty exp(1 - 1/(3/6)) = exp(-1)).
    gts = {1: ["the cat sat on the mat"]}
    res = {1: ["the cat sat"]}
    score, _ = Bleu(4).compute_score(gts, res)
    bp = math.exp(-1.0)
    assert score[0] == pytest.approx(bp, rel=1e-5)
    assert score[1] == pytest.approx(bp, rel=1e-5)
    assert score[2] == pytest.approx(bp, rel=1e-5)
    # 4-gram: (tiny/small) = 1e-6 -> fourth root = 10^{-1.5}
    assert score[3] == pytest.approx(bp * 10 ** -1.5, rel=1e-4)


def test_bleu_clipping():
    # "the the the" vs "the cat": correct_1 clipped to ref max count 1
    gts = {1: ["the cat"]}
    res = {1: ["the the the"]}
    score, _ = Bleu(4).compute_score(gts, res)
    assert score[0] == pytest.approx(1.0 / 3.0, rel=1e-5)


def test_bleu_closest_reflen():
    # two refs len 2 and 6; hyp len 3 -> closest reflen is 2 -> no brevity
    # penalty; unigram correct = {cat, sat} = 2 of 3
    gts = {1: ["a cat", "a cat sat on a mat"], 2: ["a dog", "b c"]}
    res = {1: ["the cat sat"], 2: ["a dog"]}
    score, per_img = Bleu(4).compute_score(gts, res)
    assert per_img[0][0] == pytest.approx(2.0 / 3.0, rel=1e-4)


def test_bleu_multi_image_corpus():
    gts = {1: ["a b c"], 2: ["d e f"]}
    res = {1: ["a b c"], 2: ["d e f"]}
    score, per_img = Bleu(4).compute_score(gts, res)
    assert score[0] == pytest.approx(1.0, abs=1e-6)
    assert len(per_img[0]) == 2


# --- CIDEr ------------------------------------------------------------------


def test_cider_identical_two_images():
    # Hand-derived: identical hyp/ref, distinct across images -> per n in
    # {1,2} similarity 1, n in {3,4} zero (no such ngrams) -> mean 0.5 * 10.
    gts = {1: ["a b"], 2: ["c d"]}
    res = {1: ["a b"], 2: ["c d"]}
    score, scores = Cider().compute_score(gts, res)
    assert score == pytest.approx(5.0, rel=1e-6)
    np.testing.assert_allclose(scores, [5.0, 5.0], rtol=1e-6)


def test_cider_idf_downweights_common_ngrams():
    # 'a b' appears in both images' refs -> df=2 -> idf = log2-log2 = 0
    # so a matching-but-common caption scores 0.
    gts = {1: ["a b"], 2: ["a b"]}
    res = {1: ["a b"], 2: ["a b"]}
    score, _ = Cider().compute_score(gts, res)
    assert score == pytest.approx(0.0, abs=1e-9)


def test_cider_length_penalty():
    # same content, hyp longer by filler -> gaussian penalty reduces score
    gts = {1: ["a b c d"], 2: ["x y z w"]}
    res_exact = {1: ["a b c d"], 2: ["x y z w"]}
    res_long = {1: ["a b c d e f g h"], 2: ["x y z w q r s t"]}
    s_exact, _ = Cider().compute_score(gts, res_exact)
    s_long, _ = Cider().compute_score(gts, res_long)
    assert s_long < s_exact


# --- ROUGE-L ----------------------------------------------------------------


def test_lcs():
    assert lcs_length("a b c d".split(), "a c d".split()) == 3
    assert lcs_length([], ["a"]) == 0
    assert lcs_length(["x"], ["y"]) == 0


def test_rouge_golden():
    # lcs=3, P=1, R=0.5, beta=1.2 -> F = 2.44*0.5 / (0.5 + 1.44) = 0.628866
    gts = {1: ["the cat sat on the mat"]}
    res = {1: ["the cat sat"]}
    score, _ = Rouge().compute_score(gts, res)
    assert score == pytest.approx((1 + 1.2 ** 2) * 0.5 / (0.5 + 1.2 ** 2), rel=1e-6)


def test_rouge_max_over_refs():
    gts = {1: ["a b c", "totally different words here"]}
    res = {1: ["a b c"]}
    score, _ = Rouge().compute_score(gts, res)
    assert score == pytest.approx(1.0)


# --- METEOR -----------------------------------------------------------------


def test_porter_stemmer():
    assert porter_stem("running") == "run"
    assert porter_stem("caresses") == "caress"
    assert porter_stem("ponies") == "poni"
    assert porter_stem("cats") == "cat"
    assert porter_stem("relational") == "relat"
    assert porter_stem("hopping") == "hop"


def test_meteor_identical():
    # METEOR 1.5 applies the fragmentation penalty unconditionally: a perfect
    # 5-word match is one chunk over 5 matches -> pen = 0.45*(1/5)^2.15,
    # score = 1 - pen (Fmean is exactly 1).
    expected = 1.0 - 0.45 * (1.0 / 5.0) ** 2.15
    assert meteor_sentence(
        "a man rides a horse", ["a man rides a horse"]
    ) == pytest.approx(expected, abs=1e-12)


def test_meteor_stem_stage():
    # 'running' matches 'run' only via the stem stage (weight 0.6)
    s = meteor_sentence("dog running", ["dog runs"])
    assert 0 < s < 1.0


def test_meteor_synonym_stage():
    # 'large' matches 'big' only via the synonym stage (weight 0.8):
    # strictly above the same sentence with an unmatched word, strictly
    # below an exact match.
    syn = meteor_sentence("a large dog", ["a big dog"])
    none = meteor_sentence("a purple dog", ["a big dog"])
    exact = meteor_sentence("a big dog", ["a big dog"])
    assert none < syn < exact


def test_meteor_hand_computed_golden():
    """Pins the full METEOR 1.5 formula (weights 1.0/0.6/0.8 unrenormalized,
    delta=0.75 content/function weighting, alpha=0.85, unconditional penalty
    gamma=0.45 beta=2.15) on a case exercising all three matcher modules.

    hyp = 'a large dog runs', ref = 'a big dog is running':
    exact a-a, dog-dog; stem runs-running; synonym large-big. 'a'/'is' are
    function words (weight .25), the rest content (.75)."""
    m_weighted = 1.0 * 0.25 + 1.0 * 0.75 + 0.6 * 0.75 + 0.8 * 0.75  # = 2.05
    P = m_weighted / (0.25 + 3 * 0.75)  # hyp: a + 3 content words
    R = m_weighted / (2 * 0.25 + 3 * 0.75)  # ref: a, is + 3 content words
    fmean = P * R / (0.85 * P + 0.15 * R)
    # alignment (0,0),(1,1),(2,2),(3,4): the j-jump splits -> 2 chunks / 4 matches
    pen = 0.45 * (2.0 / 4.0) ** 2.15
    expected = fmean * (1.0 - pen)
    got = meteor_sentence("a large dog runs", ["a big dog is running"])
    assert got == pytest.approx(expected, abs=1e-12)


def test_meteor_order_sensitivity():
    # scrambled hypothesis -> more chunks -> fragmentation penalty
    good = meteor_sentence("a man rides a horse", ["a man rides a horse"])
    scrambled = meteor_sentence("horse a rides man a", ["a man rides a horse"])
    assert scrambled < good


def test_meteor_resolver_minimizes_chunks():
    # METEOR 1.3/1.5 resolution: among max-coverage alignments, fewest
    # chunks wins. Greedy leftmost would align a->ref[1], b->ref[0]
    # (2 chunks); the resolver picks a->ref[1], b->ref[2] (1 chunk).
    from show_and_tell_tpu.metrics.meteor import _align

    assert _align("a b".split(), "b a b".split()) == [
        (0, 1, 1, 1, 1.0),
        (1, 1, 2, 1, 1.0),
    ]


def test_meteor_resolver_coverage_over_module_weight():
    # Resolution criteria ignore module weights: a single-chunk all-stem
    # alignment beats a two-chunk all-exact one at equal coverage
    # (Denkowski & Lavie 2011 s2.1 — weights only enter P/R afterwards).
    from show_and_tell_tpu.metrics.meteor import _align

    assert _align("cat cats".split(), "cats cat".split()) == [
        (0, 1, 0, 1, 0.6),
        (1, 1, 1, 1, 0.6),
    ]


def test_meteor_resolver_unmatched_sentinel_no_j0_collision():
    # Regression: the incremental chunk counter's "previous hyp position
    # unmatched" sentinel (-1) must not be treated as ref position j-1 for
    # a match at j=0 — that made the search prefer a->ref[0] (2 real
    # chunks, miscounted as 1) over the true 1-chunk resolution.
    from show_and_tell_tpu.metrics.meteor import _align

    al = _align("x a b".split(), "a z a b".split())
    assert [(i, j) for i, _, j, _, _ in al] == [(1, 2), (2, 3)]


def test_meteor_resolver_distance_tiebreak():
    # Equal coverage and chunks -> smaller summed |i-j| distance wins:
    # both "the"s could map to either ref "the"; identity mapping has
    # distance 0.
    from show_and_tell_tpu.metrics.meteor import _align

    al = _align("the dog the".split(), "the cat the".split())
    assert [(i, j) for i, _, j, _, _ in al] == [(0, 0), (2, 2)]


def test_meteor_paraphrase_stage():
    # phrase<->word: "next to" (2 tokens) ~ "beside" via the embedded table,
    # matched as one span pair with w=0.6 covering 2+1 words
    from show_and_tell_tpu.metrics.meteor import _align

    al = _align("a dog next to a cat".split(), "a dog beside a cat".split())
    assert (2, 2, 2, 1, 0.6) in al
    with_para = meteor_sentence("a dog next to a cat", ["a dog beside a cat"])
    without = meteor_sentence("a dog towards a cat", ["a dog beside a cat"])
    assert with_para > without


def test_meteor_paraphrase_table_swap():
    # set_paraphrase_groups replaces the table for BOTH scorers (the C++
    # path re-syncs via generation tracking); restore the default after.
    from show_and_tell_tpu.metrics import paraphrases
    from show_and_tell_tpu.metrics import meteor as m

    default = paraphrases.active_groups()
    base = m.meteor_sentence("a dog next to a cat", ["a dog beside a cat"])
    try:
        paraphrases.set_paraphrase_groups([("zzz qqq", "www")])
        swapped = m.meteor_sentence("a dog next to a cat", ["a dog beside a cat"])
        assert swapped < base  # "next to"~"beside" no longer matches
        hit = m.meteor_sentence("zzz qqq", ["www"])
        assert hit > 0
        if m._cpp_available():
            m._cpp_sync_tables()
            assert m._cpp_meteor_sentence("zzz qqq", ["www"]) == pytest.approx(
                hit, abs=1e-12
            )
    finally:
        paraphrases.set_paraphrase_groups(default)
        if m._cpp_available():
            m._cpp_sync_tables()


def test_meteor_paraphrase_length_limit():
    from show_and_tell_tpu.metrics import paraphrases

    with pytest.raises(ValueError):
        paraphrases.set_paraphrase_groups([("one two three four five", "x")])
    # restore (the raise happens before assignment, but be explicit)
    paraphrases.set_paraphrase_groups(paraphrases.PARAPHRASE_GROUPS)


def test_meteor_multi_ref_max():
    s1 = meteor_sentence("a cat", ["a cat", "completely different"])
    s2 = meteor_sentence("a cat", ["a cat"])
    assert s1 == pytest.approx(s2)


def test_meteor_api():
    score, scores = Meteor().compute_score({1: ["a b"], 2: ["c d"]}, {1: ["a b"], 2: ["x y"]})
    assert len(scores) == 2
    assert score == pytest.approx(np.mean(scores))


# --- SPICE ------------------------------------------------------------------


def test_ptb_tokenizer_golden_corpus():
    """Golden corpus pinning PTBTokenizer(-preserveLines -lowerCase) + strip
    semantics on tricky caption sentences (contractions, possessives,
    quotes, abbreviations, hyphens, currency, number-internal punctuation,
    PTB lexical splits). Expectations constructed from the documented
    CoreNLP rules (no JVM in this image); both implementations must match."""
    import os

    from show_and_tell_tpu.metrics.tokenizer import (
        _cpp_tokenize,
        _cpp_tokenizer_available,
        tokenize_caption,
    )

    path = os.path.join(os.path.dirname(__file__), "data", "ptb_golden.txt")
    cpp = _cpp_tokenizer_available()
    n = 0
    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            inp, exp = line.split("\t")
            assert tokenize_caption(inp) == exp, (inp, tokenize_caption(inp))
            if cpp:
                assert _cpp_tokenize(inp) == exp, (inp, _cpp_tokenize(inp))
            n += 1
    assert n >= 40


def test_spice_builtin_backend_default():
    """SPICE computes out of the box via the built-in scene-graph backend
    (the reference's SPICE always crashes: jar absent)."""
    from show_and_tell_tpu.metrics import spice as spice_mod

    score, scores = Spice().compute_score(
        {1: ["a man rides a horse", "a guy on a horse"], 2: ["a large dog runs"]},
        {1: ["a man riding a horse"], 2: ["a big dog running"]},
    )
    assert 0.0 < score <= 1.0 and len(scores) == 2
    # identical caption -> perfect tuple overlap
    s, per = Spice().compute_score({1: ["a man rides a horse"]}, {1: ["a man rides a horse"]})
    assert s == pytest.approx(1.0)
    # disjoint scenes -> 0
    s0, _ = Spice().compute_score({1: ["a man rides a horse"]}, {1: ["two cats sleep indoors"]})
    assert s0 == 0.0


def test_spice_subcategory_score_sets():
    """Per-image scores carry the reference wrapper's subcategory shape
    (pycocoevalcap/spice/spice.py:78-91): category -> {f, pr, re} with the
    jar's -subset buckets, NaN for categories absent from both sides."""
    from show_and_tell_tpu.metrics.scene_graph import parse, spice_backend, spice_f

    score, scores = spice_backend(
        {1: ["two red dogs sitting on a large mat"]},
        {1: ["three red dogs on a large mat"]},
    )
    (s,) = scores
    assert set(s) == {
        "All", "Object", "Attribute", "Relation", "Color", "Cardinality", "Size",
    }
    assert all(set(v) == {"f", "pr", "re"} for v in s.values())
    assert s["Object"] == {"f": 1.0, "pr": 1.0, "re": 1.0}  # dog, mat
    assert s["Relation"]["f"] == 1.0  # (dog, on, mat)
    assert s["Color"]["f"] == 1.0  # red
    assert s["Size"]["f"] == 1.0  # large
    assert s["Cardinality"] == {"f": 0.0, "pr": 0.0, "re": 0.0}  # three vs two
    # attributes: {three, red, larg} vs {two, red, sit, larg} -> m=2
    assert s["Attribute"]["pr"] == pytest.approx(2 / 3)
    assert s["Attribute"]["re"] == pytest.approx(2 / 4)
    # the All column stays bit-identical to the flat spice_f, and the corpus
    # mean averages All f (spice.py:82)
    assert s["All"]["f"] == spice_f(
        parse("three red dogs on a large mat"),
        parse("two red dogs sitting on a large mat"),
    )
    assert score == s["All"]["f"]

    # categories absent from BOTH sides are NaN (the wrapper's None->NaN
    # float_convert, spice.py:86-90); one-sided absence scores f=0
    _, (s2,) = spice_backend({2: ["a dog"]}, {2: ["a dog"]})
    assert s2["Object"]["f"] == 1.0
    for cat in ("Relation", "Attribute", "Color", "Cardinality", "Size"):
        assert math.isnan(s2[cat]["f"]) and math.isnan(s2[cat]["pr"])
    _, (s3,) = spice_backend({3: ["a red dog"]}, {3: ["a dog"]})
    assert s3["Color"]["f"] == 0.0 and math.isnan(s3["Color"]["pr"])
    assert s3["Color"]["re"] == 0.0


def test_spice_all_column_equals_flat_f1():
    """The All column is bit-identical to the flat spice_f on random tuple
    sets — including BOTH-EMPTY graphs, where All stays 0.0 so a degenerate
    caption cannot NaN the corpus mean (subcategories go NaN instead)."""
    import random

    from show_and_tell_tpu.metrics.scene_graph import spice_f, spice_score_set

    rng = random.Random(0)
    vocab = "dog cat man red two larg on in sit run mat tabl".split()

    def rand_tuples(n):
        return {
            tuple(rng.choice(vocab) for _ in range(rng.choice([1, 2, 3])))
            for _ in range(n)
        }

    for _ in range(500):
        c, r = rand_tuples(rng.randint(0, 6)), rand_tuples(rng.randint(0, 6))
        assert spice_score_set(c, r)["All"]["f"] == spice_f(c, r)


def test_spice_cached_backend_score_sets(tmp_path):
    """The persistent cache round-trips subcategory dicts (incl. NaN)."""
    from show_and_tell_tpu.metrics.scene_graph import spice_backend
    from show_and_tell_tpu.metrics.spice import cached_backend

    cache = str(tmp_path / "c.json")
    fn = cached_backend(spice_backend, cache)
    gts = {1: ["a man rides a horse"]}
    res = {1: ["a man riding a horse"]}
    s1, per1 = fn(gts, res)
    s2, per2 = fn(gts, res)  # fully cached second call
    assert s1 == pytest.approx(1.0) and s2 == pytest.approx(1.0)
    assert per2[0]["All"]["f"] == pytest.approx(1.0)
    assert math.isnan(per2[0]["Color"]["f"])


def test_spice_disabled_contract():
    """set_backend(None) reproduces the reference's de-facto broken SPICE."""
    from show_and_tell_tpu.metrics import spice as spice_mod

    try:
        spice_mod.set_backend(None)
        with pytest.raises(SpiceUnavailable):
            Spice().compute_score({1: ["a"]}, {1: ["a"]})
        assert Spice(strict=False).compute_score({1: ["a"]}, {1: ["a"]}) == (None, None)
        assert not Spice(strict=False).available()
    finally:
        spice_mod.use_builtin_backend()


def test_scene_graph_parse():
    from show_and_tell_tpu.metrics.scene_graph import parse

    g = parse("a large brown dog chases a small ball")
    assert ("dog",) in g and ("ball",) in g
    assert ("dog", "brown") in g and ("dog", "larg") in g and ("ball", "small") in g
    assert ("dog", "chase", "ball") in g
    g2 = parse("a man in a red shirt")
    assert ("man", "in", "shirt") in g2 and ("shirt", "red") in g2
    # copula attribute and gerund-as-attribute forms
    assert ("dog", "brown") in parse("the dog is brown")
    g3 = parse("two dogs are running on the beach")
    assert ("dog", "run") in g3 and ("dog", "on", "beach") in g3 and ("dog", "two") in g3


def test_scene_graph_synonym_matching():
    """Tuple matching uses the shared synonym table: 'guy on bike' matches
    'man on bicycle' tuples."""
    from show_and_tell_tpu.metrics.scene_graph import spice_backend

    score, _ = spice_backend(
        {1: ["a man on a bicycle"]}, {1: ["a guy on a bike"]}
    )
    assert score == pytest.approx(1.0)


def test_spice_backend_hook():
    set_backend(lambda gts, res: (0.42, [0.42]))
    try:
        assert Spice().compute_score({1: ["a"]}, {1: ["a"]})[0] == 0.42
        assert Spice().available()
    finally:
        # restore the lazy-default state (set_backend(None) would latch
        # SPICE off for the whole process — it leaked into later tests)
        from show_and_tell_tpu.metrics import spice as spice_mod

        spice_mod._BACKEND = None
        spice_mod._DEFAULT_INSTALLED = False


# --- PTB tokenizer ----------------------------------------------------------


def test_tokenizer_lowercase_and_punct_strip():
    assert tokenize_caption("A man, riding a horse.") == "a man riding a horse"
    assert tokenize_caption("Hello!!!") == "hello"


def test_tokenizer_contractions():
    assert tokenize_caption("He doesn't run") == "he does n't run"
    assert tokenize_caption("The man's hat") == "the man 's hat"


def test_tokenizer_brackets_removed():
    # -LRB-/-RRB- are produced then stripped (both in PUNCTUATIONS)
    assert tokenize_caption("a (small) dog") == "a small dog"


def test_tokenizer_api_contract():
    tk = PTBTokenizer()
    out = tk.tokenize(
        {
            7: [{"caption": "A dog runs."}, {"caption": "Dogs, running!"}],
            8: [{"caption": "Cat."}],
        }
    )
    assert out == {7: ["a dog runs", "dogs running"], 8: ["cat"]}


# --- orchestrator API surface -------------------------------------------


def test_cocoevalcap_api_surface():
    """The reference-compatible objects users touch: eval dict, imgToEval,
    evalImgs, params (pycocoevalcap/eval.py:9-75 surface)."""
    from show_and_tell_tpu.metrics.coco import COCO
    from show_and_tell_tpu.metrics.orchestrator import COCOEvalCap

    coco = COCO(
        {
            "images": [{"id": 1}, {"id": 2}],
            "annotations": [
                {"image_id": 1, "caption": "a man rides a horse", "id": 11},
                {"image_id": 1, "caption": "a man on a horse", "id": 12},
                {"image_id": 2, "caption": "a dog runs fast", "id": 21},
            ],
        }
    )
    res = coco.loadRes(
        [
            {"image_id": 1, "caption": "a man rides a horse"},
            {"image_id": 2, "caption": "a cat sits"},
        ]
    )
    ev = COCOEvalCap(coco, res)
    ev.params["image_id"] = res.getImgIds()
    out = ev.evaluate()
    assert out is ev.eval
    for k in ("Bleu_1", "Bleu_4", "METEOR", "ROUGE_L", "CIDEr"):
        assert k in ev.eval
    assert set(ev.imgToEval.keys()) == {1, 2}
    assert ev.imgToEval[1]["Bleu_1"] > ev.imgToEval[2]["Bleu_1"]
    assert ev.evalImgs[0]["image_id"] == 1
    # per-image fields carry every metric
    for m in ("Bleu_1", "METEOR", "ROUGE_L", "CIDEr"):
        assert m in ev.evalImgs[0]


def test_coco_loadres_rejects_unknown_image():
    from show_and_tell_tpu.metrics.coco import COCO

    coco = COCO({"images": [{"id": 1}], "annotations": [
        {"image_id": 1, "caption": "a", "id": 1}]})
    with pytest.raises(ValueError):
        coco.loadRes([{"image_id": 99, "caption": "x"}])


def test_spice_cached_backend(tmp_path):
    from show_and_tell_tpu.metrics.spice import cached_backend

    calls = []

    def backend(gts, res):
        calls.append(sorted(gts.keys()))
        scores = [0.1 * i for i in sorted(gts.keys())]
        return float(np.mean(scores)), scores

    cache = str(tmp_path / "spice_cache.json")
    fn = cached_backend(backend, cache)
    gts = {1: ["a b"], 2: ["c d"]}
    res = {1: ["a b"], 2: ["c"]}
    s1, per1 = fn(gts, res)
    assert calls == [[1, 2]]
    # second call: fully cached, backend untouched
    s2, per2 = fn(gts, res)
    assert calls == [[1, 2]]
    assert (s1, per1) == (s2, per2)
    # new image: only the miss hits the backend
    gts[3] = ["e f"]
    res[3] = ["e f"]
    fn(gts, res)
    assert calls == [[1, 2], [3]]


def test_spice_passive_aligns_with_active():
    """'X VERBED by Y' inverts to the same relation tuple as the active
    phrasing (irregular participles map to their base verb); a gerund
    before 'by' stays locative."""
    from show_and_tell_tpu.metrics.scene_graph import parse, spice_backend

    rel = lambda c: {t for t in parse(c) if len(t) == 3}  # noqa: E731
    assert rel("a horse ridden by a man") == rel("a man riding a horse")
    assert rel("a cake made by a baker") == rel("a baker making a cake")
    assert rel("a photo taken by a tourist") == {("tourist", "take", "photo")}
    # locative 'by' is NOT a passive
    assert rel("a dog sitting by the door") == {("dog", "by", "door")}
    # enclosure participles invert even when the by-object is a
    # place/structure noun — and align with their finite active forms
    # (blind-7 verify-drive finding: 'surrounds' was missing from the
    # verb lexicon, so the active phrasing minted a 'surround' entity)
    assert rel("a field surrounded by a wooden fence") == rel(
        "a fence surrounds a field"
    )
    assert rel("a garden enclosed by a stone wall") == rel(
        "a wall encloses a garden"
    )
    # ...while a non-enclosure participle keeps the locative escape
    assert rel("a picture hung by the window") == {("pictur", "by", "window")}
    score, _ = spice_backend(
        {1: ["a man riding a horse"]}, {1: ["a horse ridden by a man"]}
    )
    assert score == 1.0


def test_spice_parser_coordination_and_framing():
    """Coordinated adjectives stay attributes of one NP; coordinated bare
    plurals form separate objects; the 'a close up of' framing prefix is
    dropped as non-scene content."""
    from show_and_tell_tpu.metrics.scene_graph import parse

    t = parse("a black and white cat")
    assert ("cat", "black") in t and ("cat", "white") in t
    assert ("black",) not in t  # 'black' must not become an object
    t = parse("dogs and cats sitting on a couch")
    assert ("dog",) in t and ("cat",) in t  # both coordinated objects
    t = parse("a close up of a plate of food")
    assert ("close",) not in t and ("plate", "of", "food") in t
    t = parse("a man and a dog")
    assert ("man",) in t and ("dog",) in t


def test_scene_graph_parse_fuzz_never_raises():
    """The parser's clause state machine has many interacting flags
    (negation, coordination, appositives, inverted copulas): random
    caption-shaped token soup must never crash it, and every tuple must
    stay well-formed (1-3 elements)."""
    import random

    from show_and_tell_tpu.metrics.scene_graph import (
        CONJUNCTIONS,
        COPULAS,
        DETERMINERS,
        PREPOSITIONS,
        parse,
    )

    vocab = (
        list(DETERMINERS)
        + [p for p in PREPOSITIONS if p.isalpha()]
        + list(COPULAS)
        + list(CONJUNCTIONS)
        + ["man", "dog", "red", "running", "sitting", "held", "n't",
           "not", "that", "'s", "doing", "trick", "covered",
           # pre-pass rule triggers: digit counts, anaphors, modals,
           # raising verbs, particles, sign-text verbs, bare predicates
           "2", "10", "it", "them", "can", "be", "seen", "says", "out",
           "of", "high", "laid", "stuck", "put", "to", "blowing", "one"]
    )
    rng = random.Random(0)
    for _ in range(2000):
        cap = " ".join(
            rng.choice(vocab) for _ in range(rng.randint(0, 12))
        )
        for t in parse(cap):
            assert 1 <= len(t) <= 3, (cap, t)


def test_scene_graph_template_structural_sweep():
    """Structural invariants over a deterministic caption-template space
    (subject x transitive-verb x object x locative, plus intransitive +
    extras): every parse must yield at least one entity, every locative
    caption at least one relation, the template's transitive verb must
    survive as a relation, and no function word may leak into a tuple.
    A 3,300-caption interactive sweep flagged zero failures (round 3
    session 7); this pins a deterministic 800-caption subset."""
    import itertools

    from show_and_tell_tpu.metrics.scene_graph import (
        CONJUNCTIONS,
        COPULAS,
        PREPOSITIONS,
        parse,
    )

    subjects = ["a man", "a woman", "two dogs", "an elephant"]
    verbs_t = ["holding", "eating", "carrying", "riding"]
    objects = ["a ball", "an umbrella", "a sandwich", "a kite"]
    verbs_i = ["sitting", "standing", "walking", "sleeping"]
    locs = ["on a bench", "in a park", "near a fence", "under a tree"]
    extras = ["with a hat", "in the rain", "at night"]

    caps = [
        f"{s} {v} {o} {l}"
        for s, v, o, l in itertools.product(subjects, verbs_t, objects, locs)
    ] + [
        f"{s} {v} {l} {e}"
        for s, v, l, e in itertools.product(subjects, verbs_i, locs, extras)
    ] + [
        f"{o} held by {s} {l}"
        for s, o, l in itertools.product(subjects, objects, locs)
    ]
    function_words = PREPOSITIONS | CONJUNCTIONS | COPULAS
    verb_lemmas = {"holding": "hold", "eating": "eat",
                   "carrying": "carri", "riding": "ride"}
    for c in caps:
        ts = parse(c)
        assert any(len(t) == 1 for t in ts), (c, sorted(ts))
        assert any(len(t) == 3 for t in ts), (c, sorted(ts))
        for t in ts:
            assert t[0] not in function_words, (c, t)
            assert t[-1] not in function_words, (c, t)
        for v, lemma in verb_lemmas.items():
            if f" {v} " in c:
                assert any(
                    len(t) == 3 and t[1] == lemma for t in ts
                ), (c, sorted(ts))


def test_scene_graph_number_initial_participle_nps():
    """A count word can never be a clause subject: 'two parked cars' /
    'three potted plants' are compound NPs, in bare, prepositional, AND
    verb-object frames (blind-7 audit — 'two parked cars' had split as
    the clause (two, park, car), and 'a man holding two parked cars'
    picked the participle over the true verb)."""
    import itertools

    from show_and_tell_tpu.metrics.scene_graph import _norm, parse

    nums = ["two", "three", "five"]
    parts = ["parked", "potted", "painted", "folded", "stacked"]
    nouns = ["cars", "plants", "chairs", "boxes"]
    for n, p, h in itertools.product(nums, parts, nouns):
        for frame in [
            f"{n} {p} {h}",
            f"a cat sitting near {n} {p} {h}",
            f"a man holding {n} {p} {h}",
        ]:
            ts = parse(frame)
            head = _norm(h)
            assert (head, n) in ts, (frame, sorted(ts))
            assert (head, _norm(p)) in ts, (frame, sorted(ts))
            assert not any(t[0] == n for t in ts), (frame, sorted(ts))
    # the true verb survives in the verb-object frame
    ts = parse("a man holding two parked cars")
    assert ("man", "hold", "car") in ts, sorted(ts)


def test_scene_graph_review_regressions_blind8():
    """Adversarial-review findings on the blind-7/8 rules, pinned:
    (1) a possessed body-part absolute must NOT capture clause
    subjecthood for later verbs/locatives; (2) role 'as' + reduced
    relative keeps the role relation (only FINITE verbs open an
    as-clause); (3) the aggregate-of pass-through neither steals a
    trailing gerund nor depends on what follows the phrase; (4) the
    compound-participle object fix covers the coordinated lone-VP path;
    (5) attributive 'overhead' survives while the bare adverb drops."""
    from show_and_tell_tpu.metrics.scene_graph import parse

    ts = parse("a woman with her hair in a ponytail cooking in a kitchen")
    assert ("woman", "cook") in ts and ("woman", "in", "kitchen") in ts, ts
    assert ("hair", "in", "ponytail") in ts, ts
    ts = parse("a cat with its paws in the air lying on a couch")
    assert ("cat", "lie") in ts and ("cat", "on", "couch") in ts, ts
    assert ("paw", "in", "air") in ts, ts

    ts = parse("a man dressed as a clown juggling balls")
    assert ("man", "dress", "clown") in ts, ts
    ts = parse("a woman dressed as a witch holding a broom")
    assert ("woman", "dress", "witch") in ts, ts
    assert ("woman", "hold", "broom") in ts, ts
    ts = parse("a crowd watches as a man rides a mechanical bull")
    assert ("man", "ride", "bull") in ts and ("crowd", "watch") in ts, ts

    ts = parse("a girl dancing under a string of lights hanging from a tree")
    assert ("light", "hang") in ts and ("light", "from", "tree") in ts, ts
    assert ("girl", "under", "light") in ts, ts
    # identical prefix, different continuations -> identical pass-through
    for cap in [
        "a couple dancing under a string of lights",
        "a couple dancing under a string of lights casting a glow",
    ]:
        assert ("coupl", "under", "light") in parse(cap), cap

    ts = parse("a woman smiling and holding two wrapped presents")
    assert ("woman", "hold", "present") in ts, ts
    assert ("present", "wrap") in ts and ("present", "two") in ts, ts

    assert ("compart", "overhead") in parse(
        "luggage in the overhead compartment"
    )
    assert not any(
        "overhead" in t
        for t in parse("a boat docked at a pier with seagulls flying overhead")
    )


def test_scene_graph_animate_lexicon_frames():
    """Every ANIMATE_NOUNS member must (a) carry an accompaniment
    with-object past a locative ("a <w> running on the beach WITH A
    BALL" -> the animate subject has the ball) and (b) keep an agent-
    requiring gerund as a verb object ("chasing a <w> WEARING a collar"
    -> the animate object wears it) — the companion audit to the verb
    lexicon frames, since a dozen attachment rules key on this set."""
    from show_and_tell_tpu.metrics.scene_graph import (
        ANIMATE_NOUNS,
        _norm,
        parse,
    )

    for w in sorted(ANIMATE_NOUNS):
        ts = parse(f"a {w} running on the beach with a ball")
        assert (_norm(w), "with", "ball") in ts, (w, sorted(ts))
        ts = parse(f"a man chasing a {w} wearing a collar")
        assert (_norm(w), "wear", "collar") in ts, (w, sorted(ts))


def test_scene_graph_verb_lexicon_transitive_frame():
    """Every verb-lexicon surface form must produce its verb relation in
    a finite transitive frame — the audit that found ~35 missing -s forms
    ('a man WASHES a ball' parsed as an appositive, round-3 session 7).
    Noun-ambiguous forms are protected elsewhere (compound/determiner
    guards), so this pins only the verb reading."""
    from show_and_tell_tpu.metrics.scene_graph import VERBS, parse

    for v in sorted(VERBS):
        ts = parse(f"a man {v} a ball in a park")
        assert any(len(t) == 3 and t[2] == "ball" for t in ts), (
            v, sorted(ts),
        )


def test_scene_graph_participle_passive_frame():
    """Every irregular participle must invert its by-passive ("a ball
    THROWN by a man" -> (man, throw, ball)) — the companion audit to the
    verb transitive frame (finite have-forms excluded: they are not
    passive participles)."""
    from show_and_tell_tpu.metrics.scene_graph import (
        PARTICIPLE_BASE,
        _norm,
        parse,
    )

    for p, base in sorted(PARTICIPLE_BASE.items()):
        if p in ("has", "had"):
            continue
        ts = parse(f"a ball {p} by a man")
        want = _norm(base)
        assert any(len(t) == 3 and t[1] == want for t in ts), (p, sorted(ts))
