"""WordNet / paraphrase-en ingest tooling + the synonym runtime hook
(VERDICT r2 item 5): a user holding the real METEOR-1.5 databases gets true
synonym/paraphrase data with two calls, and both scorers (Python + C++)
rebuild from the swapped tables.
"""

import gzip

import pytest

from show_and_tell_tpu.metrics import ingest, paraphrases, synonyms
from show_and_tell_tpu.metrics import meteor as m


WN_S_FIXTURE = """\
s(102084071,1,'dog',n,1,42).
s(102084071,2,'domestic_dog',n,1,2).
s(102084071,3,'Canis_familiaris',n,1,2).
s(102121620,1,'cat',n,1,18).
s(102121620,2,'true_cat',n,1,0).
s(102121620,3,'feline',n,1,0).
s(201158872,1,'run',v,1,98).
s(201158872,2,'sprint',v,1,3).
s(300002098,1,'big',a,1,50).
s(300002098,2,'large',a,1,40).
s(300002099,1,'immense',s,1,2).
s(300002099,2,'vast',s,1,3).
s(400002100,1,'quickly',r,1,5).
s(400002100,2,'rapidly',r,1,2).
s(100000001,1,'lonely',n,1,1).
s(100000002,1,'o''clock',n,1,1).
s(100000002,2,'hour',n,1,1).
this line is noise and must be ignored
"""


def test_load_wordnet_synsets(tmp_path):
    p = tmp_path / "wn_s.pl"
    p.write_text(WN_S_FIXTURE)
    groups = ingest.load_wordnet_synsets(str(p))
    # collocations skipped by default; lemmas lowercased; quote unescaped;
    # 1-lemma synsets dropped
    assert ("cat", "feline") in groups
    assert ("run", "sprint") in groups
    assert ("big", "large") in groups
    assert ("immense", "vast") in groups  # 's' satellite adjectives kept
    assert ("quickly", "rapidly") in groups
    assert ("o'clock", "hour") in groups
    assert not any("lonely" in g for g in groups)
    assert not any("domestic_dog" in w for g in groups for w in g)
    # dog synset loses both collocations -> single lemma -> dropped
    assert not any("dog" in g for g in groups)
    # parts filter
    nouns = ingest.load_wordnet_synsets(str(p), parts=("n",))
    assert ("cat", "feline") in nouns and ("run", "sprint") not in nouns
    # collocations kept on request, space-joined (paraphrase-table input)
    coll = ingest.load_wordnet_synsets(str(p), include_collocations=True)
    assert ("dog", "domestic dog", "canis familiaris") in coll


def test_load_wordnet_gzip_sniff(tmp_path):
    p = tmp_path / "wn_s.pl.data"  # deliberately no .gz extension
    with gzip.open(p, "wt") as f:
        f.write(WN_S_FIXTURE)
    groups = ingest.load_wordnet_synsets(str(p))  # magic-byte sniff
    plain = tmp_path / "wn_s.pl"
    plain.write_text(WN_S_FIXTURE)
    assert groups == ingest.load_wordnet_synsets(str(plain))
    assert ("cat", "feline") in groups


PARA_FIXTURE = """\
# comment line
next to ||| beside ||| 0.91
a lot of ||| many ||| 0.44
large ||| big
0.77 ||| on top of ||| atop
junk-single-field
too long a phrase here yes ||| short ||| 0.9
same ||| same ||| 0.5
next to ||| beside ||| 0.2
tabbed phrase\tits paraphrase\t0.65
"""


def test_load_paraphrase_en(tmp_path):
    p = tmp_path / "paraphrase-en"
    p.write_text(PARA_FIXTURE)
    pairs = ingest.load_paraphrase_en(str(p))
    assert ("beside", "next to") in pairs  # canonical sorted order, deduped
    assert ("a lot of", "many") in pairs
    assert ("big", "large") in pairs  # 2-field line, prob defaults 1.0
    assert ("atop", "on top of") in pairs  # prob-first layout
    assert ("its paraphrase", "tabbed phrase") in pairs  # tab-separated
    assert not any("too long" in a or "too long" in b for a, b in pairs)
    assert ("same", "same") not in pairs
    assert sum(1 for a, b in pairs if (a, b) == ("beside", "next to")) == 1
    # min_prob filter (2-field lines count as prob 1.0)
    high = ingest.load_paraphrase_en(str(p), min_prob=0.5)
    assert ("a lot of", "many") not in high and ("big", "large") in high
    # groups are valid input for the runtime hook
    default = paraphrases.active_groups()
    try:
        paraphrases.set_paraphrase_groups(pairs)
        assert len(paraphrases.active_groups()) == len(pairs)
    finally:
        paraphrases.set_paraphrase_groups(default)


def test_set_synonym_groups_swaps_both_scorers():
    default = synonyms.active_groups()
    base_feline = m.meteor_sentence("a feline", ["a cat"])
    base_kitty = m.meteor_sentence("a kitty", ["a cat"])
    assert base_kitty > base_feline  # embedded table: kitty~cat, no feline
    try:
        synonyms.set_synonym_groups([("cat", "feline")])
        swapped_feline = m.meteor_sentence("a feline", ["a cat"])
        swapped_kitty = m.meteor_sentence("a kitty", ["a cat"])
        assert swapped_feline > base_feline
        assert swapped_kitty < base_kitty  # old group gone
        if m._cpp_available():
            m._cpp_sync_tables()
            assert m._cpp_meteor_sentence("a feline", ["a cat"]) == pytest.approx(
                swapped_feline, abs=1e-12
            )
            assert m._cpp_meteor_sentence("a kitty", ["a cat"]) == pytest.approx(
                swapped_kitty, abs=1e-12
            )
    finally:
        synonyms.set_synonym_groups(default)
        if m._cpp_available():
            m._cpp_sync_tables()
    assert m.meteor_sentence("a kitty", ["a cat"]) == pytest.approx(
        base_kitty, abs=1e-12
    )


def test_set_synonym_groups_validation():
    with pytest.raises(ValueError, match="single token"):
        synonyms.set_synonym_groups([("two words", "x")])
    # single-member groups are dropped, duplicates deduped
    default = synonyms.active_groups()
    try:
        synonyms.set_synonym_groups([("alone",), ("a", "b", "a")])
        assert synonyms.active_groups() == (("a", "b"),)
    finally:
        synonyms.set_synonym_groups(default)


def test_wordnet_to_meteor_end_to_end(tmp_path):
    """The documented two-call recipe, end to end on the fixture db."""
    p = tmp_path / "wn_s.pl"
    p.write_text(WN_S_FIXTURE)
    default = synonyms.active_groups()
    try:
        synonyms.set_synonym_groups(ingest.load_wordnet_synsets(str(p)))
        hit = m.meteor_sentence("they sprint home", ["they run home"])
        synonyms.set_synonym_groups(default)
        miss = m.meteor_sentence("they sprint home", ["they run home"])
        assert hit > miss  # run~sprint only exists in the WordNet fixture
    finally:
        synonyms.set_synonym_groups(default)
        if m._cpp_available():
            m._cpp_sync_tables()
