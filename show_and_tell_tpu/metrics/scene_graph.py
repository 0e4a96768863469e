"""Built-in SPICE backend: rule-based scene-graph parsing + tuple F-score.

The reference's SPICE (pycocoevalcap/spice/spice.py:63-91) shells out to
``spice-1.0.jar``, which parses captions into scene graphs with the Stanford
dependency parser + SceneGraphParser and scores the F1 overlap of semantic
tuples. The jar is absent from the reference repo, so SPICE never actually
ran there. This module is a dependency-free equivalent built for caption
English:

- **Parser**: a closed-class-lexicon chunker tuned to caption grammar
  ("DT ADJ* NOUN (VERB) (PREP DT ADJ* NOUN)*"). It emits SPICE's three tuple
  kinds: objects ``(head,)``, attributes ``(head, attr)``, and relations
  ``(subj, rel, obj)``. Not a CoreNLP-parity parser — a documented
  approximation (docs/PARITY.md) that covers the constructions COCO captions
  are made of.
- **Scoring**: exactly SPICE's definition (Anderson et al. 2016 §3): the
  reference scene graph is the UNION of tuples over all reference captions;
  P = |T_c matched| / |T_c|, R = |T_c matched| / |T_r|, F = 2PR/(P+R).
  Tuple elements match on equal Porter lemmas or shared synonym group
  (metrics/synonyms.py) — the stand-in for SPICE's WordNet synset matching.

Install as the SPICE backend via ``spice.use_builtin_backend()`` (done by
default on import of metrics.spice).
"""

from __future__ import annotations

import functools

from typing import Dict, FrozenSet, List, Sequence, Set, Tuple

import numpy as np

from show_and_tell_tpu.metrics.meteor import porter_stem, _syn_groups

DETERMINERS = frozenset(
    """a an the this that these those some any each every no all both
    his her its their my your our another other several few many most much
    one two three four five six seven eight nine ten""".split()
)
# number words double as count attributes (SPICE keeps counts)
NUMBERS = frozenset(
    "one two three four five six seven eight nine ten".split()
)
# sentinel for the "in front of" collapse: non-alpha so it can NEVER
# collide with the ordinary noun/adjective uses of "front" ("front seat",
# "front wheel" — common in captions); emitted in tuples as "front"
_FRONT = "\x00front"

PREPOSITIONS = frozenset(
    """in on at by of over under above below between among through during
    before after near against into onto upon inside outside behind beside
    along across around atop underneath beneath past beyond within without
    with to from off down toward towards amid amidst""".split()
) | {_FRONT}
# compound-prep collapse targets must be members of PREPOSITIONS or the
# collapsed token derails the whole clause (golden-set finding,
# benchmarks/spice_parser_eval — the original "front" bug)
COPULAS = frozenset("is are was were be been being 's am".split())
CONJUNCTIONS = frozenset("and or".split())
SKIP = frozenset(
    """there it he she they i you we who which that as while when where
    very really quite just also not n't up out about""".split()
)

Tuple3 = Tuple[str, ...]


def _norm(word: str) -> str:
    if word == _FRONT:  # sentinel -> surface relation word in tuples
        return "front"
    return porter_stem(word)


class _NP:
    __slots__ = ("head", "attrs")

    def __init__(self, head: str, attrs: List[str]):
        self.head = head
        self.attrs = attrs


def _flush_np(words: List[str]) -> _NP | None:
    """[det]* [mod]* head -> NP(head, attrs). Number words become count
    attributes; other pre-head content words become attributes."""
    content = [w for w in words if w not in DETERMINERS or w in NUMBERS]
    content = [w for w in content if w not in SKIP]
    if not content:
        return None
    head = content[-1]
    attrs = content[:-1]
    return _NP(head, attrs)


ING_NOUNS = frozenset(
    """building painting ceiling clothing wedding railing awning icing
    frosting lightning crossing landing drawing evening morning spring
    string ring wing thing king living dining""".split()
)
ED_NOUNS = frozenset("speed breed seaweed tweed shed bed".split())
# common caption verbs whose base/-s forms carry no -ing/-ed marker
VERBS = frozenset(
    """sit sits stand stands walk walks run runs ride rides hold holds
    play plays eat eats drink drinks look looks watch watches wear wears
    carry carries jump jumps fly flies drive drives sleep sleeps hang hangs
    wait waits pose poses smile smiles talk talks read reads throw throws
    catch catches swing swings hit hits kick kicks lean leans graze grazes
    stare stares gaze gazes rest rests float floats swim swims climb climbs
    pull pulls push pushes serve serves laugh laughs surf surfs ski skis
    skate skates chase chases sets does""".split()
# NOT "drinks": as a plural noun ("food and drinks") it outweighs the
# 3rd-person verb reading in caption text
)

# compound prepositions collapsed to one token before chunking
_COMPOUND_PREPS = (
    (("on", "top", "of"), "on"),
    (("in", "front", "of"), _FRONT),
    (("in", "the", "middle", "of"), "amid"),
    (("in", "the", "center", "of"), "amid"),
    (("in", "the", "centre", "of"), "amid"),
    (("in", "the", "midst", "of"), "amid"),
    (("next", "to"), "near"),
    (("close", "to"), "near"),
    # photographic framing prefix, not scene content: drop it so
    # "a close up of a plate" parses as the plate NP
    (("close", "up", "of"), None),
    (("close", "of"), None),  # after PTB 'up' stripping variants
)

# irregular past participles (no -ing/-ed surface marker) -> base verb, so
# "a horse ridden by a man" aligns with "a man riding a horse" after the
# passive inversion below; Porter handles the regular -ed/-ing forms
PARTICIPLE_BASE = {
    "ridden": "ride", "driven": "drive", "eaten": "eat", "worn": "wear",
    "taken": "take", "thrown": "throw", "drawn": "draw", "held": "hold",
    "hung": "hang", "given": "give", "seen": "see", "shown": "show",
    "flown": "fly", "grown": "grow", "built": "build", "made": "make",
    "caught": "catch", "led": "lead", "fed": "feed", "lit": "light",
    "torn": "tear", "swung": "swing", "hidden": "hide", "broken": "break",
    "cut": "cut",  # zero-marker participle ("a sandwich cut in half")
    # finite have-forms normalize to "have" so "a kitchen has cabinets"
    # and "a kitchen with cabinets"-style have-relations share a lemma
    "has": "have", "had": "have",
}


def _is_verbish(w: str) -> bool:
    if len(w) > 4 and w.endswith("ing") and w not in ING_NOUNS:
        return True
    if len(w) > 4 and w.endswith("ed") and w not in ED_NOUNS:
        return True
    return w in VERBS or w in PARTICIPLE_BASE


def _is_participle(w: str) -> bool:
    """Past participles only — the forms that make a 'by'-phrase passive.
    A gerund before 'by' is locative ("a dog sitting BY the door"), never
    inverted."""
    if w in PARTICIPLE_BASE:
        return True
    return len(w) > 4 and w.endswith("ed") and w not in ED_NOUNS


@functools.lru_cache(maxsize=1 << 15)
def parse(caption: str) -> FrozenSet[Tuple3]:
    """PTB-tokenized lowercase caption -> frozenset of scene-graph tuples.

    Cached: periodic checkpoint evaluation re-scores against the SAME
    reference captions every time, so the parse of the whole val reference
    set amortizes to one pass. The frozen return type keeps cache entries
    immutable.

    Segmentation walks the token stream: determiners open a new NP,
    prepositions/copulas/conjunctions close the current one, gerunds are
    verb/relation candidates ("a man RIDING a horse" -> relation; "dogs
    RUNNING on the beach" -> attribute + preposition relation). All tuple
    elements are Porter-normalized so candidate/reference graphs built by
    this same parser align on lemmas.
    """
    toks = [t for t in caption.split() if t.isalpha() or t in COPULAS]
    # collapse compound prepositions ("on top of" -> "on")
    out: List[str] = []
    i = 0
    while i < len(toks):
        for pat, rep in _COMPOUND_PREPS:
            if tuple(toks[i : i + len(pat)]) == pat:
                if rep is not None:
                    out.append(rep)
                i += len(pat)
                break
        else:
            out.append(toks[i])
            i += 1
    toks = out

    tuples: Set[Tuple3] = set()
    nps: List[_NP] = []
    pending_rel: str | None = None  # relation awaiting its object NP
    rel_subj: _NP | None = None
    cur: List[str] = []
    last_np: _NP | None = None
    # (subject NP, object NP) of the last completed LOCATIVE prep relation
    # ("of" excluded: partitives/possessives keep their own head) — a
    # following copula predicates the SUBJECT ("the man on the left IS
    # smiling" -> (man, smile), not (left, smile))
    last_loc_rel = None
    after_conj = False  # the segment after an NP-coordination close forms
    # its own NP even without a determiner ("dogs and CATS SITTING ...")
    # a relativizer immediately before a copula binds the copula to the
    # NP just closed ("a mat THAT is torn" -> (mat, torn)), overriding the
    # locative re-anchor below
    rel_before_copula = False

    def content_count(ws: List[str]) -> int:
        return len(
            [
                t
                for t in ws
                if (t not in DETERMINERS or t in NUMBERS) and t not in SKIP
            ]
        )

    def close_np(defer_verbs: bool = False) -> List[str]:
        """Resolve cur: strip trailing gerunds (attributes of the NP head),
        build the NP, and complete any pending relation with it. With
        ``defer_verbs`` the stripped trailing verbs are RETURNED instead of
        emitted as attributes — the 'by'-passive caller turns them into the
        inverted relation's verb."""
        nonlocal cur, last_np, pending_rel, rel_subj, after_conj, last_loc_rel
        after_conj = False
        words = list(cur)
        cur = []

        trailing_verbs: List[str] = []
        # strip trailing verbs, but never strip the NP's only content word
        # ("a watch" stays a noun; "a dog runs" -> NP dog + verb runs).
        # A segment that is ALL verbs (copula tail "is running") empties out
        # and attaches to the previous NP below.
        # with a relation pending this segment must yield its object NP, so
        # a verb-lexicon noun ("a watch") is never stripped away
        all_verbs = pending_rel is None and all(
            _is_verbish(t) for t in words if content_count([t])
        )
        while words and _is_verbish(words[-1]) and (
            all_verbs or content_count(words[:-1]) >= 1
        ):
            trailing_verbs.insert(0, words.pop())

        # Bare-object verb split: "a woman drinks coffee" / "a giraffe
        # eating leaves" — an internal verb with content on BOTH sides
        # splits the segment into subject NP + relation + object NP. (The
        # determiner branch already splits "...rides A horse"; this covers
        # the determiner-less object, a top-frequency caption construction
        # per the golden-set error catalogue.) The object side must be
        # verb-free so gerund chains ("sitting eating") pick the LAST verb
        # as the relation and keep earlier ones as subject attributes.
        split_k = -1
        for k in range(len(words) - 1, -1, -1):
            if (
                _is_verbish(words[k])
                and content_count(words[:k]) >= 1
                and content_count(words[k + 1 :]) >= 1
                and all(not _is_verbish(t) for t in words[k + 1 :])
            ):
                split_k = k
                break
        if split_k >= 0:
            subj_words, verb = words[:split_k], words[split_k]
            obj_words = words[split_k + 1 :]
            subj_verbs: List[str] = []
            while (
                subj_words
                and _is_verbish(subj_words[-1])
                and content_count(subj_words[:-1]) >= 1
            ):
                subj_verbs.insert(0, subj_words.pop())
            subj_np, obj_np = _flush_np(subj_words), _flush_np(obj_words)
            if subj_np is not None and obj_np is not None:
                nps.append(subj_np)
                nps.append(obj_np)
                for v in subj_verbs:
                    tuples.add((_norm(subj_np.head), _norm(v)))
                base = PARTICIPLE_BASE.get(verb, verb)
                tuples.add(
                    (_norm(subj_np.head), _norm(base), _norm(obj_np.head))
                )
                # a pending relation ("a man WITH a dog chasing birds")
                # completes with the SUBJECT of the split
                if pending_rel is not None and rel_subj is not None:
                    if isinstance(pending_rel, tuple):  # passive
                        pv = PARTICIPLE_BASE.get(pending_rel[1], pending_rel[1])
                        tuples.add(
                            (_norm(subj_np.head), _norm(pv), _norm(rel_subj.head))
                        )
                    else:
                        tuples.add(
                            (_norm(rel_subj.head), _norm(pending_rel), _norm(subj_np.head))
                        )
                        if pending_rel in PREPOSITIONS and pending_rel != "of":
                            last_loc_rel = (rel_subj, subj_np)
                pending_rel = None
                rel_subj = None
                last_np = obj_np
                if defer_verbs:
                    return trailing_verbs
                for v in trailing_verbs:
                    tuples.add((_norm(obj_np.head), _norm(v)))
                return []

        np_ = _flush_np(words)
        if np_ is None:
            # segment was all verbs/adjectives: attach to the previous NP
            if last_np is not None and not defer_verbs:
                for v in trailing_verbs:
                    tuples.add((_norm(last_np.head), _norm(v)))
                return []
            return trailing_verbs
        nps.append(np_)
        if pending_rel is not None and rel_subj is not None:
            if isinstance(pending_rel, tuple):  # ("__passive__", verb)
                # "X VERBED by Y" -> (Y, base-verb, X): same tuple the
                # active phrasing produces, so passive/active captions align
                verb = pending_rel[1]
                verb = PARTICIPLE_BASE.get(verb, verb)
                tuples.add((_norm(np_.head), _norm(verb), _norm(rel_subj.head)))
            else:
                tuples.add(
                    (_norm(rel_subj.head), _norm(pending_rel), _norm(np_.head))
                )
                if pending_rel in PREPOSITIONS and pending_rel != "of":
                    last_loc_rel = (rel_subj, np_)
        pending_rel = None
        rel_subj = None
        last_np = np_
        if defer_verbs:
            return trailing_verbs
        for v in trailing_verbs:
            tuples.add((_norm(np_.head), _norm(v)))
        return []

    def lone_content_segment() -> bool:
        """cur holds content but no real determiner — hangs off the previous
        NP rather than starting a new one."""
        return (
            bool(cur)
            and not after_conj
            and last_np is not None
            and not any(c in DETERMINERS and c not in NUMBERS for c in cur)
        )

    def attach_lone_segment() -> None:
        """cur (det-less) hangs off last_np. A leading verb run followed by
        non-verb content is a bare-object relation ("is drinking water"
        after 'the zebra': (zebra, drink, water), extra leading verbs stay
        attributes); otherwise every content token is an attribute."""
        nonlocal cur
        words = [c for c in cur if c not in SKIP]
        cur = []
        k = 0
        while k < len(words) and _is_verbish(words[k]):
            k += 1
        if 1 <= k < len(words) and not any(_is_verbish(t) for t in words[k:]):
            obj = _flush_np(words[k:])
            if obj is not None:
                nps.append(obj)
                for v in words[: k - 1]:
                    tuples.add((_norm(last_np.head), _norm(PARTICIPLE_BASE.get(v, v))))
                base = PARTICIPLE_BASE.get(words[k - 1], words[k - 1])
                tuples.add((_norm(last_np.head), _norm(base), _norm(obj.head)))
                return
        for c in words:
            tuples.add((_norm(last_np.head), _norm(c)))

    for ti, w in enumerate(toks):
        nxt = toks[ti + 1] if ti + 1 < len(toks) else None
        if w == "to" and nxt is not None and _is_verbish(nxt):
            continue  # infinitive marker ("trying TO catch"), not a prep
        if w == "that" and nxt is not None and (
            _is_verbish(nxt) or nxt in COPULAS
        ):
            rel_before_copula = nxt in COPULAS
            continue  # relativizer ("a girl THAT holds..."), not a det
        if w in ("which", "who") and nxt is not None and nxt in COPULAS:
            rel_before_copula = True  # "a dog WHICH is sleeping"
            continue
        if w == "'s":
            # possessive clitic: "a man 's hat" -> (man, have, hat); the
            # copular reading ("the dog 's brown") is rare in caption text
            close_np()
            if last_np is not None:
                pending_rel = "have"
                rel_subj = last_np
            continue
        if w in PREPOSITIONS:
            if lone_content_segment() and pending_rel is None:
                # "dogs RUNNING on the beach": gerund/adjective segment ->
                # attributes of the previous NP; the preposition then
                # relates that same NP — EXCEPT a participle before "by",
                # which is a passive ("horse ridden by...")
                if w == "by" and len(cur) == 1 and _is_participle(cur[0]):
                    verb = cur[0]
                    cur = []
                    pending_rel = ("__passive__", verb)
                    rel_subj = last_np
                    continue
                attach_lone_segment()
            else:
                deferred = close_np(defer_verbs=(w == "by"))
                if (
                    w == "by"
                    and deferred
                    and last_np is not None
                    and _is_participle(deferred[-1])
                ):
                    # passive: the deferred participle is the relation verb;
                    # extra stripped verbs (rare) stay attributes
                    for v in deferred[:-1]:
                        tuples.add((_norm(last_np.head), _norm(v)))
                    pending_rel = ("__passive__", deferred[-1])
                    rel_subj = last_np
                    continue
                for v in deferred:  # defer without passive: plain attrs
                    if last_np is not None:
                        tuples.add((_norm(last_np.head), _norm(v)))
            if last_np is not None:
                pending_rel = w
                rel_subj = last_np
        elif w in COPULAS:
            close_np()
            if (
                not rel_before_copula
                and last_loc_rel is not None
                and last_np is last_loc_rel[1]
            ):
                # copula after a locative object re-anchors to the clause
                # subject: "the man on the left IS smiling" -> (man, smile) —
                # UNLESS a relativizer bound the copula to the object NP
                # ("a cat on a mat THAT is torn" -> (mat, torn))
                last_np = last_loc_rel[0]
            rel_before_copula = False
        elif w in CONJUNCTIONS:
            # attribute coordination stays inside the NP: "black AND white
            # cat" — the next token continues the same bare segment. NP
            # coordination ("a man AND a dog", "sitting and eating") closes.
            if (
                cur
                and nxt is not None
                and nxt not in DETERMINERS
                and nxt not in PREPOSITIONS
                and nxt not in COPULAS
                and not _is_verbish(nxt)
                and not _is_verbish(cur[-1])
                # a plural before 'and' is NP coordination ("dogs and
                # cats"), not an adjective chain ("black and white")
                and not cur[-1].endswith("s")
            ):
                continue
            close_np()
            pending_rel = None
            rel_subj = None
            after_conj = True
        elif w in DETERMINERS and w not in NUMBERS:
            if cur:
                content = [t for t in cur if t not in SKIP]
                if len(content) == 1 and lone_content_segment() and pending_rel is None:
                    # "...shirt HOLDING an umbrella": lone verb segment —
                    # relation from the previous NP, not a new object
                    pending_rel = content[0]
                    rel_subj = last_np
                    cur = []
                elif len(content) >= 2:
                    # "a man rides A horse" -> cur == [a, man, rides]:
                    # final word is the verb, the rest the subject NP;
                    # extra trailing verbs on the subject ("a man trying
                    # [to] catch A ball") stay subject attributes
                    verb = cur[-1]
                    subj_words = cur[:-1]
                    cur = []
                    subj_verbs: List[str] = []
                    while (
                        subj_words
                        and _is_verbish(subj_words[-1])
                        and content_count(subj_words[:-1]) >= 1
                    ):
                        subj_verbs.insert(0, subj_words.pop())
                    np_ = _flush_np(subj_words)
                    if np_ is not None:
                        nps.append(np_)
                        for v in subj_verbs:
                            tuples.add(
                                (_norm(np_.head), _norm(PARTICIPLE_BASE.get(v, v)))
                            )
                        last_np = np_
                        pending_rel = verb
                        rel_subj = np_
                else:
                    close_np()
            cur.append(w)
        elif w in SKIP:
            pass
        else:
            cur.append(w)

    # end of stream: a trailing lone segment hangs off the last NP
    # (attributes, or a bare-object relation — attach_lone_segment)
    if lone_content_segment() and pending_rel is None:
        attach_lone_segment()
    close_np()

    for np_ in nps:
        tuples.add((_norm(np_.head),))
        for a in np_.attrs:
            tuples.add((_norm(np_.head), _norm(a)))
    return frozenset(tuples)


# --- matching + F-score ------------------------------------------------------


def _elems_match(a: str, b: str) -> bool:
    if a == b:
        return True
    ga = _syn_groups(a, a)
    return bool(ga) and not ga.isdisjoint(_syn_groups(b, b))


def _tuple_match(t1: Tuple3, t2: Tuple3) -> bool:
    return len(t1) == len(t2) and all(_elems_match(a, b) for a, b in zip(t1, t2))


def spice_f(cand: Set[Tuple3], ref: Set[Tuple3]) -> float:
    """SPICE F1 between a candidate tuple set and the union reference set."""
    if not cand or not ref:
        return 0.0
    # One-to-one assignment via maximum bipartite matching (augmenting
    # paths). Greedy iteration over raw sets would make the count depend on
    # hash-seed iteration order (synonym matches are many-to-many); maximum
    # matching is both order-independent and maximal, so a candidate tuple
    # never loses its only partner to one that had alternatives.
    cl, rl = sorted(cand), sorted(ref)
    adj = [[j for j, r in enumerate(rl) if _tuple_match(t, r)] for t in cl]
    owner = [-1] * len(rl)  # ref index -> matched cand index

    def _augment(i: int, seen: List[bool]) -> bool:
        for j in adj[i]:
            if not seen[j]:
                seen[j] = True
                if owner[j] < 0 or _augment(owner[j], seen):
                    owner[j] = i
                    return True
        return False

    matched = sum(_augment(i, [False] * len(rl)) for i in range(len(cl)))
    p = matched / len(cand)
    r = matched / len(ref)
    return 0.0 if p + r == 0 else 2 * p * r / (p + r)


def spice_backend(gts: Dict, res: Dict):
    """``compute_score``-shaped backend: per-image SPICE F1 + corpus mean.

    Mirrors the reference wrapper's aggregation (spice.py:80-91: mean of
    per-image F-scores)."""
    assert sorted(gts.keys()) == sorted(res.keys())
    scores = []
    for img_id in sorted(gts.keys()):
        cand = parse(res[img_id][0])
        ref_union: Set[Tuple3] = set()
        for r in gts[img_id]:
            ref_union |= parse(r)
        scores.append(spice_f(cand, ref_union))
    return float(np.mean(scores)) if scores else 0.0, scores
