"""METEOR module-ablation sensitivity: bound the score impact of the
synonym/paraphrase DATA deviation (VERDICT r2 item 2a).

The METEOR-1.5 *algorithm* here is exact (alignment resolution, weights,
penalty — metrics/meteor.py), but the synonym/paraphrase *databases* are
compact caption-domain stand-ins (WordNet / paraphrase-en are unfetchable
offline). This benchmark quantifies how much score each module's data can
move, by scoring one fixed 500-pair caption-style corpus under three
configurations:

  exact+stem      — synonym and paraphrase tables emptied
  +synonym        — embedded synonym table active, paraphrases emptied
  +syn+para(full) — both embedded tables active (the default scorer)

The corpus is deterministic (seeded) and deliberately synonym/paraphrase-
rich: ~40% of pairs contain >=1 synonym substitution drawn from the
embedded table and ~25% contain a paraphrase-span substitution, i.e. the
UPPER range of caption-domain lexical variation. The deltas are therefore a
near-worst-case bound: on corpora with less lexical variation the module
data matters proportionally less, and a larger real database (WordNet)
could at most re-capture matches the ablation shows the module is worth.

Run: python benchmarks/meteor_ablation.py
Numbers are pinned in tests/test_deviation_bounds.py and published in
docs/PARITY.md ("Quantified deviations").
"""

from __future__ import annotations

import json
import os
import random
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from show_and_tell_tpu.metrics import meteor as m  # noqa: E402
from show_and_tell_tpu.metrics import paraphrases, synonyms  # noqa: E402

# caption templates; {N}=noun slot, {A}=adjective slot, {V}=verb phrase slot
_TEMPLATES = [
    "a {A} {N} {V} in the {P}",
    "a {N} {V} near a {A} {N2}",
    "two {N}s {V} on the {P}",
    "a {A} {N} next to a {N2}",
    "the {N} {V} while a {N2} watches",
    "a {N} and a {N2} {V} together",
    "a group of {N}s {V} by the {P}",
    "an {A} {N} with a {N2} {V}",
]

_NOUNS = ["man", "woman", "dog", "cat", "car", "bicycle", "boat", "couch",
          "umbrella", "backpack", "pizza", "cookie", "store", "bridge"]
_NOUNS2 = ["kid", "cop", "truck", "bus", "lamp", "phone", "hat", "bag",
           "flower", "rock"]
_ADJS = ["big", "small", "tiny", "quick", "happy", "dirty", "shiny", "elderly"]
_VERBS = ["is standing", "is sitting", "is wearing a hat", "is holding a cup",
          "is riding a bike", "jumps", "smiles", "shouts"]
_PLACES = ["park", "street", "harbor", "forest", "market", "mall"]

# synonym swaps available in the embedded table (surface -> synonym)
_SYN_SWAP = {
    "man": "guy", "woman": "lady", "dog": "pooch", "cat": "kitty",
    "car": "automobile", "bicycle": "bike", "boat": "watercraft",
    "couch": "sofa", "umbrella": "brolly", "backpack": "knapsack",
    "cookie": "biscuit", "store": "shop", "bridge": "span",
    "kid": "child", "cop": "policeman", "truck": "lorry",
    "bus": "coach", "phone": "telephone", "bag": "purse",
    "flower": "blossom", "rock": "stone", "big": "large",
    "small": "little", "tiny": "petite", "quick": "speedy",
    "happy": "glad", "dirty": "soiled", "shiny": "glossy",
    "elderly": "aged", "harbor": "port", "forest": "woods",
    "market": "mart", "mall": "plaza", "jumps": "leaps",
    "shouts": "yells", "smiles": "grins",
}

# paraphrase swaps available in the embedded table (phrase -> phrase)
_PARA_SWAP = {
    "next to": "beside",
    "is wearing a hat": "wears a hat",
    "is holding a cup": "holds a cup",
    "is riding a bike": "rides a bike",
    "is sitting": "sits",
    "is standing": "stands",
}


def build_corpus(n: int = 500, seed: int = 20260817):
    """(hyp, [ref]) pairs. The hyp is the ref with seeded edits: synonym
    swaps (~40% of pairs), paraphrase swaps (~25%), inflection/function-word
    noise (~30%), plus untouched pairs."""
    rng = random.Random(seed)
    pairs = []
    for _ in range(n):
        t = rng.choice(_TEMPLATES)
        ref = (
            t.replace("{A}", rng.choice(_ADJS))
            .replace("{N2}", rng.choice(_NOUNS2))
            .replace("{N}", rng.choice(_NOUNS))
            .replace("{V}", rng.choice(_VERBS))
            .replace("{P}", rng.choice(_PLACES))
        )
        hyp = ref
        if rng.random() < 0.40:  # synonym substitution(s)
            words = hyp.split()
            idxs = [i for i, w in enumerate(words) if w.rstrip("s") in _SYN_SWAP
                    or w in _SYN_SWAP]
            rng.shuffle(idxs)
            for i in idxs[: rng.choice((1, 1, 2))]:
                base = words[i] if words[i] in _SYN_SWAP else words[i].rstrip("s")
                words[i] = _SYN_SWAP[base]
            hyp = " ".join(words)
        if rng.random() < 0.25:  # paraphrase substitution
            for src, dst in _PARA_SWAP.items():
                if src in hyp:
                    hyp = hyp.replace(src, dst, 1)
                    break
        if rng.random() < 0.30:  # inflection / function-word noise
            hyp = hyp.replace("the ", "a ", 1) if rng.random() < 0.5 else (
                hyp + " outside")
        pairs.append((hyp, [ref]))
    return pairs


def _score(pairs) -> float:
    return sum(m.meteor_sentence(h, r) for h, r in pairs) / len(pairs)


def evaluate(n: int = 500):
    pairs = build_corpus(n)
    syn_default = synonyms.active_groups()
    para_default = paraphrases.active_groups()
    try:
        synonyms.set_synonym_groups([])
        paraphrases.set_paraphrase_groups([])
        exact_stem = _score(pairs)
        synonyms.set_synonym_groups(syn_default)
        plus_syn = _score(pairs)
        paraphrases.set_paraphrase_groups(para_default)
        full = _score(pairs)
    finally:
        synonyms.set_synonym_groups(syn_default)
        paraphrases.set_paraphrase_groups(para_default)
    return {
        "n_pairs": len(pairs),
        "exact_stem": round(exact_stem, 4),
        "plus_synonym": round(plus_syn, 4),
        "full": round(full, 4),
        "delta_synonym": round(plus_syn - exact_stem, 4),
        "delta_paraphrase": round(full - plus_syn, 4),
        "delta_total_module_data": round(full - exact_stem, 4),
    }


if __name__ == "__main__":
    print(json.dumps(evaluate(), indent=2))
