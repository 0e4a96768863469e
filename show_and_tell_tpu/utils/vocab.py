"""Vocabulary: word <-> id maps with ``<unk>`` fallback.

Capability parity with the reference ``Vocabulary`` (utils.py:23-41, duplicated
in preprocess.py:11-29): ``add_word``, call-as-lookup with OOV -> ``<unk>``,
``__len__``. The special-token order is load-bearing for checkpoint and decode
compatibility and matches preprocess.py:75-78 exactly:

    <pad>=0, <start>=1, <end>=2, <unk>=3

Extensions over the reference:
- JSON save/load (the reference pickles, preprocess.py:136 — opaque, and its
  py2 pickles don't load in py3).
- Batch encode/decode helpers producing fixed-shape int32 arrays (masked,
  static-shape — the TPU-friendly replacement for sort+pack_padded_sequence).
"""

from __future__ import annotations

import json
from typing import Dict, Iterable, List, Sequence

import numpy as np

PAD, START, END, UNK = "<pad>", "<start>", "<end>", "<unk>"
PAD_ID, START_ID, END_ID, UNK_ID = 0, 1, 2, 3
SPECIAL_TOKENS = (PAD, START, END, UNK)


class Vocabulary:
    def __init__(self) -> None:
        self.word2idx: Dict[str, int] = {}
        self.idx2word: Dict[int, str] = {}
        self.idx = 0

    def add_word(self, word: str) -> None:
        if word not in self.word2idx:
            self.word2idx[word] = self.idx
            self.idx2word[self.idx] = word
            self.idx += 1

    def __call__(self, word: str) -> int:
        if word not in self.word2idx:
            return self.word2idx[UNK]
        return self.word2idx[word]

    def __len__(self) -> int:
        return len(self.word2idx)

    def __contains__(self, word: str) -> bool:
        return word in self.word2idx

    # --- construction -----------------------------------------------------

    @classmethod
    def with_special_tokens(cls) -> "Vocabulary":
        v = cls()
        for tok in SPECIAL_TOKENS:  # exact order: preprocess.py:75-78
            v.add_word(tok)
        return v

    @classmethod
    def from_words(cls, words: Iterable[str]) -> "Vocabulary":
        v = cls.with_special_tokens()
        for w in words:
            v.add_word(w)
        return v

    # --- persistence ------------------------------------------------------

    def save(self, path: str) -> None:
        # idx2word keys are ints; store the word list in index order.
        words = [self.idx2word[i] for i in range(self.idx)]
        with open(path, "w") as f:
            json.dump({"words": words}, f)

    @classmethod
    def load(cls, path: str) -> "Vocabulary":
        with open(path) as f:
            d = json.load(f)
        v = cls()
        for w in d["words"]:
            v.add_word(w)
        # encode/decode hardwire PAD/START/END/UNK ids, so a hand-built
        # vocab JSON that doesn't lead with the special tokens would
        # silently mis-encode every caption (review fix — the pickle
        # importer already validated this; the JSON path must too)
        for tok, want in zip(SPECIAL_TOKENS, (PAD_ID, START_ID, END_ID, UNK_ID)):
            got = v.word2idx.get(tok)
            if got != want:
                raise ValueError(
                    f"{path!r}: special token {tok!r} is at index {got}, "
                    f"expected {want} — the words list must begin with "
                    f"{list(SPECIAL_TOKENS)}"
                )
        return v

    @classmethod
    def from_reference_pickle(cls, path: str) -> "Vocabulary":
        """Load a reference ``vocab.pkl`` (preprocess.py:136) without its code.

        The reference pickles its ``Vocabulary`` instance (``word2idx`` /
        ``idx2word`` / ``idx`` attributes, preprocess.py:11-29) under a module
        path that does not exist here, often from Python 2. This loader:

        - resolves ANY pickled class to a plain attribute bag (no reference
          import needed),
        - reads py2 pickles via ``encoding='latin1'`` (the protocol the
          reference used, ``pickle.HIGHEST_PROTOCOL`` under py2, is 2),
        - accepts bytes keys/values from py2-str payloads,
        - also accepts a bare ``{word: idx}`` dict (common fork variant).

        The index assignment is taken verbatim from the pickle (rebuilt in
        index order), then validated: decode/encode constants require the
        reference special-token order ``<pad>=0,<start>=1,<end>=2,<unk>=3``
        (preprocess.py:75-78). A pickle violating that order is a different
        protocol entirely — we raise rather than silently mis-decode.
        """
        import pickle

        class _Bag:
            def __init__(self, *a, **k):  # tolerate REDUCE-style construction
                pass

        # NEVER consult the real import machinery: a vocab.pkl is untrusted
        # third-party data, and the default resolver turns any importable
        # callable named in the stream (os.system, ...) into code execution
        # at load time (review fix — verified live). The tiny whitelist is
        # what genuine py2/py3 reference pickles actually need to
        # reconstruct a plain attribute bag; everything else becomes _Bag.
        _SAFE = {
            ("collections", "OrderedDict"),
            ("builtins", "object"),
            ("__builtin__", "object"),
            ("copy_reg", "_reconstructor"),
            ("copyreg", "_reconstructor"),
            # protocol<=2 has no bytes opcode: py3 pickles bytes through
            # codecs.encode (pure data transform, no side effects)
            ("_codecs", "encode"),
        }

        class _AnyClassUnpickler(pickle.Unpickler):
            def find_class(self, module, name):  # noqa: D102
                if (module, name) in _SAFE:
                    return super().find_class(module, name)
                return _Bag

        def _s(x) -> str:
            return x.decode("utf-8", "replace") if isinstance(x, bytes) else str(x)

        with open(path, "rb") as f:
            obj = _AnyClassUnpickler(f, encoding="latin1").load()

        # dispatch: an object (or dict) carrying word2idx — str OR bytes
        # key (py2-str payloads pickle attribute names as bytes) — else a
        # bare {word: idx} fork variant
        d = obj if isinstance(obj, dict) else getattr(obj, "__dict__", {})
        raw = d.get("word2idx")
        if not isinstance(raw, dict):
            raw = d.get(b"word2idx")
        if not isinstance(raw, dict):
            raw = obj if isinstance(obj, dict) else None
        if raw is None:
            raise ValueError(
                f"{path!r} does not look like a reference vocab.pkl: "
                "no word2idx attribute and not a word->index dict"
            )
        if not raw:
            raise ValueError(f"{path!r}: empty vocabulary (no entries)")
        try:
            word2idx = {_s(k): int(v) for k, v in raw.items()}
        except (TypeError, ValueError) as e:
            raise ValueError(
                f"{path!r} does not look like a reference vocab.pkl: "
                f"values are not integer indices ({e})"
            ) from None

        by_index = sorted(word2idx.items(), key=lambda kv: kv[1])
        indices = [i for _, i in by_index]
        if indices != list(range(len(indices))):
            raise ValueError(
                f"{path!r}: word indices are not contiguous 0..N-1 "
                f"(got min={indices[0] if indices else None}, "
                f"max={indices[-1] if indices else None}, n={len(indices)})"
            )
        v = cls()
        for w, _ in by_index:
            v.add_word(w)
        for tok, want in zip(SPECIAL_TOKENS, (PAD_ID, START_ID, END_ID, UNK_ID)):
            got = v.word2idx.get(tok)
            if got != want:
                raise ValueError(
                    f"{path!r}: special token {tok!r} is at index {got}, "
                    f"expected {want} (reference order, preprocess.py:75-78); "
                    "this vocabulary was not produced by the reference "
                    "preprocess pipeline"
                )
        return v

    # --- array encode/decode ---------------------------------------------

    def encode(self, tokens: Sequence[str], max_len: int) -> np.ndarray:
        """``<start>`` + ids + ``<end>``, padded with ``<pad>`` to ``max_len``.

        Mirrors data_loader.py:36-41 (start/end wrapping) + collate_fn's
        zero-padding (data_loader.py:56-61), but to a *static* length.
        Tokens beyond ``max_len - 2`` are truncated (``<end>`` always kept).
        """
        ids = [START_ID] + [self(t) for t in tokens[: max_len - 2]] + [END_ID]
        out = np.full((max_len,), PAD_ID, dtype=np.int32)
        out[: len(ids)] = ids
        return out

    def encode_batch(
        self, token_lists: Sequence[Sequence[str]], max_len: int
    ) -> tuple:
        """Returns ``(ids [B, max_len] int32, lengths [B] int32)``.

        ``lengths`` counts ``<start>`` + tokens + ``<end>`` — same convention
        as the reference collate_fn's ``lengths`` (data_loader.py:57).
        """
        n = len(token_lists)
        ids = np.full((n, max_len), PAD_ID, dtype=np.int32)
        lengths = np.zeros((n,), dtype=np.int32)
        for i, toks in enumerate(token_lists):
            row = self.encode(toks, max_len)
            ids[i] = row
            lengths[i] = int(np.sum(row != PAD_ID))
        return ids, lengths

    def decode(self, ids: Sequence[int]) -> str:
        """ids -> sentence, truncating at ``<end>`` (eval.py:101-111).

        The reference loop appends every non-``<end>`` token including
        ``<start>``/``<pad>`` if they appear; its greedy decode never emits
        them in practice. We skip ``<pad>``/``<start>`` for robustness and
        stop at ``<end>`` exactly as the reference does.
        """
        words: List[str] = []
        for i in ids:
            w = self.idx2word.get(int(i), UNK)
            if w == END:
                break
            if w in (PAD, START):
                continue
            words.append(w)
        return " ".join(words)

    def decode_batch(self, ids: np.ndarray) -> List[str]:
        return [self.decode(row) for row in np.asarray(ids)]
