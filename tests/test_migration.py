"""Migration-path tests: reference artifacts load without conversion glue.

A reference user arrives with three artifacts (see docs/MIGRATION.md):

- ``vocab.pkl``   — pickled Vocabulary (preprocess.py:136)
- ``data.json``   — one record per caption (preprocess.py:109-133)
- ``model-best.pth`` — torch state_dict (train.py:191-196; covered by
  tests/test_torch_import.py)

These tests pin the first two: a data.json written EXACTLY the way the
reference writes it (same keys incl. the extra ``sentids``, the shared-dict
``.copy()`` idiom, ascending length sort) feeds our dataset directly, and the
index assignment carried over from vocab.pkl round-trips token-for-token.
"""

from __future__ import annotations

import json
import pickle

import numpy as np

from show_and_tell_tpu.data.dataset import CocoCaptionDataset
from show_and_tell_tpu.utils.vocab import Vocabulary


class _RefVocab:  # attribute shape of the reference class (preprocess.py:11-29)
    pass


def _write_reference_artifacts(tmp_path):
    """Emit vocab.pkl + data.json the way preprocess.py:104-137 does."""
    words = ["<pad>", "<start>", "<end>", "<unk>",
             "a", "man", "riding", "horse", "dog", "on", "the", "beach"]
    vb = _RefVocab()
    vb.word2idx = {w: i for i, w in enumerate(words)}
    vb.idx2word = {i: w for i, w in enumerate(words)}
    vb.idx = len(words)
    pkl = str(tmp_path / "vocab.pkl")
    data = pickle.dumps(vb, 2).replace(b"tests.test_migration", b"preprocess")
    with open(pkl, "wb") as f:
        f.write(data)

    # records: the reference reuses ONE dict per image and .copy()s it per
    # sentence (preprocess.py:116-128), then sorts ascending by caption
    # length (preprocess.py:133). Reproduce that construction literally.
    images = [
        {"split": "train", "imgid": 0, "cocoid": 100,
         "file_path": "data/train2014/COCO_0.jpg",
         "sentences": [["a", "man", "riding", "a", "horse"],
                       ["a", "dog", "on", "the", "beach"]],
         "sentids": [10, 11]},
        {"split": "val", "imgid": 1, "cocoid": 200,
         "file_path": "data/val2014/COCO_1.jpg",
         "sentences": [["a", "horse"]],
         "sentids": [20]},
    ]
    out = []
    for img in images:
        out_img = {}
        out_img["split"] = img["split"]
        out_img["imgid"] = img["imgid"]
        out_img["cocoid"] = img["cocoid"]
        out_img["file_path"] = img["file_path"]
        for i, tokens in enumerate(img["sentences"]):
            out_img["final_caption"] = tokens
            out_img["sentids"] = img["sentids"][i]
            out.append(out_img.copy())
    out.sort(key=lambda x: len(x["final_caption"]))
    dj = str(tmp_path / "data.json")
    with open(dj, "w") as f:
        json.dump(out, f)
    return pkl, dj, words


def test_reference_data_json_loads_directly(tmp_path):
    pkl, dj, words = _write_reference_artifacts(tmp_path)
    vocab = Vocabulary.from_reference_pickle(pkl)
    ds = CocoCaptionDataset(dj, vocab, split="train", num_buckets=2)
    assert len(ds) == 2  # the val record is filtered out (data_loader.py:21)

    batch = next(ds.iter_index_batches(batch_size=2, shuffle=False))
    caps, lens = ds.encode_indices(batch["indices"], batch["pad_len"])
    meta = ds.batch_meta(batch["indices"])
    assert meta["imgids"] == [0, 0]
    assert meta["cocoids"] == [100, 100]
    assert all(p == "data/train2014/COCO_0.jpg" for p in meta["paths"])

    # every encoded row decodes back to its original reference tokens
    originals = {tuple(r["final_caption"]) for r in ds.data}
    for row, n in zip(np.asarray(caps), np.asarray(lens)):
        toks = vocab.decode(row).split()
        assert tuple(toks) in originals
        assert n == len(toks) + 2  # <start> + tokens + <end>


def test_imported_vocab_preserves_reference_indices(tmp_path):
    """Embedding/logit rows of a migrated checkpoint are keyed by the
    ORIGINAL indices — the imported vocab must reproduce them exactly."""
    pkl, _, words = _write_reference_artifacts(tmp_path)
    vocab = Vocabulary.from_reference_pickle(pkl)
    for i, w in enumerate(words):
        assert vocab(w) == i
    assert vocab("zebra") == vocab("<unk>")


def test_reference_val_split_eval_metadata(tmp_path):
    """The val path keeps cocoid (pycocoevalcap keying, eval.py:30-43)."""
    pkl, dj, _ = _write_reference_artifacts(tmp_path)
    vocab = Vocabulary.from_reference_pickle(pkl)
    ds = CocoCaptionDataset(dj, vocab, split="val", num_buckets=1)
    assert len(ds) == 1
    batch = next(ds.iter_index_batches(batch_size=1, shuffle=False))
    assert ds.batch_meta(batch["indices"])["cocoids"] == [200]


def test_vocab_pickle_bytes_keyed_dict_payload(tmp_path):
    """A fork's vocab.pkl pickled as vocab.__dict__ with py2-str (bytes)
    attribute names must load via the b'word2idx' path instead of being
    misread as a bare word->idx map (review fix)."""
    words = ["<pad>", "<start>", "<end>", "<unk>", "a", "dog"]
    payload = {
        b"word2idx": {w.encode(): i for i, w in enumerate(words)},
        b"idx2word": {i: w.encode() for i, w in enumerate(words)},
        b"idx": len(words),
    }
    pkl = str(tmp_path / "vocab_dict.pkl")
    with open(pkl, "wb") as f:
        pickle.dump(payload, f, 2)
    v = Vocabulary.from_reference_pickle(pkl)
    assert len(v) == len(words)
    assert v("dog") == 5 and v.decode([4, 5]) == "a dog"


def test_vocab_pickle_empty_and_junk_messages(tmp_path):
    """Empty vocab and non-integer values get specific errors, not a
    TypeError from deep inside the dict comprehension."""
    import pytest

    p1 = str(tmp_path / "empty.pkl")
    with open(p1, "wb") as f:
        pickle.dump({"word2idx": {}}, f, 2)
    with pytest.raises(ValueError, match="empty vocabulary"):
        Vocabulary.from_reference_pickle(p1)

    p2 = str(tmp_path / "junk.pkl")
    with open(p2, "wb") as f:
        pickle.dump({"a": {"nested": 1}}, f, 2)
    with pytest.raises(ValueError, match="not integer indices"):
        Vocabulary.from_reference_pickle(p2)


def test_vocab_pickle_never_executes_pickled_callables(tmp_path):
    """A malicious vocab.pkl naming an importable callable (os.system)
    must NOT execute it: find_class resolves only a tiny data-transform
    whitelist, everything else becomes an inert bag (review fix — the
    default-resolver-first fallback was verified to run shell commands)."""
    import pytest

    marker = tmp_path / "pwned"
    payload = (
        b"cos\nsystem\n(S'touch " + str(marker).encode() + b"'\ntR."
    )
    pkl = tmp_path / "evil.pkl"
    pkl.write_bytes(payload)
    with pytest.raises(ValueError):
        Vocabulary.from_reference_pickle(str(pkl))
    assert not marker.exists()


def test_vocab_load_validates_special_tokens(tmp_path):
    """A hand-built vocab.json whose word list does not lead with the
    special tokens must raise instead of silently mis-encoding (review
    fix: encode/decode hardwire PAD/START/END/UNK ids)."""
    import json as _json

    import pytest

    p = tmp_path / "vocab.json"
    p.write_text(_json.dumps({"words": ["a", "dog", "<pad>", "<start>"]}))
    with pytest.raises(ValueError, match="special token"):
        Vocabulary.load(str(p))
