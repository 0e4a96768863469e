import numpy as np

from show_and_tell_tpu.utils.vocab import (
    END_ID,
    PAD_ID,
    START_ID,
    UNK_ID,
    Vocabulary,
)


def make_vocab():
    return Vocabulary.from_words(["a", "man", "riding", "horse"])


def test_special_token_order():
    # Exact order required by preprocess.py:75-78 of the reference.
    v = Vocabulary.with_special_tokens()
    assert v("<pad>") == 0 == PAD_ID
    assert v("<start>") == 1 == START_ID
    assert v("<end>") == 2 == END_ID
    assert v("<unk>") == 3 == UNK_ID
    assert len(v) == 4


def test_unk_fallback():
    v = make_vocab()
    assert v("zebra") == UNK_ID
    assert v("man") == 5


def test_encode_wraps_start_end():
    v = make_vocab()
    ids = v.encode(["a", "man"], max_len=8)
    assert ids.tolist() == [START_ID, 4, 5, END_ID, 0, 0, 0, 0]


def test_encode_truncation_keeps_end():
    v = make_vocab()
    ids = v.encode(["a", "man", "riding", "horse"], max_len=4)
    assert ids.tolist() == [START_ID, 4, 5, END_ID]


def test_encode_batch_lengths():
    v = make_vocab()
    ids, lengths = v.encode_batch([["a"], ["a", "man", "riding"]], max_len=6)
    assert ids.shape == (2, 6)
    assert lengths.tolist() == [3, 5]


def test_decode_truncates_at_end():
    v = make_vocab()
    # mirrors eval.py:101-111: stop at <end>
    assert v.decode([4, 5, END_ID, 6]) == "a man"
    assert v.decode([START_ID, 4, PAD_ID, 5]) == "a man"  # skips pad/start


def test_save_load_roundtrip(tmp_path):
    v = make_vocab()
    p = str(tmp_path / "vocab.json")
    v.save(p)
    v2 = Vocabulary.load(p)
    assert v2.word2idx == v.word2idx
    assert len(v2) == len(v)
    assert v2("horse") == v("horse")


class RefVocabulary:  # same attribute shape as the reference class
    pass


def _reference_style_pickle(tmp_path, words=None, bytes_keys=False):
    """Pickle a reference-shaped Vocabulary (preprocess.py:11-29) at protocol 2
    (py2's HIGHEST_PROTOCOL — what preprocess.py:136 wrote), with the module
    path rewritten to the reference's nonexistent ``preprocess`` module so the
    loader's find_class fallback is actually exercised."""
    import pickle

    obj = RefVocabulary()
    words = words or ["<pad>", "<start>", "<end>", "<unk>", "a", "man", "horse"]
    if bytes_keys:
        words = [w.encode() for w in words]
    obj.word2idx = {w: i for i, w in enumerate(words)}
    obj.idx2word = {i: w for i, w in enumerate(words)}
    obj.idx = len(words)
    data = pickle.dumps(obj, 2).replace(b"tests.test_vocab", b"preprocess")
    p = str(tmp_path / "vocab.pkl")
    with open(p, "wb") as f:
        f.write(data)
    return p


def test_from_reference_pickle(tmp_path):
    p = _reference_style_pickle(tmp_path)
    v = Vocabulary.from_reference_pickle(p)
    assert len(v) == 7
    assert v("<pad>") == PAD_ID and v("<unk>") == UNK_ID
    assert v("man") == 5 and v("zebra") == UNK_ID


def test_from_reference_pickle_bytes_keys(tmp_path):
    # py2-str payloads surface as bytes under some unpickle paths.
    p = _reference_style_pickle(
        tmp_path,
        words=["<pad>", "<start>", "<end>", "<unk>", "dog"],
        bytes_keys=True,
    )
    v = Vocabulary.from_reference_pickle(p)
    assert v("dog") == 4


def test_from_reference_pickle_bare_dict(tmp_path):
    import pickle

    p = str(tmp_path / "vocab_dict.pkl")
    words = ["<pad>", "<start>", "<end>", "<unk>", "cat"]
    with open(p, "wb") as f:
        pickle.dump({w: i for i, w in enumerate(words)}, f, 2)
    v = Vocabulary.from_reference_pickle(p)
    assert v("cat") == 4 and len(v) == 5


def test_from_reference_pickle_rejects_wrong_special_order(tmp_path):
    import pickle

    import pytest

    p = str(tmp_path / "vocab_bad.pkl")
    words = ["<start>", "<pad>", "<end>", "<unk>"]  # swapped
    with open(p, "wb") as f:
        pickle.dump({w: i for i, w in enumerate(words)}, f, 2)
    with pytest.raises(ValueError, match="special token"):
        Vocabulary.from_reference_pickle(p)


def test_import_vocab_cli(tmp_path):
    from show_and_tell_tpu.cli.import_vocab import main

    pkl = _reference_style_pickle(tmp_path)
    out = str(tmp_path / "vocab.json")
    assert main([pkl, out]) == 0
    v = Vocabulary.load(out)
    assert v("horse") == 6


def test_keychain_determinism():
    from show_and_tell_tpu.utils.rng import KeyChain

    a = KeyChain(123)
    b = KeyChain(123)
    assert np.array_equal(a.key("dropout", 5), b.key("dropout", 5))
    assert not np.array_equal(a.key("dropout", 5), a.key("dropout", 6))
    assert a.numpy_rng("shuffle", 1).integers(1 << 30) == b.numpy_rng("shuffle", 1).integers(1 << 30)
