"""Native (C++) components must agree exactly with their Python reference
implementations. Builds csrc/ on demand when a toolchain is present."""

import os
import subprocess

import pytest

CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "csrc")


def _ensure_built(lib: str) -> bool:
    path = os.path.join(CSRC, lib)
    if os.path.exists(path):
        return True
    try:
        subprocess.run(["make", "-C", CSRC], check=True, capture_output=True)
    except Exception:
        return False
    return os.path.exists(path)


CORPUS = [
    "A man riding a horse on a beach.",
    "Two dogs, running fast!",
    "He doesn't like it; she does.",
    "The man's hat (red) is big.",
    'She said "hello" loudly.',
    "It's 3:45 and 1,000 people are here...",
    "they're we've I'll you'd I'm",
    "UPPER case AND MiXeD",
    "trailing spaces   ",
    "",
    "unicode café naïve",  # non-ascii chars dropped
    "a -- b - c",
    "what?!",
    "100% sure @ home #tag & more",
]


def test_cpp_tokenizer_matches_python():
    if not _ensure_built("libptb_tokenizer.so"):
        pytest.skip("no C++ toolchain")
    from show_and_tell_tpu.metrics import tokenizer as tk

    assert tk._cpp_tokenizer_available()
    for text in CORPUS:
        assert tk._cpp_tokenize(text) == tk.tokenize_caption(text), text


def test_cpp_tokenizer_fuzz_differential():
    """Randomized differential: the C++ tokenizer must agree with the
    Python reference on arbitrary caption-shaped text, not just the
    curated corpus — random words, contractions, punctuation runs,
    numbers, quotes, parentheses and non-ASCII bytes."""
    if not _ensure_built("libptb_tokenizer.so"):
        pytest.skip("no C++ toolchain")
    import random

    from show_and_tell_tpu.metrics import tokenizer as tk

    rng = random.Random(0xC0FFEE)
    words = (
        "a the man dog woman horse riding on beach big red it's doesn't "
        "can't we've I'll mr. dr. u.s. 3:45 1,000 100% half-baked "
        "well-known naïve café — … ... -- ?! .. '"
    ).split()
    punct = list(".,;:!?()[]{}\"'`-/&#@%$*")
    for case in range(2000):
        n = rng.randint(0, 12)
        parts = []
        for _ in range(n):
            r = rng.random()
            if r < 0.6:
                parts.append(rng.choice(words))
            elif r < 0.8:
                parts.append(rng.choice(punct))
            elif r < 0.9:
                parts.append(rng.choice(words) + rng.choice(punct))
            else:
                parts.append(
                    "".join(rng.choice(punct + words) for _ in range(3))
                )
        text = (" " * rng.randint(1, 2)).join(parts)
        assert tk._cpp_tokenize(text) == tk.tokenize_caption(text), (
            case, repr(text)
        )


def test_cpp_meteor_matches_python():
    if not _ensure_built("libmeteor.so"):
        pytest.skip("no C++ toolchain")
    from show_and_tell_tpu.metrics import meteor as m

    assert m._cpp_available()
    pairs = [
        ("a man rides a horse", ["a man rides a horse"]),
        ("a man rides a horse", ["a man is riding a horse", "man on horse"]),
        ("dog running", ["dog runs"]),
        ("horse a rides man a", ["a man rides a horse"]),
        ("completely unrelated words", ["a man rides a horse"]),
        ("", ["a man"]),
        ("the cat sat", ["the cat sat on the mat"]),
        # synonym-stage coverage (shared embedded table)
        ("a large dog runs", ["a big dog is running"]),
        ("a guy on a bike", ["a man on a bicycle"]),
        ("a gray couch", ["a grey sofa"]),
        ("kids jumping", ["children leaping"]),
    ]
    for hyp, refs in pairs:
        py = m.meteor_sentence(hyp, refs)
        cpp = m._cpp_meteor_sentence(hyp, refs)
        assert cpp == pytest.approx(py, abs=1e-6), (hyp, refs, py, cpp)


def test_cpp_meteor_resolver_randomized_differential():
    """The alignment resolver (beam search) is mirrored line-for-line in C++;
    pin bit-equality over randomized sentence pairs that exercise duplicate
    words, multi-module candidates, and multi-reference max."""
    if not _ensure_built("libmeteor.so"):
        pytest.skip("no C++ toolchain")
    import random

    from show_and_tell_tpu.metrics import meteor as m

    vocab = [
        "a", "the", "man", "dog", "cat", "big", "large", "running", "run",
        "runs", "horse", "rides", "riding", "beach", "on", "in", "grass",
        "two", "kids", "children", "bike", "bicycle", "guy", "sofa", "couch",
    ]
    rng = random.Random(0)
    for _ in range(400):
        hyp = " ".join(rng.choices(vocab, k=rng.randint(1, 12)))
        refs = [
            " ".join(rng.choices(vocab, k=rng.randint(1, 14)))
            for _ in range(rng.randint(1, 3))
        ]
        py = m.meteor_sentence(hyp, refs)
        cpp = m._cpp_meteor_sentence(hyp, refs)
        assert cpp == pytest.approx(py, abs=1e-12), (hyp, refs, py, cpp)


def test_cpp_porter_matches_python():
    if not _ensure_built("libmeteor.so"):
        pytest.skip("no C++ toolchain")
    from show_and_tell_tpu.metrics import meteor as m

    words = [
        "running", "caresses", "ponies", "cats", "relational", "hopping",
        "agreed", "plastered", "motoring", "sing", "conflated", "troubled",
        "sized", "hissing", "fizzed", "failing", "filing", "happy", "sky",
        "generalization", "oscillators", "horse", "riding", "rides",
    ]
    for w in words:
        assert m._cpp_stem(w) == m.porter_stem(w), w


def test_native_image_loader_matches_pil(tmp_path):
    if not _ensure_built("libimage_loader.so"):
        pytest.skip("no C++ toolchain / image libs")
    import numpy as np
    from PIL import Image

    from show_and_tell_tpu.data import pipeline as pl

    assert pl._native_available()
    rng = np.random.default_rng(0)
    paths = []
    # png same-size (exact match), jpeg same-size (exact: no resample), gray png
    arr = (rng.random((256, 256, 3)) * 255).astype(np.uint8)
    p1 = str(tmp_path / "a.png"); Image.fromarray(arr).save(p1); paths.append(p1)
    p2 = str(tmp_path / "b.jpg"); Image.fromarray(arr).save(p2, quality=95); paths.append(p2)
    g = (rng.random((100, 80)) * 255).astype(np.uint8)
    p3 = str(tmp_path / "g.png"); Image.fromarray(g).save(p3); paths.append(p3)

    imgs, ok = pl._native_load_batch(paths, 256, 2)
    assert ok.all()
    np.testing.assert_array_equal(imgs[0], pl._load_image(p1, 256))
    # JPEG decode is not bit-specified across decoder builds (system
    # libjpeg.so.62 vs Pillow's bundled turbo): allow +-1 LSB, PNG stays exact
    diff = np.abs(
        imgs[1].astype(np.int16) - pl._load_image(p2, 256).astype(np.int16)
    )
    assert diff.max() <= 1, diff.max()
    # grayscale promoted to RGB, resized: channels equal
    assert imgs[2].shape == (256, 256, 3)
    np.testing.assert_array_equal(imgs[2][..., 0], imgs[2][..., 1])

    # failure slot: zero-filled, flagged
    imgs2, ok2 = pl._native_load_batch([str(tmp_path / "nope.jpg"), p1], 64, 1)
    assert ok2.tolist() == [False, True]
    assert imgs2[0].sum() == 0


def test_loader_native_decode_matches_pil(tmp_path):
    if not _ensure_built("libimage_loader.so"):
        pytest.skip("no C++ toolchain / image libs")
    import numpy as np
    from PIL import Image

    from show_and_tell_tpu.data.dataset import CocoCaptionDataset
    from show_and_tell_tpu.data.pipeline import Loader
    from show_and_tell_tpu.utils.vocab import Vocabulary

    recs = []
    for i in range(4):
        p = str(tmp_path / f"i{i}.png")
        Image.fromarray(
            (np.random.default_rng(i).random((256, 256, 3)) * 255).astype(np.uint8)
        ).save(p)
        recs.append(
            {"split": "train", "imgid": i, "cocoid": i, "file_path": p,
             "final_caption": ["w"], "sentids": i}
        )
    ds = CocoCaptionDataset(recs, Vocabulary.from_words(["w"]), num_buckets=1)
    # default (None) = auto-native when built; force each path explicitly
    b_native = next(iter(Loader(ds, batch_size=4, shuffle=False, native_decode=True)))
    b_pil = next(iter(Loader(ds, batch_size=4, shuffle=False, native_decode=False)))
    np.testing.assert_array_equal(b_native["images"], b_pil["images"])


def test_cpp_meteor_whitespace_split_matches_python():
    """str.split() parity: the C++ scorer must treat ANY whitespace as a
    separator, not just ' ' — a tab-joined hypothesis used to score 0.0 on
    the C++ path while Python matched it."""
    from show_and_tell_tpu.metrics import meteor

    if not meteor._cpp_available():
        pytest.skip("libmeteor.so not built")
    meteor._cpp_sync_tables()
    cases = [
        ("man\tbike", ["man bike"]),
        ("a\ndog  runs\r\nfast", ["a dog runs fast"]),
        ("\t leading and trailing \n", ["leading and trailing"]),
        ("man\u00a0bike", ["man bike"]),  # Unicode NBSP: str.split() splits it
    ]
    for hyp, refs in cases:
        py = meteor.meteor_sentence(hyp, refs)
        cpp = meteor._cpp_meteor_sentence(hyp, refs)
        assert abs(py - cpp) < 1e-12, (hyp, py, cpp)


def test_spice_hash_seed_deterministic_and_maximal():
    """SPICE tuple matching is a maximum bipartite matching over sorted
    lists: the score may not depend on set iteration order, and a candidate
    with one partner must not lose it to one that had alternatives."""
    from show_and_tell_tpu.metrics.scene_graph import spice_backend

    # 'bike' matches both refs (exact + synonym), 'bicycle' only 'bike':
    # maximum matching pairs bike->motorcycle, bicycle->bike => F1 = 1.0
    score, _ = spice_backend(
        {1: ["a bike and a motorcycle"]}, {1: ["a bicycle and a bike"]}
    )
    assert score == 1.0


def test_cpp_cider_matches_python_bitwise():
    """csrc/cider.cpp reproduces the Python scorer's float math in the same
    operation order — scores must be BIT-equal (the same gate the Python
    scorer passes against the vendored reference)."""
    if not _ensure_built("libcider.so"):
        pytest.skip("no C++ toolchain")
    import random

    import numpy as np

    from show_and_tell_tpu.metrics import cider as cmod

    assert cmod._cpp_available()
    random.seed(3)
    words = ["a", "the", "man", "dog", "rides", "runs", "on", "big", "red",
             "horse", "park", "it's", "12", "z"]
    orig = cmod._cpp_available
    try:
        for _ in range(10):
            n = random.randint(2, 40)
            gts = {
                i: [" ".join(random.choices(words, k=random.randint(2, 12)))
                    for _ in range(random.randint(1, 5))]
                for i in range(n)
            }
            res = {i: [" ".join(random.choices(words, k=random.randint(1, 12)))]
                   for i in range(n)}
            cmod._cpp_available = orig
            c_cpp, s_cpp = cmod.Cider().compute_score(gts, res)
            cmod._cpp_available = lambda: False
            c_py, s_py = cmod.Cider().compute_score(gts, res)
            assert c_cpp == c_py
            np.testing.assert_array_equal(s_cpp, s_py)
    finally:
        cmod._cpp_available = orig


@pytest.mark.parametrize("lib,mod_name", [
    ("librouge.so", "rouge"), ("libbleu.so", "bleu"),
])
def test_cpp_scorers_match_python_bitwise(lib, mod_name):
    """csrc/{rouge,bleu}.cpp reproduce their Python scorers' float chains in
    the same operation order — bit-equal corpus AND per-image scores."""
    if not _ensure_built(lib):
        pytest.skip("no C++ toolchain")
    import importlib
    import random

    import numpy as np

    mod = importlib.import_module(f"show_and_tell_tpu.metrics.{mod_name}")
    assert mod._cpp_available()
    Scorer = mod.Rouge if mod_name == "rouge" else (lambda: mod.Bleu(4))
    random.seed(5)
    words = ["a", "the", "man", "dog", "rides", "on", "big", "horse", "12"]
    orig = mod._cpp_available
    try:
        for _ in range(10):
            n = random.randint(1, 40)
            gts = {
                i: [" ".join(random.choices(words, k=random.randint(1, 12)))
                    for _ in range(random.randint(1, 5))]
                for i in range(n)
            }
            res = {i: [" ".join(random.choices(words, k=random.randint(0, 12)))]
                   for i in range(n)}
            mod._cpp_available = orig
            a = Scorer().compute_score(gts, res)
            mod._cpp_available = lambda: False
            b = Scorer().compute_score(gts, res)
            assert a[0] == b[0]
            np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
    finally:
        mod._cpp_available = orig


def test_cpp_tokenizer_opt_in_matches_default():
    """The C++ tokenizer is a measured-slower opt-in (std::regex loses 2x
    to CPython re — see PTBTokenizer docstring): both paths must produce
    identical output through the wrapper API."""
    if not _ensure_built("libptb_tokenizer.so"):
        pytest.skip("no C++ toolchain")
    from show_and_tell_tpu.metrics.tokenizer import PTBTokenizer

    corpus = {1: [{"caption": c} for c in CORPUS]}
    tk = PTBTokenizer()
    assert tk.tokenize(corpus) == tk.tokenize(corpus, use_cpp=True)
