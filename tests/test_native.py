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
    ]
    for hyp, refs in pairs:
        py = m.meteor_sentence(hyp, refs)
        cpp = m._cpp_meteor_sentence(hyp, refs)
        assert cpp == pytest.approx(py, abs=1e-6), (hyp, refs, py, cpp)


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
