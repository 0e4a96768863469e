"""PTB tokenization + punctuation stripping, JVM-free.

The reference shells out to Stanford CoreNLP's PTBTokenizer jar per eval
(``java ... PTBTokenizer -preserveLines -lowerCase``, ptbtokenizer.py:28-30 —
and the jar isn't even shipped, ptbtokenizer.py:18). This is a native
reimplementation of the tokenizer behavior relevant to caption text, with
the identical output contract:

- lowercase, newline-flattened, ascii-filtered input
  (ptbtokenizer.py:38,45: ``.replace('\\n',' ')`` + ascii-ignore encode),
- Penn-Treebank splitting: terminal/clause punctuation separated,
  contractions split (``don't -> do n't``, ``man's -> man 's``), quotes
  normalised to `` \\`\\` ''  ``, brackets to -LRB-/-RRB-/-LCB-/-RCB-,
- the reference's post-hoc punctuation strip list applied verbatim
  (ptbtokenizer.py:21-22,64-65).

A C++ fast path (csrc/ptb_tokenizer.cpp via ctypes) handles large corpora;
this module is the reference implementation and fallback.

API contract identical to the reference class:
``PTBTokenizer().tokenize({id: [{'caption': str}, ...]}) -> {id: [str, ...]}``.
"""

from __future__ import annotations

import re
from typing import Dict, List

# ptbtokenizer.py:21-22 — removed *after* tokenization
PUNCTUATIONS = [
    "''", "'", "``", "`", "-LRB-", "-RRB-", "-LCB-", "-RCB-",
    ".", "?", "!", ",", ":", "-", "--", "...", ";",
]

_RULES = [
    # quotes
    (re.compile(r"^\""), r"`` "),
    (re.compile(r"(``)"), r" \1 "),
    (re.compile(r'([ (\[{<])"'), r"\1 `` "),
    # ellipsis before other punct handling
    (re.compile(r"\.\.\."), r" ... "),
    (re.compile(r"[;@#$%&]"), r" \g<0> "),
    # PTB lexical splits CoreNLP applies (cannot -> can not, etc.)
    (re.compile(r"\b(can)(not)\b"), r"\1 \2"),
    (re.compile(r"\b(gon|wan)(na)\b"), r"\1 \2"),
    (re.compile(r"\b(got|out)(ta)\b"), r"\1 \2"),
    (re.compile(r"\b(gim|lem)(me)\b"), r"\1 \2"),
    # final period (only before optional closers at end of string); the
    # two-char guard keeps sentence-final acronyms intact ("u.s." stays
    # one token, as CoreNLP's abbreviation lexicon does)
    (re.compile(r'(^|[^\.])([^\.\s])(\.)([\]\)}>"\']*)\s*$'), r"\1\2 \3\4 "),
    (re.compile(r"[?!]"), r" \g<0> "),
    (re.compile(r"[\]\[\(\)\{\}<>]"), r" \g<0> "),
    (re.compile(r"--"), r" -- "),
    # comma unless inside a number
    (re.compile(r"([^0-9]),"), r"\1 , "),
    (re.compile(r",([^0-9])"), r" , \1"),
    # colon unless inside time/ratio digits
    (re.compile(r"([^0-9]):"), r"\1 : "),
    (re.compile(r":([^0-9])"), r" : \1"),
    # closing quotes
    (re.compile(r'"'), r" '' "),
    (re.compile(r"(\S)('')"), r"\1 \2 "),
    # possessives and contractions
    (re.compile(r"([^' ])('[sS]|'[mM]|'[dD]|') "), r"\1 \2 "),
    (re.compile(r"([^' ])('ll|'re|'ve|n't|'LL|'RE|'VE|N'T) "), r"\1 \2 "),
]

_BRACKETS = {
    "(": "-LRB-", ")": "-RRB-", "{": "-LCB-", "}": "-RCB-",
    "[": "-LSB-", "]": "-RSB-",
}


def ptb_tokenize_line(line: str) -> List[str]:
    """PTB-tokenize one sentence (lowercased), before punctuation stripping."""
    s = line.encode("ascii", "ignore").decode().lower()
    s = " " + s.replace("\n", " ") + " "
    for pat, repl in _RULES:
        s = pat.sub(repl, s)
    toks = s.split()
    return [_BRACKETS.get(t, t) for t in toks]


def tokenize_caption(caption: str) -> str:
    """Tokenize + strip the reference punctuation list -> space-joined."""
    return " ".join(t for t in ptb_tokenize_line(caption) if t not in PUNCTUATIONS)


class PTBTokenizer:
    """Drop-in for the reference wrapper (ptbtokenizer.py:24-68).

    The Python path is the default: it is MEASURED 2x faster than the C++
    one (30k captions: 2.19s vs 4.36s — std::regex loses badly to CPython's
    C-implemented ``re``). The C++ tokenizer stays as a tested, bit-equal
    opt-in (``use_cpp=True``) — same policy as the Pallas kernels: don't
    ship the hand path where the baseline wins.
    """

    def tokenize(self, captions_for_image: Dict, use_cpp: bool = False) -> Dict:
        use_cpp = use_cpp and _cpp_tokenizer_available()
        out: Dict = {}
        for k, caps in captions_for_image.items():
            out[k] = [
                _cpp_tokenize(c["caption"]) if use_cpp else tokenize_caption(c["caption"])
                for c in caps
            ]
        return out


# --- optional C++ path (bit-equal, measured SLOWER — see PTBTokenizer) ------

_CPP_LIB = None


def _configure_cpp(lib) -> None:
    import ctypes

    lib.ptb_tokenize.restype = ctypes.c_void_p
    lib.ptb_tokenize.argtypes = [ctypes.c_char_p]
    lib.ptb_free.argtypes = [ctypes.c_void_p]


def _cpp_tokenizer_available() -> bool:
    global _CPP_LIB
    if _CPP_LIB is None:
        from show_and_tell_tpu.utils.native import load_csrc_lib

        _CPP_LIB = load_csrc_lib("libptb_tokenizer.so", _configure_cpp)
    return _CPP_LIB is not None


def _cpp_tokenize(caption: str) -> str:
    import ctypes

    ptr = _CPP_LIB.ptb_tokenize(caption.encode("ascii", "ignore"))
    try:
        return ctypes.cast(ptr, ctypes.c_char_p).value.decode()
    finally:
        _CPP_LIB.ptb_free(ptr)
