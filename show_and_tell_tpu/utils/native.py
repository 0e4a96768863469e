"""Shared ctypes loader for the optional C++ components in ``csrc/``.

Single source for the probe policy used by the METEOR scorer, the PTB
tokenizer and the batch image decoder:

- positive results are cached per .so (one ``CDLL`` ever);
- negative results are NOT latched — the .so may be built after the first
  probe (tests build csrc on demand), and re-probing while it stays missing
  costs one ``os.path.exists``;
- any load/configure failure degrades to the pure-Python path silently.
"""

from __future__ import annotations

import ctypes
import os
from typing import Callable, Dict, Optional

_CSRC_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "csrc",
)

_LIBS: Dict[str, ctypes.CDLL] = {}  # soname -> loaded+configured lib


def load_csrc_lib(
    soname: str, configure: Optional[Callable[[ctypes.CDLL], None]] = None
) -> Optional[ctypes.CDLL]:
    """Load ``csrc/<soname>``, run ``configure(lib)`` once (restype/argtypes
    setup, table pushes), and cache the result. Returns None when the .so is
    absent or fails to load/configure."""
    lib = _LIBS.get(soname)
    if lib is not None:
        return lib
    path = os.path.join(_CSRC_DIR, soname)
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
        if configure is not None:
            configure(lib)
    except Exception:
        return None
    _LIBS[soname] = lib
    return lib
