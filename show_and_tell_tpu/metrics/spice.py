"""SPICE — semantic propositional caption evaluation (optional).

The reference wrapper shells out to ``spice-1.0.jar`` plus the Stanford
scene-graph parser (spice.py:63-70) — but the main jar is **absent** from the
repo (only the 16 dependency jars ship, SURVEY.md §2.2), so SPICE is de facto
optional there: any attempt to run it fails. This module preserves that
contract explicitly: the same ``compute_score(gts, res)`` API, raising
``SpiceUnavailable`` (or returning a disabled marker when ``strict=False``)
with an actionable message, and a hook (``set_backend``) where a real
scene-graph scorer can be plugged in.

The eval orchestrator includes SPICE only when ``spice=True`` is requested
and a backend is present — matching the reference's effective behavior while
keeping the metric name in the advertised suite.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional


class SpiceUnavailable(RuntimeError):
    pass


_BACKEND: Optional[Callable] = None


def set_backend(fn: Optional[Callable]) -> None:
    """Install a callable ``fn(gts, res) -> (score, scores)`` as the SPICE
    implementation (e.g. a local scene-graph parser service)."""
    global _BACKEND
    _BACKEND = fn


def cached_backend(fn: Callable, cache_path: str) -> Callable:
    """Wrap a SPICE backend with a persistent per-image score cache — the
    equivalent of the Java scorer's LMDB parse cache (the reference wrapper
    allocates one at spice.py:53-58). Keyed by (hypothesis, sorted refs);
    only uncached images hit the expensive backend."""
    import hashlib
    import json
    import os

    def load() -> dict:
        if os.path.exists(cache_path):
            with open(cache_path) as f:
                return json.load(f)
        return {}

    def key(hypo: str, refs) -> str:
        blob = hypo + "\x00" + "\x00".join(sorted(refs))
        return hashlib.sha256(blob.encode()).hexdigest()

    def wrapped(gts, res):
        cache = load()
        ids = sorted(gts.keys())
        keys = {i: key(res[i][0], gts[i]) for i in ids}
        missing = [i for i in ids if keys[i] not in cache]
        if missing:
            sub_gts = {i: gts[i] for i in missing}
            sub_res = {i: res[i] for i in missing}
            _, scores = fn(sub_gts, sub_res)
            for i, s in zip(sorted(missing), scores):
                cache[keys[i]] = float(s)
            tmp = cache_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(cache, f)
            os.replace(tmp, cache_path)
        per_image = [cache[keys[i]] for i in ids]
        return float(sum(per_image) / max(len(per_image), 1)), per_image

    return wrapped


class Spice:
    def __init__(self, strict: bool = True):
        self.strict = strict

    def available(self) -> bool:
        return _BACKEND is not None

    def compute_score(self, gts: Dict, res: Dict):
        if _BACKEND is not None:
            return _BACKEND(gts, res)
        msg = (
            "SPICE backend not installed: the reference repo itself ships only "
            "the dependency jars, not spice-1.0.jar (pycocoevalcap/spice/spice.py:12), "
            "so SPICE never ran there either. Install a backend via "
            "show_and_tell_tpu.metrics.spice.set_backend()."
        )
        if self.strict:
            raise SpiceUnavailable(msg)
        return None, None

    def method(self):
        return "SPICE"
