"""Persistent XLA compilation cache.

First compilation of the big programs (VGG trunk + scan + beam) costs tens
of seconds; enabling JAX's persistent cache makes every later process reuse
the compiled executables. Called by the CLIs and benchmarks; safe to call
multiple times and harmless where unsupported.
"""

from __future__ import annotations

import logging
import os

log = logging.getLogger(__name__)

DEFAULT_DIR = os.environ.get("SAT_COMPILE_CACHE", "/tmp/sat_jax_cache")


def enable(path: str = DEFAULT_DIR) -> bool:
    try:
        import jax

        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return True
    except Exception as e:  # old jax / read-only fs: just skip
        log.debug("compilation cache not enabled: %s", e)
        return False
