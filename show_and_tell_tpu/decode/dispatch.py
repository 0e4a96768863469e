"""Uniform decode dispatch over both model families.

The eval driver and the serving Captioner both need "features -> token ids"
under a decode mode; the model-specific differences (SAT pre-tiles beam
statics in its step closure, ShowTell lets ``beam_search`` tile its small
carry) live behind each model's ``decode_state`` method, so this is the one
place that maps a mode string onto the decode algorithms.

Trace-time constants: ``mode``, ``temperature``, ``top_k``, ``top_p``
(static filtering shapes) — callers jit around this function and key their
caches accordingly (serve.Captioner._fn).
"""

from __future__ import annotations

from typing import Optional

import jax

from show_and_tell_tpu.decode.beam import beam_search
from show_and_tell_tpu.decode.greedy import greedy_decode
from show_and_tell_tpu.decode.sample import sample_decode


def decode_ids(
    model,
    cfg,
    params,
    batch_stats,
    features: jax.Array,
    mode: str = "beam",
    rng: Optional[jax.Array] = None,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 1.0,
) -> jax.Array:
    """features [B, ...] -> ids [B, max_decode_len] via beam/greedy/sample."""
    B = features.shape[0]
    k = cfg.beam_size if mode == "beam" else 1
    step_fn, carry, first, tile = model.decode_state(
        params, batch_stats, features, beam_size=k
    )
    if mode == "beam":
        ids, _ = beam_search(
            step_fn, carry, B, beam_size=cfg.beam_size,
            max_len=cfg.max_decode_len, first_logits=first, tile=tile,
            length_penalty=cfg.length_penalty,
        )
        return ids
    if mode == "sample":
        return sample_decode(
            step_fn, carry, B, rng, cfg.max_decode_len,
            temperature=temperature, top_k=top_k, top_p=top_p,
            first_logits=first,
        )
    if mode != "greedy":
        raise ValueError(f"unknown decode mode {mode!r}")
    return greedy_decode(step_fn, carry, B, cfg.max_decode_len, first_logits=first)
