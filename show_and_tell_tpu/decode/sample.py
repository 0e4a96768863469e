"""Stochastic decoding: temperature / top-k / top-p sampling, on device.

Beyond the reference's surface (it has only greedy, eval.py:99 /
models.py:56-67) — standard serving capability for caption diversity. Same
step interface as greedy/beam; one ``lax.scan``, one PRNG key. All three
knobs are trace-time constants (static shapes / compiled filtering), so
callers key their jit caches on them (serve.Captioner._fn).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from show_and_tell_tpu.utils.vocab import START_ID

NEG_INF = -1.0e9


def _sample_from_logits(
    rng, logits, temperature: float, top_k: int, top_p: float = 1.0
):
    logits = logits.astype(jnp.float32)
    if temperature != 1.0:
        logits = logits / max(temperature, 1e-6)
    if top_k > 0:
        kth = jnp.sort(logits, axis=-1)[:, -top_k][:, None]
        logits = jnp.where(logits < kth, NEG_INF, logits)
    if 0.0 < top_p < 1.0:
        # nucleus filter (after top-k, the usual composition): keep the
        # smallest descending-prob prefix whose mass reaches top_p. The
        # exclusive cumsum keeps the top-1 token even when p(top1) > top_p.
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        exclusive = jnp.cumsum(probs, axis=-1) - probs
        keep = exclusive < top_p
        min_kept = jnp.min(
            jnp.where(keep, sorted_logits, jnp.inf), axis=-1, keepdims=True
        )
        logits = jnp.where(logits < min_kept, NEG_INF, logits)
    return jax.random.categorical(rng, logits, axis=-1).astype(jnp.int32)


def sample_decode(
    step_fn: Callable[[Any, jax.Array], Tuple[Any, jax.Array]],
    carry: Any,
    batch: int,
    rng: jax.Array,
    max_len: int = 20,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 1.0,
    first_logits: Optional[jax.Array] = None,
) -> jax.Array:
    """Returns sampled ids ``[batch, max_len]`` (int32)."""
    if first_logits is not None:
        rng, r0 = jax.random.split(rng)
        tok0 = _sample_from_logits(r0, first_logits, temperature, top_k, top_p)
        prev = tok0
        steps = max_len - 1
        head = [tok0]
    else:
        prev = jnp.full((batch,), START_ID, jnp.int32)
        steps = max_len
        head = []

    def step(state, r):
        carry, prev = state
        carry, logits = step_fn(carry, prev)
        tok = _sample_from_logits(r, logits, temperature, top_k, top_p)
        return (carry, tok), tok

    if steps > 0:
        _, toks = jax.lax.scan(step, (carry, prev), jax.random.split(rng, steps))
        toks = jnp.swapaxes(toks, 0, 1)
    else:
        toks = jnp.zeros((batch, 0), jnp.int32)
    if head:
        toks = jnp.concatenate([head[0][:, None], toks], axis=1)
    return toks
