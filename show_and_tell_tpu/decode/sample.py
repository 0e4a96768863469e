"""Stochastic decoding: temperature / top-k sampling, fully on device.

Beyond the reference's surface (it has only greedy, eval.py:99 /
models.py:56-67) — standard serving capability for caption diversity. Same
step interface as greedy/beam; one ``lax.scan``, one PRNG key.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from show_and_tell_tpu.utils.vocab import START_ID

NEG_INF = -1.0e9


def _sample_from_logits(rng, logits, temperature: float, top_k: int):
    logits = logits.astype(jnp.float32)
    if temperature != 1.0:
        logits = logits / max(temperature, 1e-6)
    if top_k > 0:
        kth = jnp.sort(logits, axis=-1)[:, -top_k][:, None]
        logits = jnp.where(logits < kth, NEG_INF, logits)
    return jax.random.categorical(rng, logits, axis=-1).astype(jnp.int32)


def sample_decode(
    step_fn: Callable[[Any, jax.Array], Tuple[Any, jax.Array]],
    carry: Any,
    batch: int,
    rng: jax.Array,
    max_len: int = 20,
    temperature: float = 1.0,
    top_k: int = 0,
    first_logits: Optional[jax.Array] = None,
) -> jax.Array:
    """Returns sampled ids ``[batch, max_len]`` (int32)."""
    if first_logits is not None:
        rng, r0 = jax.random.split(rng)
        tok0 = _sample_from_logits(r0, first_logits, temperature, top_k)
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
        tok = _sample_from_logits(r, logits, temperature, top_k)
        return (carry, tok), tok

    if steps > 0:
        _, toks = jax.lax.scan(step, (carry, prev), jax.random.split(rng, steps))
        toks = jnp.swapaxes(toks, 0, 1)
    else:
        toks = jnp.zeros((batch, 0), jnp.int32)
    if head:
        toks = jnp.concatenate([head[0][:, None], toks], axis=1)
    return toks
