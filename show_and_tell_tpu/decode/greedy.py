"""Greedy decoding, fully on device as a ``lax.scan``.

Mirrors the reference's greedy ``sample`` loops (models.py:56-67 /
model2.py:91-111): a fixed ``max_len``-step loop (20 in the reference),
argmax each step, embedding fed back. Host-side truncation at ``<end>``
happens in the eval driver (eval.py:105-109), as in the reference; keeping
the shape static lets one compiled program serve every batch.

Works with both model families via the step interface:
- ``first_logits`` given (Show-and-Tell): the image-feature step already
  produced predictions (models.py:58-62); its argmax is token 0 and
  ``max_len - 1`` further steps run.
- ``first_logits`` None (Show-Attend-Tell): decoding starts by feeding
  ``<start>`` and all ``max_len`` steps run.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from show_and_tell_tpu.utils.vocab import START_ID


def greedy_decode(
    step_fn: Callable[[Any, jax.Array], Tuple[Any, jax.Array]],
    carry: Any,
    batch: int,
    max_len: int = 20,
    first_logits: Optional[jax.Array] = None,
) -> jax.Array:
    """Returns sampled ids ``[batch, max_len]`` (int32)."""
    if first_logits is not None:
        tok0 = jnp.argmax(first_logits, axis=-1).astype(jnp.int32)
        prev = tok0
        steps = max_len - 1
        head = [tok0]
    else:
        prev = jnp.full((batch,), START_ID, jnp.int32)
        steps = max_len
        head = []

    def step(state, _):
        carry, prev = state
        carry, logits = step_fn(carry, prev)
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return (carry, tok), tok

    if steps > 0:
        _, toks = jax.lax.scan(step, (carry, prev), None, length=steps)
        toks = jnp.swapaxes(toks, 0, 1)  # [B, steps]
    else:
        toks = jnp.zeros((batch, 0), jnp.int32)
    if head:
        toks = jnp.concatenate([head[0][:, None], toks], axis=1)
    return toks
