"""Greedy decoding, fully on device.

Mirrors the reference's greedy ``sample`` loops (models.py:56-67 /
model2.py:91-111): a fixed ``max_len``-step budget (20 in the reference),
argmax each step, embedding fed back. Host-side truncation at ``<end>``
happens in the eval driver (eval.py:105-109), as in the reference.

Two execution modes, identical decoded captions:
- ``early_stop=True`` (default): a ``lax.while_loop`` that exits as soon as
  every sequence has emitted ``<end>`` — on trained models captions finish
  in ~8-12 of the 20 budgeted steps, so this nearly halves decode latency.
  Positions after ``<end>`` hold ``<pad>``.
- ``early_stop=False``: a fixed-trip ``lax.scan`` (the reference's exact
  shape; steps after ``<end>`` emit argmax tokens that the host truncation
  discards).

Works with both model families via the step interface:
- ``first_logits`` given (Show-and-Tell): the image-feature step already
  produced predictions (models.py:58-62); its argmax is token 0.
- ``first_logits`` None (Show-Attend-Tell): decoding starts from
  ``<start>``.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from show_and_tell_tpu.utils.vocab import END_ID, PAD_ID, START_ID


def greedy_decode(
    step_fn: Callable[[Any, jax.Array], Tuple[Any, jax.Array]],
    carry: Any,
    batch: int,
    max_len: int = 20,
    first_logits: Optional[jax.Array] = None,
    early_stop: bool = True,
) -> jax.Array:
    """Returns sampled ids ``[batch, max_len]`` (int32)."""
    if first_logits is not None:
        tok0 = jnp.argmax(first_logits, axis=-1).astype(jnp.int32)
        start_pos = 1
        prev = tok0
        finished0 = tok0 == END_ID
        out0 = jnp.full((batch, max_len), PAD_ID, jnp.int32).at[:, 0].set(tok0)
    else:
        start_pos = 0
        prev = jnp.full((batch,), START_ID, jnp.int32)
        finished0 = jnp.zeros((batch,), bool)
        out0 = jnp.full((batch, max_len), PAD_ID, jnp.int32)

    if not early_stop:
        def step(state, _):
            carry, prev = state
            carry, logits = step_fn(carry, prev)
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return (carry, tok), tok

        steps = max_len - start_pos
        if steps <= 0:
            return out0
        _, toks = jax.lax.scan(step, (carry, prev), None, length=steps)
        toks = jnp.swapaxes(toks, 0, 1)
        if start_pos:
            return out0.at[:, 1:].set(toks)
        return toks

    def cond(state):
        _, _, t, finished, _ = state
        return (t < max_len) & ~jnp.all(finished)

    def body(state):
        carry, prev, t, finished, out = state
        carry, logits = step_fn(carry, prev)
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        tok = jnp.where(finished, PAD_ID, tok)
        out = jax.lax.dynamic_update_slice_in_dim(out, tok[:, None], t, axis=1)
        finished = finished | (tok == END_ID)
        return carry, tok, t + 1, finished, out

    state = (carry, prev, jnp.asarray(start_pos, jnp.int32), finished0, out0)
    _, _, _, _, out = jax.lax.while_loop(cond, body, state)
    return out
