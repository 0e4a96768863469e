"""Batched on-device beam search with static shapes.

The reference *declares* beam search and ships an empty stub
(model2.py:113-114: ``sample_beam`` with a docstring and no body); this is
the real implementation, designed TPU-first:

- All B images decode simultaneously with k beams each: every tensor is
  ``[B, k, ...]`` (or flattened ``[B*k, ...]`` through the model step), so
  the per-step LSTM/attention work is one big batched matmul on the MXU —
  never a per-beam Python loop.
- The whole search is a single ``lax.scan`` of ``max_len`` steps; candidate
  expansion is a top-k over the ``k*V`` joint continuation scores.
- Finished beams (emitted ``<end>``) are frozen: their only continuation is
  ``<pad>`` at log-prob 0, so their cumulative score is preserved while
  shapes stay static.
- Optional Google-NMT-style length penalty ``((5+len)/6)**alpha``; the
  default ``alpha=0`` reproduces pure sum-of-log-probs ranking.

Interface matches ``greedy_decode``: a step function + carry, with
``first_logits`` for the Show-and-Tell image-feature step.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from show_and_tell_tpu.utils.vocab import END_ID, PAD_ID, START_ID

NEG_INF = -1.0e9


def _tile_beams(tree: Any, k: int) -> Any:
    """[B, ...] -> [B*k, ...] with each row repeated k times (beam-major)."""
    return jax.tree.map(
        lambda x: jnp.repeat(x, k, axis=0) if hasattr(x, "ndim") and x.ndim >= 1 else x,
        tree,
    )


def _gather_beams(tree: Any, parent: jax.Array, B: int, k: int) -> Any:
    """Reorder flat [B*k, ...] leaves by parent beam indices [B, k]."""
    flat_idx = (jnp.arange(B)[:, None] * k + parent).reshape(-1)  # [B*k]

    def gather(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == B * k:
            return jnp.take(x, flat_idx, axis=0)
        return x

    return jax.tree.map(gather, tree)


def _length_penalty(lengths: jax.Array, alpha: float) -> jax.Array:
    if alpha == 0.0:
        return jnp.ones_like(lengths, dtype=jnp.float32)
    return jnp.power((5.0 + lengths.astype(jnp.float32)) / 6.0, alpha)


def beam_search(
    step_fn: Callable[[Any, jax.Array], Tuple[Any, jax.Array]],
    carry: Any,
    batch: int,
    beam_size: int = 3,
    max_len: int = 20,
    length_penalty: float = 0.0,
    first_logits: Optional[jax.Array] = None,
    tile: bool = True,
    return_all: bool = False,
    early_stop: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Returns ``(ids [B, max_len], scores [B])`` for the best beam, or —
    with ``return_all`` — the full n-best ``(ids [B, k, max_len],
    scores [B, k])`` sorted best-first. ``early_stop`` (default) exits the
    step loop once every beam of every image has emitted ``<end>``;
    identical results to the fixed-trip scan.

    ``carry`` holds per-image state ``[B, ...]`` and is tiled to
    ``[B*k, ...]`` internally; pass ``tile=False`` when the caller already
    produced ``[B*k, ...]`` state (models pre-tile their large static
    tensors into the step closure so only the cheap recurrent state is
    gathered each step). ``step_fn`` must accept the flat ``[B*k]`` token
    batch.
    """
    B, k = batch, beam_size
    if tile:
        carry = _tile_beams(carry, k)

    if first_logits is not None:
        # Image-feature step already ran (Show-and-Tell): its logits seed the
        # beams directly.
        logits0 = jnp.repeat(first_logits, k, axis=0)  # [B*k, V]
    else:
        carry, logits0 = step_fn(carry, jnp.full((B * k,), START_ID, jnp.int32))

    V = logits0.shape[-1]
    logp0 = jax.nn.log_softmax(logits0.astype(jnp.float32)).reshape(B, k, V)
    # Step 0: all beams are identical — mask beams 1..k-1 so top-k picks k
    # distinct first tokens from beam 0.
    beam_mask = jnp.where(jnp.arange(k)[None, :, None] == 0, 0.0, NEG_INF)
    cand = logp0 + beam_mask  # [B, k, V]
    scores, flat = jax.lax.top_k(cand.reshape(B, k * V), k)  # [B, k]
    parent = flat // V
    tok = (flat % V).astype(jnp.int32)
    carry = _gather_beams(carry, parent, B, k)
    finished = tok == END_ID
    tokens = jnp.full((B, k, max_len), PAD_ID, jnp.int32).at[:, :, 0].set(tok)

    def scan_step(state, t):
        state = _step_body(state, t)
        return state, None

    def _step_body(state, t):
        carry, scores, finished, tokens, prev_tok = state
        carry, logits = step_fn(carry, prev_tok.reshape(B * k))
        logp = jax.nn.log_softmax(logits.astype(jnp.float32)).reshape(B, k, V)
        # Finished beams may only emit <pad> at log-prob 0 (score frozen).
        pad_only = jnp.full((V,), NEG_INF).at[PAD_ID].set(0.0)
        logp = jnp.where(finished[:, :, None], pad_only[None, None, :], logp)
        cand = scores[:, :, None] + logp  # [B, k, V]
        new_scores, flat = jax.lax.top_k(cand.reshape(B, k * V), k)
        parent = flat // V
        tok = (flat % V).astype(jnp.int32)
        carry = _gather_beams(carry, parent, B, k)
        # Reorder histories to follow their parents, then append.
        tokens = jnp.take_along_axis(tokens, parent[:, :, None], axis=1)
        finished = jnp.take_along_axis(finished, parent, axis=1)
        col = jnp.where(finished, PAD_ID, tok)
        tokens = jax.lax.dynamic_update_slice_in_dim(
            tokens, col[:, :, None], t, axis=2
        )
        finished = finished | (tok == END_ID)
        return (carry, new_scores, finished, tokens, tok)

    state = (carry, scores, finished, tokens, tok)
    if max_len > 1:
        if early_stop:
            # Exit as soon as every beam of every image has emitted <end> —
            # trained captioners finish well inside the 20-step budget.
            def cond(ts):
                t, st = ts
                return (t < max_len) & ~jnp.all(st[2])

            def body(ts):
                t, st = ts
                return t + 1, _step_body(st, t)

            _, state = jax.lax.while_loop(
                cond, body, (jnp.asarray(1, jnp.int32), state)
            )
        else:
            state, _ = jax.lax.scan(scan_step, state, jnp.arange(1, max_len))
    carry, scores, finished, tokens, _ = state

    # Rank by length-normalised score. Lengths count every non-pad token —
    # including <end> for finished beams, and the full step budget for
    # unfinished ones (i.e. unfinished beams are normalised at max_len, one
    # token more than the GNMT definition would give a just-finished beam;
    # with length_penalty=0 the divisor is 1 and raw scores rank).
    lengths = jnp.sum(tokens != PAD_ID, axis=-1)  # [B, k]
    norm = scores / _length_penalty(lengths, length_penalty)
    if return_all:
        order = jnp.argsort(-norm, axis=-1)  # [B, k] best-first
        all_ids = jnp.take_along_axis(tokens, order[:, :, None], axis=1)
        all_scores = jnp.take_along_axis(norm, order, axis=1)
        return all_ids, all_scores
    best = jnp.argmax(norm, axis=-1)  # [B]
    best_ids = jnp.take_along_axis(
        tokens, best[:, None, None], axis=1
    ).squeeze(1)  # [B, max_len]
    best_scores = jnp.take_along_axis(norm, best[:, None], axis=1).squeeze(1)
    return best_ids, best_scores
