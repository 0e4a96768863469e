"""Loss functions.

``masked_cross_entropy`` reproduces the reference objective — per-token
CrossEntropyLoss averaged over the *packed* (valid) timesteps
(train.py:53,143: CE over pack_padded_sequence outputs) — expressed over
static [B, T] tensors with a validity mask, the XLA-friendly formulation.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def masked_cross_entropy(
    logits: jax.Array,  # [B, T, V]
    targets: jax.Array,  # [B, T] int
    mask: jax.Array,  # [B, T] bool
) -> Tuple[jax.Array, jax.Array]:
    """Returns ``(mean_loss, token_count)``.

    Mean over valid tokens == torch's packed CE mean (every packed element
    weighs equally regardless of sequence). Computed in fp32 for stability
    even when logits arrive bf16.
    """
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ll = jnp.take_along_axis(logp, targets[..., None].astype(jnp.int32), axis=-1)
    ll = ll.squeeze(-1)
    m = mask.astype(jnp.float32)
    count = jnp.maximum(m.sum(), 1.0)
    return -(ll * m).sum() / count, count
