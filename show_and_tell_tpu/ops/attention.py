"""Additive (Bahdanau-style) visual attention over the encoder feature grid.

Reproduces the math of the reference's ``attention_layer`` (model2.py:73-78):

    ctx_enc = features @ W_img                  [B, L, D]   (precomputed once)
    h_att   = tanh(ctx_enc + (h @ W_hh + b_hh)[:, None, :])
    e       = h_att @ w_att                     [B, L]
    alpha   = softmax(e, axis=-1)
    context = mean_L(features * alpha[..., None])            [B, D]

Two faithful quirks, documented rather than silently "fixed":
- The reference takes the **mean**, not the sum, of the alpha-weighted
  features (model2.py:77: ``.mean(1)``) — a constant 1/L scale relative to
  standard soft attention. We reproduce it so trained-weight behavior matches.
- ``F.tanh`` is applied before the score projection (additive attention), and
  softmax runs over the L=196 patch axis.

Everything is a dense batched matmul + softmax — exactly the shapes XLA tiles
onto the MXU/VPU well — so no hand kernel is needed here; the per-step fusion
opportunity is the attention->LSTM chain, handled at the model level.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, jax.Array]


def init_attention_params(
    key: jax.Array, feature_dim: int, hidden_size: int, context_size: int,
    dtype=jnp.float32,
) -> Params:
    """Parameters mirroring model2.py:20-25.

    - ``w_img``  [D, D]: ``image_att_w`` (reference: uninitialised
      ``torch.FloatTensor`` — a bug; we use Xavier-uniform).
    - ``w_hh`` [H, D], ``b_hh`` [D]: ``weight_hh`` Linear.
    - ``w_att`` [D, 1] -> stored [D]: ``weight_att`` score vector.
    """
    k1, k2, k3 = jax.random.split(key, 3)
    s_img = np.sqrt(6.0 / (feature_dim + feature_dim))
    s_hh = 1.0 / np.sqrt(hidden_size)
    s_att = np.sqrt(6.0 / (feature_dim + 1))
    del context_size
    return {
        "w_img": jax.random.uniform(k1, (feature_dim, feature_dim), dtype, -s_img, s_img),
        "w_hh": jax.random.uniform(k2, (hidden_size, feature_dim), dtype, -s_hh, s_hh),
        "b_hh": jnp.zeros((feature_dim,), dtype),
        "w_att": jax.random.uniform(k3, (feature_dim,), dtype, -s_att, s_att),
    }


def encode_features(params: Params, features: jax.Array) -> jax.Array:
    """Precompute ``ctx_enc = features @ W_img`` once per image
    (model2.py:45: done before the time loop)."""
    return features @ params["w_img"]


def additive_attention(
    params: Params,
    features: jax.Array,  # [B, L, D]
    ctx_enc: jax.Array,  # [B, L, D]
    hidden: jax.Array,  # [B, H]
) -> Tuple[jax.Array, jax.Array]:
    """Returns ``(context [B, D], alpha [B, L])``."""
    h_proj = hidden @ params["w_hh"] + params["b_hh"]  # [B, D]
    h_att = jnp.tanh(ctx_enc + h_proj[:, None, :])  # [B, L, D]
    e = jnp.einsum("bld,d->bl", h_att, params["w_att"])  # [B, L]
    alpha = jax.nn.softmax(e.astype(jnp.float32), axis=-1)  # softmax in fp32
    # Reference uses mean over L, not sum (model2.py:77) — kept faithfully.
    context = (
        jnp.einsum("bl,bld->bd", alpha.astype(features.dtype), features)
        / features.shape[1]
    )
    return context, alpha


def additive_attention_beamed(
    params: Params,
    features: jax.Array,  # [B, L, D] — UNtiled
    ctx_enc: jax.Array,  # [B, L, D]
    hidden: jax.Array,  # [B*k, H] beam-major
    k: int,
) -> Tuple[jax.Array, jax.Array]:
    """Beam-search attention without tiling the image tensors.

    All k beams of an image share features/ctx_enc; broadcasting over a beam
    axis reads each [B, L, D] tensor once per step instead of k times —
    the HBM-bandwidth win that makes wide beams cheap on TPU. Returns
    ``(context [B*k, D], alpha [B*k, L])`` matching the tiled layout.
    """
    B, L, D = features.shape
    h_proj = hidden @ params["w_hh"] + params["b_hh"]  # [B*k, D]
    h_proj = h_proj.reshape(B, k, 1, D)
    h_att = jnp.tanh(ctx_enc[:, None, :, :] + h_proj)  # [B, k, L, D]
    e = jnp.einsum("bkld,d->bkl", h_att, params["w_att"])
    alpha = jax.nn.softmax(e.astype(jnp.float32), axis=-1)  # [B, k, L]
    context = (
        jnp.einsum("bkl,bld->bkd", alpha.astype(features.dtype), features) / L
    )
    return context.reshape(B * k, D), alpha.reshape(B * k, L)
