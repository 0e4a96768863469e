"""Minimal functional NN layer library (params = pytrees, pure functions).

TPU conventions throughout:
- images are NHWC (XLA:TPU's preferred conv layout; the reference's torch
  models are NCHW),
- convs lower to ``lax.conv_general_dilated`` so XLA tiles them onto the MXU,
- BatchNorm supports frozen (inference) statistics for the pretrained
  backbones (reference freezes backbones: models.py:14-15, model2.py:87-89)
  and a training mode with momentum for the trainable encoder-output BN
  (models.py:17, momentum=0.01).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict


# --- initialisers ----------------------------------------------------------


def kaiming_conv(key, kh, kw, cin, cout, dtype=jnp.float32) -> jax.Array:
    fan_in = kh * kw * cin
    std = np.sqrt(2.0 / fan_in)
    return std * jax.random.normal(key, (kh, kw, cin, cout), dtype)


def uniform_dense(key, nin, nout, scale=None, dtype=jnp.float32) -> Params:
    s = scale if scale is not None else 1.0 / np.sqrt(nin)
    kw_, kb = jax.random.split(key)
    return {
        "w": jax.random.uniform(kw_, (nin, nout), dtype, -s, s),
        "b": jax.random.uniform(kb, (nout,), dtype, -s, s),
    }


def init_conv(key, kh, kw, cin, cout, bias=True, dtype=jnp.float32) -> Params:
    p = {"w": kaiming_conv(key, kh, kw, cin, cout, dtype)}
    if bias:
        p["b"] = jnp.zeros((cout,), dtype)
    return p


def init_bn(c, dtype=jnp.float32) -> Params:
    return {
        "scale": jnp.ones((c,), dtype),
        "bias": jnp.zeros((c,), dtype),
        "mean": jnp.zeros((c,), dtype),
        "var": jnp.ones((c,), dtype),
    }


# --- layers ----------------------------------------------------------------


def conv2d(
    p: Params, x: jax.Array, stride: int = 1, padding="SAME"
) -> jax.Array:
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    w = p["w"].astype(x.dtype)
    kh, kw, cin, _ = w.shape
    if cin <= 8:
        # Stem convs (C_in = 3) starve the MXU's 128-deep contraction —
        # measured ~12 TFLOP/s vs ~64 for the 64-channel conv at the same
        # shape. im2col reformulation: extract [KH*KW*Cin]-deep patches
        # (itself a cheap data movement conv) and run ONE dense matmul with
        # a 27-deep (or 147-deep for ResNet's 7x7) contraction instead.
        # Bit-identical output; measured 2.0x on VGG conv1 (docs/KERNELS.md).
        patches = jax.lax.conv_general_dilated_patches(
            x, (kh, kw), (stride, stride), padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )  # [..., Cin*KH*KW] ordered channel-major
        wm = w.transpose(2, 0, 1, 3).reshape(cin * kh * kw, -1)
        y = patches @ wm
    else:
        y = jax.lax.conv_general_dilated(
            x,
            w,
            window_strides=(stride, stride),
            padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def dense(p: Params, x: jax.Array) -> jax.Array:
    y = x @ p["w"].astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def batch_norm_inference(p: Params, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Frozen-statistics BN — the pretrained-backbone path."""
    inv = jax.lax.rsqrt(p["var"].astype(jnp.float32) + eps)
    scale = (p["scale"].astype(jnp.float32) * inv).astype(x.dtype)
    bias = (
        p["bias"].astype(jnp.float32) - p["mean"].astype(jnp.float32) * p["scale"].astype(jnp.float32) * inv
    ).astype(x.dtype)
    return x * scale + bias


def batch_norm_train(
    p: Params, x: jax.Array, momentum: float = 0.01, eps: float = 1e-5
) -> Tuple[jax.Array, Params]:
    """Batch-statistics BN over all axes but the last; returns (y, new_stats).

    Matches torch BatchNorm1d semantics with ``momentum`` as the *new*-stat
    weight (torch convention; models.py:17 uses momentum=0.01).
    """
    axes = tuple(range(x.ndim - 1))
    # Batch statistics and the normalization itself in fp32 regardless of the
    # compute dtype: the running-stat EMA accumulates hundreds of updates, so
    # bf16-rounded means/vars would drift the inference-time normalization
    # away from the fp32 stats the design promises (show_tell.py mixed
    # precision: bf16 matmuls, fp32 params/BN).
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=axes)
    var = jnp.var(xf, axis=axes)
    inv = jax.lax.rsqrt(var + eps)
    y = ((xf - mean) * inv * p["scale"].astype(jnp.float32)
         + p["bias"].astype(jnp.float32)).astype(x.dtype)
    n = float(np.prod([x.shape[a] for a in axes]))
    unbiased = var * (n / max(n - 1.0, 1.0))
    new_stats = {
        "scale": p["scale"],
        "bias": p["bias"],
        "mean": (1 - momentum) * p["mean"] + momentum * mean,
        "var": (1 - momentum) * p["var"] + momentum * unbiased,
    }
    return y, new_stats


def max_pool(x: jax.Array, window: int, stride: int, padding="VALID") -> jax.Array:
    if isinstance(padding, int):
        padding = [(0, 0), (padding, padding), (padding, padding), (0, 0)]
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, window, window, 1), (1, stride, stride, 1), padding
    )


def avg_pool(
    x: jax.Array,
    window: int,
    stride: int,
    padding="VALID",
    count_include_pad: bool = True,
) -> jax.Array:
    """``count_include_pad=True`` (default) divides by window² everywhere —
    torch ``F.avg_pool2d``'s default, which torchvision Inception-v3's
    branch_pool uses; imported-weight parity depends on matching it at the
    borders. ``False`` divides by the number of valid (non-pad) cells."""
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, window, window, 1), (1, stride, stride, 1), padding
    )
    if padding == "VALID" or count_include_pad:
        return s / (window * window)
    ones = jnp.ones_like(x)
    cnt = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, window, window, 1), (1, stride, stride, 1), padding
    )
    return s / cnt


def global_avg_pool(x: jax.Array) -> jax.Array:
    return jnp.mean(x, axis=(1, 2))


def embedding_lookup(table: jax.Array, ids: jax.Array) -> jax.Array:
    """ids -> rows of the embedding table.

    One-hot matmul beats gather on the TPU MXU for small vocabularies, but
    XLA lowers ``take`` to an efficient dynamic-gather on modern TPUs; keep
    the simple form and let the compiler choose.
    """
    return jnp.take(table, ids, axis=0)


def cast_tree(tree, dtype):
    """Cast every float leaf to ``dtype`` (params stay fp32 in the optimizer;
    this is the compute-dtype cast applied inside the differentiated
    function, so gradients come back fp32 automatically)."""
    return jax.tree.map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        tree,
    )


def dropout(key: Optional[jax.Array], x: jax.Array, rate: float) -> jax.Array:
    if key is None or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)
