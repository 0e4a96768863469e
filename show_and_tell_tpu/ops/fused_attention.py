"""Fused additive-attention Pallas kernel.

The attention step (model2.py:73-78 math — see ops/attention.py) is a chain
of bandwidth-bound ops over the [B, L=196, D=512] feature grid:

    t = tanh(ctx_enc + h_proj[:, None, :]);  e = t . w_att
    alpha = softmax(e);  context = (alpha . features) / L

This kernel executes the whole chain in one VMEM-resident pass per batch
tile: ``ctx_enc`` and ``features`` are each read from HBM exactly once and
no [B, L, D] intermediate is ever written back — the fusion SURVEY.md §7
names as the attention-side kernel work (the 4-gate LSTM cell kernel lives
in ops/lstm.py).

The patch axis L is padded to a sublane multiple; padded positions are
masked to -inf before the (fp32) softmax so they carry zero weight. The
true L stays the mean divisor (the reference's mean-pooling quirk).

Training uses ``jax.custom_vjp`` with an XLA recompute backward (same remat
trade as the LSTM cell). The pure-JAX implementation in ops/attention.py is
the ground truth; tests compare both in interpreter mode.

STATUS — measured on TPU v5e (B=512, L=196, D=512, bf16): this kernel runs
~0.62 ms/step vs ~0.32 ms/step for the XLA version. XLA already fuses the
tanh chain into its reduction and lowers both contractions to the MXU,
while this kernel's context reduction is a VPU broadcast-multiply (Mosaic
has no batched-dot lowering for the [B,L]x[B,L,D] shape). The models
therefore keep the XLA path (ops/attention.py); this kernel remains as the
measured baseline for future Mosaic iterations and as the pattern
demonstration SURVEY.md §7 calls for. Numerics are verified identical.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from show_and_tell_tpu.ops import lstm as lstm_mod
from show_and_tell_tpu.utils.shapes import round_up as _round_up

Params = Dict


def _attn_kernel(L_true, ce_ref, f_ref, hp_ref, watt_ref, ctx_ref, alpha_ref):
    ce = ce_ref[:]  # [BT, Lp, D]
    hp = hp_ref[:]  # [BT, D]
    t = jnp.tanh(ce + hp[:, None, :])
    e = jnp.sum(t * watt_ref[:][None, :, :], axis=-1)  # [BT, Lp] fp32 via cast
    e = e.astype(jnp.float32)
    Lp = ce.shape[1]
    mask = jax.lax.broadcasted_iota(jnp.int32, e.shape, 1) < L_true
    e = jnp.where(mask, e, -1e30)
    e = e - jnp.max(e, axis=-1, keepdims=True)
    w = jnp.exp(e)
    alpha = w / jnp.sum(w, axis=-1, keepdims=True)  # [BT, Lp]
    alpha_ref[:] = alpha.astype(alpha_ref.dtype)
    f = f_ref[:]
    # VPU broadcast-multiply + reduce (Mosaic lacks batched-dot lowering here)
    ctx = jnp.sum(alpha[:, :, None].astype(f.dtype) * f, axis=1) / L_true
    ctx_ref[:] = ctx.astype(ctx_ref.dtype)


def _fused_attention_impl(
    ce: jax.Array,  # [B, L, D]
    f: jax.Array,  # [B, L, D]
    hp: jax.Array,  # [B, D]
    watt: jax.Array,  # [D]
) -> Tuple[jax.Array, jax.Array]:
    B, L, D = ce.shape
    sub = 16 if ce.dtype == jnp.bfloat16 else 8
    Lp = _round_up(L, sub)
    Bp = _round_up(B, 8)
    if Lp != L:
        ce = jnp.pad(ce, ((0, 0), (0, Lp - L), (0, 0)))
        f = jnp.pad(f, ((0, 0), (0, Lp - L), (0, 0)))
    if Bp != B:
        ce = jnp.pad(ce, ((0, Bp - B), (0, 0), (0, 0)))
        f = jnp.pad(f, ((0, Bp - B), (0, 0), (0, 0)))
        hp = jnp.pad(hp, ((0, Bp - B), (0, 0)))
    BT = 8
    while Bp % BT:
        BT //= 2
    watt2 = watt.reshape(1, D)

    ctx, alpha = pl.pallas_call(
        functools.partial(_attn_kernel, L),
        grid=(Bp // BT,),
        in_specs=[
            pl.BlockSpec((BT, Lp, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, Lp, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BT, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, Lp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, D), ce.dtype),
            jax.ShapeDtypeStruct((Bp, Lp), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * Bp * Lp * D,
            bytes_accessed=2 * Bp * Lp * D * ce.dtype.itemsize,
            transcendentals=Bp * Lp * (D + 1),
        ),
        interpret=lstm_mod._INTERPRET,
    )(ce, f, hp, watt2)
    return ctx[:B], alpha[:B, :L]


def _xla_reference(ce, f, hp, watt):
    t = jnp.tanh(ce + hp[:, None, :])
    e = jnp.einsum("bld,d->bl", t, watt)
    alpha = jax.nn.softmax(e.astype(jnp.float32), axis=-1)
    ctx = jnp.einsum("bl,bld->bd", alpha.astype(f.dtype), f) / f.shape[1]
    return ctx, alpha


@jax.custom_vjp
def _fused(ce, f, hp, watt):
    return _fused_attention_impl(ce, f, hp, watt)


def _fused_fwd(ce, f, hp, watt):
    out = _fused_attention_impl(ce, f, hp, watt)
    return out, (ce, f, hp, watt)


def _fused_bwd(res, grads):
    ce, f, hp, watt = res
    dctx, dalpha_in = grads
    # Recompute + XLA autodiff for the backward (rematerialisation).
    _, vjp = jax.vjp(_xla_reference, ce, f, hp, watt)
    dce, df, dhp, dwatt = vjp((dctx, dalpha_in))
    return (
        dce.astype(ce.dtype),
        df.astype(f.dtype),
        dhp.astype(hp.dtype),
        dwatt.astype(watt.dtype),
    )


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_additive_attention(
    params: Params,
    features: jax.Array,  # [B, L, D]
    ctx_enc: jax.Array,  # [B, L, D]
    hidden: jax.Array,  # [B, H]
) -> Tuple[jax.Array, jax.Array]:
    """Drop-in for ops.attention.additive_attention with the Pallas kernel.

    The h-projection matmul stays in XLA (it's a [B,H]x[H,D] MXU op); the
    [B, L, D]-heavy chain runs fused. Falls back to pure JAX off-TPU.
    """
    hp = hidden @ params["w_hh"] + params["b_hh"]
    if lstm_mod.pallas_active():
        return _fused(ctx_enc, features, hp, params["w_att"])
    return _xla_reference(ctx_enc, features, hp, params["w_att"])
