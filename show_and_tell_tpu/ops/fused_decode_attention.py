"""Beam-aware fused decode attention — round-2 Pallas iteration.

The decode-step chain (SURVEY.md §7 "the real kernel work") at production
shape B=512 images x K=3 beams, L=196 patches, D=512:

    t_k = tanh(ctx_enc + h_proj_k[:, None, :])   per beam k
    e_k = t_k . w_att ; alpha_k = softmax(e_k)
    context_k = (alpha_k . features) / L

Round-1's kernel (ops/fused_attention.py) lost 2x to XLA. Two structural
gaps are fixed here:

1. **Beam sharing inside the kernel.** The round-1 kernel took per-row
   [B*K, L, D] operands, streaming features/ctx_enc once per BEAM. Here the
   kernel takes per-image tensors plus [B, K, D] projections and unrolls the
   K-beam loop over a single VMEM-resident block — each image's 400KB of
   HBM traffic is paid once, like the XLA beam-broadcast path.
2. **Score contraction on the MXU.** ``sum(t * w_att, -1)`` is a cross-lane
   VPU reduction; variant "mxu" computes it as ``t2d @ W`` where W is w_att
   broadcast to [D, 128] (every output lane holds the same score) so the
   reduction rides the systolic array and only lane 0 is consumed.

Variants (all numerics-identical; bench: benchmarks/attn_kernel_bench.py):
- score mode: "s32"/"s16" lane-reduction (fp32/bf16 product), "smxu"
  broadcast-matmul, "st" transposed-layout sublane reduction
- context mode: "cvpu" broadcast-multiply reduce, "cmxu" block-diagonal
  matmul (one MXU op per block, no batched-dot needed)
- "grid2": 2D grid over (B-blocks, beams)

STATUS — measured on TPU v5e, B=512 K=3 L=196 D=512 bf16, 20-step scan
(per-step device time; benchmarks/attn_kernel_bench.py):

    XLA beam-broadcast chain          1.89-2.14 ms/step
    pallas smxu_cmxu (best)           2.33-2.38 ms/step
    pallas s32/s16/smxu x cvpu        2.44-2.80 ms/step
    pallas grid2                      2.70 ms/step
    pure tanh floor (pallas micro)    1.84 ms/step  (XLA micro: 2.21)
    full chain (+LSTM cell + head)    XLA 2.06 / pallas-attn 2.51 ms/step

Round 3 (final attempt, CLOSED — docs/KERNELS.md): the hybrid
``attention_beam_hybrid`` (Pallas tanh+score only, no features operand =
half the HBM read; XLA softmax/context) measured 2.28-2.49 ms/step vs the
same-session XLA chain at 1.768 — which is BELOW round 2's Pallas
tanh-only micro (1.84), so there is no recoverable gap. Kernel work on
this chain is closed; XLA is the production path permanently.

Conclusion: the decode step is tanh-VPU-bound (~1.8 ms floor for 462M
bf16 transcendentals at this shape) and XLA's fusion already sits within
~10% of that floor; every Pallas formulation pays ~0.4-0.5 ms of
structural overhead. Specific Mosaic blockers hit: (a) no batched-dot
lowering for [B,L]x[B,L,D] (the cmxu block-diagonal matmul works around
it, recovering ~0.2 ms over cvpu, still short); (b) cross-lane score
reductions/relayouts — the clean fix, lane-major-L layout with sublane
reduction ("st"), fails Mosaic compilation outright (opaque remote-compile
500 on this host, with both 208 and 256 lane paddings); (c) VMEM caps the
image block at BT=8 (BT=16 fails to compile: ~14 MB double-buffered
blocks). The models keep the XLA path; this module is the measured
record, and ``attention_beam`` is numerics-verified against the XLA
reference in tests/test_fused_decode_attention.py.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from show_and_tell_tpu.ops import lstm as lstm_mod
from show_and_tell_tpu.utils.shapes import round_up as _round_up

# variant = "<score>_<context>": score in {s32, s16, smxu}, context in
# {cvpu, cmxu}; "grid2" = 2D grid over (B-blocks, beams)
VARIANTS = (
    "s32_cvpu", "smxu_cvpu", "s16_cvpu", "s16_cmxu", "smxu_cmxu", "s32_cmxu",
    "grid2", "st_cmxu", "st_cvpu",
)


def _cmxu_context(alphas, f, L_true: int, ctx_ref) -> None:
    """Context contraction on the MXU: one block-diagonal matmul for the
    whole image block (works around Mosaic's missing batched-dot lowering).
    A[k*BT+i, j*Lp+l] = alpha_k[i, l] if i == j else 0; ctx = A @ f2d where
    f2d stacks the block's patches [BT*Lp, D]. Rows are k-major after the
    concatenate (row = k*BT + i)."""
    BT, Lp, D = f.shape
    K = len(alphas)
    af2 = jnp.concatenate(alphas, axis=0).astype(f.dtype)  # [K*BT, Lp]
    rimg = jax.lax.broadcasted_iota(jnp.int32, (K * BT, Lp), 0) % BT
    big = jnp.concatenate(
        [jnp.where(rimg == j, af2, 0) for j in range(BT)], axis=1
    )  # [K*BT, BT*Lp], block-"diagonal" in the image index
    ctx = jax.lax.dot_general(
        big,
        f.reshape(BT * Lp, D),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [K*BT, D]
    for k in range(K):
        ctx_ref[:, k, :] = (ctx[k * BT : (k + 1) * BT] / L_true).astype(
            ctx_ref.dtype
        )


def _kernel_st(L_true: int, K: int, ctx_mode: str,
               cet_ref, f_ref, hp_ref, watt_ref, ctx_ref, alpha_ref):
    """Transposed-score kernel: ce arrives [BT, D, Lp] (transposed ONCE per
    decode, since ctx_enc is step-invariant), so the score contraction over
    D is a native sublane reduction and the [BT, Lp] scores land directly in
    softmax layout — no cross-lane reduce, no relayout."""
    cet = cet_ref[:]  # [BT, D, Lp]
    f = f_ref[:]  # [BT, Lp, D]
    BT, D, Lp = cet.shape
    mask = jax.lax.broadcasted_iota(jnp.int32, (BT, Lp), 1) < L_true
    watt_col = watt_ref[:][0][None, :, None]  # [1, D, 1]

    alphas = []
    for k in range(K):
        hp_k = hp_ref[:, k, :]  # [BT, D]
        t = jnp.tanh(cet + hp_k[:, :, None])  # [BT, D, Lp]
        e = jnp.sum(t * watt_col, axis=1).astype(jnp.float32)  # sublane reduce
        e = jnp.where(mask, e, -1e30)
        e = e - jnp.max(e, axis=-1, keepdims=True)
        w = jnp.exp(e)
        alpha = w / jnp.sum(w, axis=-1, keepdims=True)
        alpha_ref[:, k, :] = alpha.astype(alpha_ref.dtype)
        if ctx_mode == "cmxu":
            alphas.append(alpha)
        else:
            ctx = jnp.sum(alpha[:, :, None].astype(f.dtype) * f, axis=1) / L_true
            ctx_ref[:, k, :] = ctx.astype(ctx_ref.dtype)

    if ctx_mode == "cmxu":
        _cmxu_context(alphas, f, L_true, ctx_ref)


def _kernel_grid2(L_true: int, ce_ref, f_ref, hp_ref, watt_ref, ctx_ref, alpha_ref):
    """One (image-block, beam) grid cell: ce/f blocks are revisited for
    consecutive beams (same block indices -> Mosaic skips the re-DMA)."""
    ce = ce_ref[:]  # [BT, Lp, D]
    f = f_ref[:]
    BT, Lp, D = ce.shape
    hp_k = hp_ref[0]  # [BT, D]
    t = jnp.tanh(ce + hp_k[:, None, :])
    e = jnp.sum((t * watt_ref[:][0][None, None, :]).astype(jnp.float32), axis=-1)
    mask = jax.lax.broadcasted_iota(jnp.int32, (BT, Lp), 1) < L_true
    e = jnp.where(mask, e, -1e30)
    e = e - jnp.max(e, axis=-1, keepdims=True)
    w = jnp.exp(e)
    alpha = w / jnp.sum(w, axis=-1, keepdims=True)
    alpha_ref[0] = alpha.astype(alpha_ref.dtype)
    ctx = jnp.sum(alpha[:, :, None].astype(f.dtype) * f, axis=1) / L_true
    ctx_ref[0] = ctx.astype(ctx_ref.dtype)


def _score_mode(variant: str) -> str:
    return variant.split("_")[0]


def _ctx_mode(variant: str) -> str:
    return variant.split("_")[1]


def _kernel(L_true: int, K: int, variant: str,
            ce_ref, f_ref, hp_ref, watt_ref, ctx_ref, alpha_ref):
    ce = ce_ref[:]  # [BT, Lp, D] bf16 — read once, reused across K beams
    f = f_ref[:]  # [BT, Lp, D]
    BT, Lp, D = ce.shape
    mask = jax.lax.broadcasted_iota(jnp.int32, (BT, Lp), 1) < L_true

    alphas = []
    for k in range(K):  # static unroll over beams
        hp_k = hp_ref[:, k, :]  # [BT, D]
        t = jnp.tanh(ce + hp_k[:, None, :])  # [BT, Lp, D]
        sm = _score_mode(variant)
        if sm == "smxu":
            # w_att broadcast to [D, 128]: every output lane = the score
            e128 = jax.lax.dot_general(
                t.reshape(BT * Lp, D), watt_ref[:],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [BT*Lp, 128]
            e = e128[:, :1].reshape(BT, Lp)
        elif sm == "s16":
            # multiply-reduce in bf16 (XLA-equivalent), cast the small result
            e = jnp.sum(t * watt_ref[:][0][None, None, :], axis=-1).astype(
                jnp.float32
            )
        else:
            e = jnp.sum(
                (t * watt_ref[:][0][None, None, :]).astype(jnp.float32), axis=-1
            )
        e = jnp.where(mask, e, -1e30)
        e = e - jnp.max(e, axis=-1, keepdims=True)
        w = jnp.exp(e)
        alpha = w / jnp.sum(w, axis=-1, keepdims=True)  # [BT, Lp] fp32
        alpha_ref[:, k, :] = alpha.astype(alpha_ref.dtype)
        if _ctx_mode(variant) == "cmxu":
            alphas.append(alpha)
            continue
        ctx = jnp.sum(alpha[:, :, None].astype(f.dtype) * f, axis=1) / L_true
        ctx_ref[:, k, :] = ctx.astype(ctx_ref.dtype)

    if _ctx_mode(variant) == "cmxu":
        _cmxu_context(alphas, f, L_true, ctx_ref)


def _impl(ce, f, hp, watt, variant: str, block_b: int = 8):
    """ce/f: [B, L, D]; hp: [B, K, D]; watt: [D] ->
    (context [B, K, D], alpha [B, K, L])."""
    B, L, D = ce.shape
    K = hp.shape[1]
    sub = 16 if ce.dtype == jnp.bfloat16 else 8
    Lp = _round_up(L, sub)
    if Lp != L:
        ce = jnp.pad(ce, ((0, 0), (0, Lp - L), (0, 0)))
        f = jnp.pad(f, ((0, 0), (0, Lp - L), (0, 0)))
    BT = block_b
    while B % BT:
        BT //= 2
    compiler_params = None

    if variant == "grid2":
        watt_in = watt.reshape(1, D).astype(ce.dtype)
        hp_t = jnp.swapaxes(hp, 0, 1)  # [K, B, D] so K is the blocked-by-1 axis
        ctx_t, alpha_t = pl.pallas_call(
            functools.partial(_kernel_grid2, L),
            grid=(B // BT, K),  # k inner: ce/f blocks identical across k
            in_specs=[
                pl.BlockSpec((BT, Lp, D), lambda i, k: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BT, Lp, D), lambda i, k: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BT, D), lambda i, k: (k, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, D), lambda i, k: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, BT, D), lambda i, k: (k, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BT, Lp), lambda i, k: (k, i, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((K, B, D), ce.dtype),
                jax.ShapeDtypeStruct((K, B, Lp), jnp.float32),
            ],
            interpret=lstm_mod._INTERPRET,
        )(ce, f, hp_t, watt_in)
        return jnp.swapaxes(ctx_t, 0, 1), jnp.swapaxes(alpha_t, 0, 1)[:, :, :L]
    if _score_mode(variant) == "st":
        # lanes must be a 128-multiple when Lp is the minor dim
        Lp2 = _round_up(Lp, 128)
        if Lp2 != Lp:
            ce = jnp.pad(ce, ((0, 0), (0, Lp2 - Lp), (0, 0)))
            f = jnp.pad(f, ((0, 0), (0, Lp2 - Lp), (0, 0)))
            Lp = Lp2
        cet = jnp.swapaxes(ce, 1, 2)  # [B, D, Lp] — hoisted by XLA out of
        # the decode loop in real use (ce is step-invariant)
        watt_in = watt.reshape(1, D).astype(ce.dtype)
        ctx, alpha = pl.pallas_call(
            functools.partial(_kernel_st, L, K, _ctx_mode(variant)),
            grid=(B // BT,),
            in_specs=[
                pl.BlockSpec((BT, D, Lp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BT, Lp, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BT, K, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((BT, K, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BT, K, Lp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, K, D), ce.dtype),
                jax.ShapeDtypeStruct((B, K, Lp), jnp.float32),
            ],
            interpret=lstm_mod._INTERPRET,
        )(cet, f, hp, watt_in)
        return ctx, alpha[:, :, :L]
    if _score_mode(variant) == "smxu":
        watt_in = jnp.broadcast_to(watt.reshape(D, 1), (D, 128)).astype(ce.dtype)
        watt_spec = pl.BlockSpec((D, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)
    else:
        watt_in = watt.reshape(1, D).astype(ce.dtype)
        watt_spec = pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM)

    ctx, alpha = pl.pallas_call(
        functools.partial(_kernel, L, K, variant),
        grid=(B // BT,),
        in_specs=[
            pl.BlockSpec((BT, Lp, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, Lp, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, K, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            watt_spec,
        ],
        out_specs=[
            pl.BlockSpec((BT, K, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, K, Lp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, K, D), ce.dtype),
            jax.ShapeDtypeStruct((B, K, Lp), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * B * K * Lp * D,
            bytes_accessed=2 * B * Lp * D * ce.dtype.itemsize,
            transcendentals=B * K * Lp * D,
        ),
        compiler_params=compiler_params,
        interpret=lstm_mod._INTERPRET,
    )(ce, f, hp, watt_in)
    return ctx, alpha[:, :, :L]


def attention_beam(
    ce: jax.Array,  # [B, L, D] per-image encoded context
    f: jax.Array,  # [B, L, D] per-image features
    hp: jax.Array,  # [B, K, D] per-beam hidden projections (+bias)
    watt: jax.Array,  # [D]
    variant: str = "s16_cmxu",
    block_b: int = 8,
) -> Tuple[jax.Array, jax.Array]:
    """(context [B, K, D], alpha [B, K, L]) — fused, beam-shared.

    ``block_b``: images per VMEM block (8 is the largest that compiles at
    production shapes; 16 exceeds double-buffered VMEM)."""
    return _impl(ce, f, hp, watt, variant, block_b)


# --- round-3 hybrid: Pallas tanh+score only, XLA softmax/context ------------
# VERDICT r2 weak-#4: the Pallas tanh micro beat XLA's (1.84 vs 2.21 ms), so
# try the minimal kernel owning ONLY the VPU-bound stage (tanh + score
# contraction) and let XLA keep softmax + the context matmul + the cell.
# Structural advantage over the full kernels above: no ``features`` operand,
# so the kernel's HBM read halves (ce only), and the larger block_b fits.

SCORE_VARIANTS = ("s32", "s16", "smxu")


def _score_kernel(K: int, variant: str, ce_ref, hp_ref, watt_ref, e_ref):
    ce = ce_ref[:]  # [BT, Lp, D] — read once, reused across K beams
    BT, Lp, D = ce.shape
    for k in range(K):  # static unroll over beams
        t = jnp.tanh(ce + hp_ref[:, k, :][:, None, :])  # [BT, Lp, D]
        if variant == "smxu":
            e128 = jax.lax.dot_general(
                t.reshape(BT * Lp, D), watt_ref[:],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            e = e128[:, :1].reshape(BT, Lp)
        elif variant == "s16":
            e = jnp.sum(t * watt_ref[:][0][None, None, :], axis=-1).astype(
                jnp.float32
            )
        else:
            e = jnp.sum(
                (t * watt_ref[:][0][None, None, :]).astype(jnp.float32), axis=-1
            )
        e_ref[:, k, :] = e


def attention_scores(
    ce: jax.Array,  # [B, L, D]
    hp: jax.Array,  # [B, K, D]
    watt: jax.Array,  # [D]
    variant: str = "s16",
    block_b: int = 8,
) -> jax.Array:
    """Raw attention scores ``e [B, K, L]`` fp32 = tanh(ce + hp_k) . watt —
    the VPU-bound stage only; softmax/context stay with XLA."""
    B, L, D = ce.shape
    K = hp.shape[1]
    sub = 16 if ce.dtype == jnp.bfloat16 else 8
    Lp = _round_up(L, sub)
    if Lp != L:
        ce = jnp.pad(ce, ((0, 0), (0, Lp - L), (0, 0)))
    BT = block_b
    while B % BT:
        BT //= 2
    if variant == "smxu":
        watt_in = jnp.broadcast_to(watt.reshape(D, 1), (D, 128)).astype(ce.dtype)
        watt_spec = pl.BlockSpec((D, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)
    else:
        watt_in = watt.reshape(1, D).astype(ce.dtype)
        watt_spec = pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM)
    e = pl.pallas_call(
        functools.partial(_score_kernel, K, variant),
        grid=(B // BT,),
        in_specs=[
            pl.BlockSpec((BT, Lp, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, K, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            watt_spec,
        ],
        out_specs=pl.BlockSpec(
            (BT, K, Lp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, K, Lp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * K * Lp * D,
            bytes_accessed=B * Lp * D * ce.dtype.itemsize,
            transcendentals=B * K * Lp * D,
        ),
        interpret=lstm_mod._INTERPRET,
    )(ce, hp, watt_in)
    return e[:, :, :L]


def attention_beam_hybrid(
    ce: jax.Array,
    f: jax.Array,
    hp: jax.Array,
    watt: jax.Array,
    variant: str = "s16",
    block_b: int = 8,
) -> Tuple[jax.Array, jax.Array]:
    """Hybrid decode attention: Pallas tanh+score, XLA softmax + context
    matmul. Numerics-identical to the XLA beam-broadcast chain."""
    L = ce.shape[1]
    e = attention_scores(ce, hp, watt, variant, block_b)
    alpha = jax.nn.softmax(e, axis=-1)
    ctx = jnp.einsum("bkl,bld->bkd", alpha.astype(f.dtype), f) / L
    return ctx, alpha
