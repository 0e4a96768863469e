"""Attention decode-step kernel bench: XLA vs Pallas variants.

Production shape: B=512 images, K=3 beams, L=196 patches, D=512. The
XLA reference is the exact code decode uses (beam-broadcast einsum,
ops/attention.py semantics). Run on the TPU chip:

    python benchmarks/attn_kernel_bench.py [--variant xla|pallas] [--bt 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, K, L, D, H = 512, 3, 196, 512, 1024


STEPS = 20  # one decode's worth of attention steps inside a single program


def make_loop(step_fn):
    """Scan STEPS applications on device; one scalar comes back to host.

    Isolates per-step device time from the relay backend's per-call host
    round-trip (which measures ~150 ms regardless of the kernel)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(ce, f, hp, watt):
        def body(carry, _):
            hp_cur = carry
            ctx, alpha = step_fn(ce, f, hp_cur, watt)
            # feed context back so steps are serialized like real decode
            return hp_cur + ctx.astype(hp_cur.dtype) * 1e-3, jnp.sum(ctx.astype(jnp.float32))
        _, sums = jax.lax.scan(body, hp, None, length=STEPS)
        return sums.sum()

    return loop


def measure(fn, args, iters=8, warmup=2):
    for _ in range(warmup):
        np.asarray(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(fn(*args))
    dt = (time.perf_counter() - t0) / iters
    return dt / STEPS


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument(
        "--variant", default="all",
        help="'xla', 'pallas' (all pallas variants), a specific "
        "fused_decode_attention.VARIANTS name, 'all', or one of the "
        "standalone probes: 'micro-tanh' (VPU floor), 'full-chain' "
        "(attention + cell + head end-to-end)",
    )
    ap.add_argument(
        "--bt", type=int, default=8,
        help="images per VMEM block for the pallas variants",
    )
    args = ap.parse_args()
    if args.variant == "micro-tanh":
        return micro_tanh()
    if args.variant == "full-chain":
        return full_chain()

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    f = jnp.asarray(rng.standard_normal((B, L, D)), jnp.bfloat16)
    ce = jnp.asarray(rng.standard_normal((B, L, D)), jnp.bfloat16)
    hp = jnp.asarray(rng.standard_normal((B, K, D)), jnp.bfloat16)
    watt = jnp.asarray(rng.standard_normal((D,)), jnp.bfloat16)

    def xla_beam(ce, f, hp, watt):
        # decode's beam-broadcast attention: ce/f read once per image
        t = jnp.tanh(ce[:, None, :, :] + hp[:, :, None, :])  # [B,K,L,D]
        e = jnp.einsum("bkld,d->bkl", t, watt)
        alpha = jax.nn.softmax(e.astype(jnp.float32), axis=-1)
        ctx = jnp.einsum("bkl,bld->bkd", alpha.astype(f.dtype), f) / L
        return ctx, alpha

    if args.variant in ("xla", "all"):
        dt = measure(make_loop(xla_beam), (ce, f, hp, watt), args.iters)
        print(f"xla_beam: {dt*1e3:.3f} ms/step")

    from show_and_tell_tpu.ops import fused_decode_attention as fda

    hybrid_names = tuple(f"hybrid-{v}" for v in fda.SCORE_VARIANTS)
    if args.variant == "all":
        names = fda.VARIANTS + hybrid_names
    elif args.variant == "pallas":
        names = fda.VARIANTS
    elif args.variant == "hybrid":
        names = hybrid_names
    elif args.variant == "xla":
        names = ()
    elif args.variant in fda.VARIANTS + hybrid_names:
        names = (args.variant,)
    else:
        ap.error(f"unknown --variant {args.variant!r}; "
                 f"choose xla, pallas, hybrid, all, or one of "
                 f"{fda.VARIANTS + hybrid_names}")
    for name in names:
        if name.startswith("hybrid-"):
            step = lambda ce, f, hp, watt, _n=name[7:]: fda.attention_beam_hybrid(
                ce, f, hp, watt, variant=_n, block_b=args.bt)
        else:
            step = lambda ce, f, hp, watt, _n=name: fda.attention_beam(
                ce, f, hp, watt, variant=_n, block_b=args.bt)
        try:
            dt = measure(make_loop(step), (ce, f, hp, watt), args.iters)
            # numerics check vs xla
            cx, _ = jax.jit(xla_beam)(ce, f, hp, watt)
            ck, _ = jax.jit(step)(ce, f, hp, watt)
            derr = float(jnp.max(jnp.abs(cx.astype(jnp.float32) - ck.astype(jnp.float32))))
            print(f"pallas[{name}]: {dt*1e3:.3f} ms/step  max|dctx|={derr:.4f}")
        except Exception as e:
            print(f"pallas[{name}]: FAILED: {type(e).__name__}: {str(e)[:300]}")


def micro_tanh():
    """VPU floor probe: just tanh(ce + hp_k) summed, no softmax/context."""
    import functools
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    ce = jnp.asarray(rng.standard_normal((B, L, D)), jnp.bfloat16)
    hp = jnp.asarray(rng.standard_normal((B, K, D)), jnp.bfloat16)
    Lp = 208
    cep = jnp.pad(ce, ((0, 0), (0, Lp - L), (0, 0)))
    BT = 8

    def kern(ce_ref, hp_ref, out_ref):
        ce = ce_ref[:]
        acc = jnp.zeros((BT, D), jnp.float32)
        for k in range(K):
            t = jnp.tanh(ce + hp_ref[:, k, :][:, None, :])
            acc += jnp.sum(t, axis=1).astype(jnp.float32)
        out_ref[:] = acc

    def step(cep, hp):
        return pl.pallas_call(
            kern,
            grid=(B // BT,),
            in_specs=[
                pl.BlockSpec((BT, Lp, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BT, K, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BT, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, D), jnp.float32),
        )(cep, hp)

    @jax.jit
    def loop(cep, hp):
        def body(c, _):
            o = step(cep, c)
            return c + o[:, None, :].astype(c.dtype) * 1e-3, jnp.sum(o)
        _, s = jax.lax.scan(body, hp, None, length=STEPS)
        return s.sum()

    np.asarray(loop(cep, hp))
    t0 = time.perf_counter()
    for _ in range(6):
        np.asarray(loop(cep, hp))
    print(f"micro tanh-only (pallas): {(time.perf_counter()-t0)/6/STEPS*1e3:.3f} ms/step")

    def xstep(cep, hp):
        t = jnp.tanh(cep[:, None, :, :] + hp[:, :, None, :])
        return jnp.sum(t, axis=(1, 2)).astype(jnp.float32)

    @jax.jit
    def xloop(cep, hp):
        def body(c, _):
            o = xstep(cep, c)
            return c + o[:, None, :].astype(c.dtype) * 1e-3, jnp.sum(o)
        _, s = jax.lax.scan(body, hp, None, length=STEPS)
        return s.sum()

    np.asarray(xloop(cep, hp))
    t0 = time.perf_counter()
    for _ in range(6):
        np.asarray(xloop(cep, hp))
    print(f"micro tanh-only (xla):    {(time.perf_counter()-t0)/6/STEPS*1e3:.3f} ms/step")


def full_chain():
    """Whole decode-step chain at production shape: attention + 4-gate LSTM
    cell + output head (XLA vs XLA-with-pallas-attention)."""
    import jax
    import jax.numpy as jnp
    from show_and_tell_tpu.ops import fused_decode_attention as fda

    rng = np.random.default_rng(0)
    V, E = 10000, 512
    f = jnp.asarray(rng.standard_normal((B, L, D)), jnp.bfloat16)
    ce = jnp.asarray(rng.standard_normal((B, L, D)), jnp.bfloat16)
    h = jnp.asarray(rng.standard_normal((B * K, H)), jnp.bfloat16)
    c = jnp.asarray(rng.standard_normal((B * K, H)), jnp.float32)
    emb = jnp.asarray(rng.standard_normal((B * K, E)), jnp.bfloat16)
    whh = jnp.asarray(rng.standard_normal((H, D)) * 0.02, jnp.bfloat16)
    watt = jnp.asarray(rng.standard_normal((D,)), jnp.bfloat16)
    wl = jnp.asarray(rng.standard_normal((E + D + H, 4 * H)) * 0.02, jnp.bfloat16)
    bl = jnp.zeros((4 * H,), jnp.float32)
    w_c2o = jnp.asarray(rng.standard_normal((D, E)) * 0.02, jnp.bfloat16)
    w_h2o = jnp.asarray(rng.standard_normal((H, E)) * 0.02, jnp.bfloat16)
    w_cls = jnp.asarray(rng.standard_normal((E, V)) * 0.02, jnp.bfloat16)

    def chain(attn_fn):
        def step(h, c, emb):
            hp = (h @ whh).reshape(B, K, D)
            ctx, _ = attn_fn(ce, f, hp, watt)
            ctx2 = ctx.reshape(B * K, D)
            x = jnp.concatenate([emb, ctx2, h], axis=1)
            gates = (x @ wl) + bl
            i_, f_, g_, o_ = jnp.split(gates.astype(jnp.float32), 4, axis=1)
            c2 = jax.nn.sigmoid(f_) * c + jax.nn.sigmoid(i_) * jnp.tanh(g_)
            h2 = (jax.nn.sigmoid(o_) * jnp.tanh(c2)).astype(h.dtype)
            logits = (ctx2 @ w_c2o + h2 @ w_h2o) @ w_cls
            return h2, c2, logits

        @jax.jit
        def loop(h, c, emb):
            def body(carry, _):
                h, c, emb = carry
                h2, c2, logits = step(h, c, emb)
                # the argmax must FEED the next step (a real decode embeds
                # the selected token) or XLA dead-code-eliminates it and the
                # timing silently excludes token selection
                nxt = jnp.argmax(logits.astype(jnp.float32), axis=-1)
                emb2 = emb * 0.99 + (
                    nxt[:, None].astype(emb.dtype) * 1e-6 + h2[:, :E] * 0.01
                )
                return (h2, c2, emb2), jnp.sum(logits[:, 0].astype(jnp.float32))
            (_, _, _), s = jax.lax.scan(body, (h, c, emb), None, length=STEPS)
            return s.sum()
        return loop

    def xla_attn(ce, f, hp, watt):
        t = jnp.tanh(ce[:, None, :, :] + hp[:, :, None, :])
        e = jnp.einsum("bkld,d->bkl", t, watt)
        alpha = jax.nn.softmax(e.astype(jnp.float32), axis=-1)
        ctx = jnp.einsum("bkl,bld->bkd", alpha.astype(f.dtype), f) / L
        return ctx, alpha

    for name, attn in [("xla", xla_attn),
                       ("pallas-smxu_cmxu", lambda *a: fda.attention_beam(*a, variant="smxu_cmxu")),
                       ("hybrid-s16", lambda *a: fda.attention_beam_hybrid(*a, variant="s16")),
                       ("hybrid-s32", lambda *a: fda.attention_beam_hybrid(*a, variant="s32")),
                       ("hybrid-smxu", lambda *a: fda.attention_beam_hybrid(*a, variant="smxu"))]:
        loop = chain(attn)
        np.asarray(loop(h, c, emb))
        t0 = time.perf_counter()
        for _ in range(6):
            np.asarray(loop(h, c, emb))
        print(f"full chain [{name}]: {(time.perf_counter()-t0)/6/STEPS*1e3:.3f} ms/step")


if __name__ == "__main__":
    main()
