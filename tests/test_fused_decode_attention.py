"""Numerics for the beam-aware fused decode attention (interpreter mode on
CPU; device timings live in benchmarks/attn_kernel_bench.py and
docs/KERNELS.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from show_and_tell_tpu.ops import fused_decode_attention as fda
from show_and_tell_tpu.ops import lstm as lstm_mod

B, K, L, D = 8, 3, 13, 64  # deliberately unaligned L


def _xla_reference(ce, f, hp, watt):
    t = jnp.tanh(ce[:, None, :, :] + hp[:, :, None, :])
    e = jnp.einsum("bkld,d->bkl", t.astype(jnp.float32), watt.astype(jnp.float32))
    alpha = jax.nn.softmax(e, axis=-1)
    ctx = jnp.einsum("bkl,bld->bkd", alpha, f.astype(jnp.float32)) / L
    return ctx, alpha


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setattr(lstm_mod, "_INTERPRET", True)


@pytest.mark.parametrize("variant", fda.VARIANTS)
def test_attention_beam_matches_xla(variant):
    rng = np.random.default_rng(0)
    ce = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    f = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    hp = jnp.asarray(rng.standard_normal((B, K, D)), jnp.float32)
    watt = jnp.asarray(rng.standard_normal((D,)), jnp.float32)

    ctx, alpha = fda.attention_beam(ce, f, hp, watt, variant=variant)
    ctx_ref, alpha_ref = _xla_reference(ce, f, hp, watt)
    assert ctx.shape == (B, K, D) and alpha.shape == (B, K, L)
    np.testing.assert_allclose(
        np.asarray(alpha, np.float32), np.asarray(alpha_ref), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(ctx, np.float32), np.asarray(ctx_ref), atol=2e-5
    )
    # padded patch positions carry zero attention weight
    np.testing.assert_allclose(np.asarray(alpha.sum(-1)), 1.0, atol=1e-5)


@pytest.mark.parametrize("variant", fda.SCORE_VARIANTS)
def test_attention_beam_hybrid_matches_xla(variant):
    """Round-3 hybrid (Pallas tanh+score, XLA softmax/context): numerics
    identical to the XLA beam-broadcast chain."""
    rng = np.random.default_rng(1)
    ce = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    f = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    hp = jnp.asarray(rng.standard_normal((B, K, D)), jnp.float32)
    watt = jnp.asarray(rng.standard_normal((D,)), jnp.float32)

    ctx, alpha = fda.attention_beam_hybrid(ce, f, hp, watt, variant=variant)
    ctx_ref, alpha_ref = _xla_reference(ce, f, hp, watt)
    assert ctx.shape == (B, K, D) and alpha.shape == (B, K, L)
    np.testing.assert_allclose(
        np.asarray(alpha, np.float32), np.asarray(alpha_ref), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(ctx, np.float32), np.asarray(ctx_ref), atol=2e-5
    )
    e = fda.attention_scores(ce, hp, watt, variant=variant)
    assert e.shape == (B, K, L) and e.dtype == jnp.float32
