"""Fused attention Pallas kernel vs the pure-JAX op (interpreter mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from show_and_tell_tpu.ops.attention import additive_attention, encode_features, init_attention_params
from show_and_tell_tpu.ops.fused_attention import fused_additive_attention
from show_and_tell_tpu.ops.lstm import set_pallas_enabled


@pytest.fixture(autouse=True)
def _reset():
    yield
    set_pallas_enabled(None)


@pytest.mark.parametrize("B,L,D,H", [(3, 196, 128, 64), (8, 16, 128, 128), (5, 49, 256, 96)])
def test_fused_matches_reference(B, L, D, H):
    set_pallas_enabled(True, interpret=True)
    p = init_attention_params(jax.random.PRNGKey(0), D, H, D)
    feats = jax.random.normal(jax.random.PRNGKey(1), (B, L, D))
    hidden = jax.random.normal(jax.random.PRNGKey(2), (B, H))
    ctx_enc = encode_features(p, feats)
    c1, a1 = fused_additive_attention(p, feats, ctx_enc, hidden)
    c2, a2 = additive_attention(p, feats, ctx_enc, hidden)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=2e-5)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=2e-5)


def test_fused_gradients_match():
    set_pallas_enabled(True, interpret=True)
    B, L, D, H = 4, 24, 128, 64
    p = init_attention_params(jax.random.PRNGKey(0), D, H, D)
    feats = jax.random.normal(jax.random.PRNGKey(1), (B, L, D))
    hidden = jax.random.normal(jax.random.PRNGKey(2), (B, H))
    ctx_enc = encode_features(p, feats)

    def loss_fused(p, feats, ctx_enc, hidden):
        c, a = fused_additive_attention(p, feats, ctx_enc, hidden)
        return jnp.sum(c * 1.3) + jnp.sum(a * 0.2)

    def loss_ref(p, feats, ctx_enc, hidden):
        c, a = additive_attention(p, feats, ctx_enc, hidden)
        return jnp.sum(c * 1.3) + jnp.sum(a * 0.2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(p, feats, ctx_enc, hidden)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(p, feats, ctx_enc, hidden)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_fused_bf16():
    set_pallas_enabled(True, interpret=True)
    B, L, D, H = 2, 20, 128, 64
    p = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16),
        init_attention_params(jax.random.PRNGKey(0), D, H, D),
    )
    feats = jax.random.normal(jax.random.PRNGKey(1), (B, L, D), jnp.bfloat16)
    hidden = jax.random.normal(jax.random.PRNGKey(2), (B, H), jnp.bfloat16)
    ctx_enc = encode_features(p, feats)
    c1, a1 = fused_additive_attention(p, feats, ctx_enc, hidden)
    c2, a2 = additive_attention(p, feats, ctx_enc, hidden)
    np.testing.assert_allclose(
        np.asarray(a1, np.float32), np.asarray(a2, np.float32), atol=2e-2
    )
    np.testing.assert_allclose(
        np.asarray(c1, np.float32), np.asarray(c2, np.float32), atol=2e-2
    )
    assert c1.dtype == jnp.bfloat16


def test_fallback_off_tpu():
    # pallas disabled -> identical to the pure-JAX path, no kernel invoked
    B, L, D, H = 2, 10, 128, 64
    p = init_attention_params(jax.random.PRNGKey(0), D, H, D)
    feats = jax.random.normal(jax.random.PRNGKey(1), (B, L, D))
    hidden = jax.random.normal(jax.random.PRNGKey(2), (B, H))
    ctx_enc = encode_features(p, feats)
    c1, a1 = fused_additive_attention(p, feats, ctx_enc, hidden)
    c2, a2 = additive_attention(p, feats, ctx_enc, hidden)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-6)
