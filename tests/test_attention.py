"""Additive attention vs a direct numpy transcription of model2.py:73-78."""

import jax
import numpy as np

from show_and_tell_tpu.ops.attention import (
    additive_attention,
    encode_features,
    init_attention_params,
)


def _numpy_reference(p, feats, hidden):
    # ctx_enc = features @ W_img  (model2.py:45)
    ctx_enc = feats @ np.asarray(p["w_img"])
    # h_att = tanh(ctx_enc + Linear(h))  (model2.py:74)
    h_proj = hidden @ np.asarray(p["w_hh"]) + np.asarray(p["b_hh"])
    h_att = np.tanh(ctx_enc + h_proj[:, None, :])
    # scores -> softmax (model2.py:75-76)
    e = h_att @ np.asarray(p["w_att"])
    e = e - e.max(axis=-1, keepdims=True)
    alpha = np.exp(e) / np.exp(e).sum(axis=-1, keepdims=True)
    # context = MEAN of alpha-weighted features (model2.py:77)
    context = (feats * alpha[..., None]).mean(axis=1)
    return context, alpha


def test_matches_reference_math():
    B, L, D, H = 3, 196, 64, 96
    p = init_attention_params(jax.random.PRNGKey(0), D, H, D)
    feats = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (B, L, D)))
    hidden = np.asarray(jax.random.normal(jax.random.PRNGKey(2), (B, H)))

    ctx_enc = encode_features(p, feats)
    context, alpha = additive_attention(p, feats, ctx_enc, hidden)
    ref_ctx, ref_alpha = _numpy_reference(p, feats, hidden)

    np.testing.assert_allclose(np.asarray(alpha), ref_alpha, atol=1e-5)
    np.testing.assert_allclose(np.asarray(context), ref_ctx, atol=1e-5)


def test_alpha_is_distribution():
    B, L, D, H = 2, 49, 32, 32
    p = init_attention_params(jax.random.PRNGKey(0), D, H, D)
    feats = jax.random.normal(jax.random.PRNGKey(1), (B, L, D))
    hidden = jax.random.normal(jax.random.PRNGKey(2), (B, H))
    _, alpha = additive_attention(p, feats, encode_features(p, feats), hidden)
    np.testing.assert_allclose(np.asarray(alpha.sum(-1)), np.ones(B), atol=1e-6)
    assert (np.asarray(alpha) >= 0).all()
