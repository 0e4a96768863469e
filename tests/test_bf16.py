"""Mixed-precision (bfloat16 compute) smoke: both families train and decode
with finite results; bf16 loss tracks fp32 closely at init."""

import jax
import jax.numpy as jnp
import numpy as np

from show_and_tell_tpu.config import Config
from show_and_tell_tpu.models.registry import build_model
from show_and_tell_tpu.train.losses import masked_cross_entropy
from show_and_tell_tpu.decode import beam_search, greedy_decode

V = 21


def _batch(B=4, T=6):
    rng = np.random.default_rng(0)
    captions = np.concatenate(
        [np.ones((B, 1), np.int32), rng.integers(4, V, (B, T - 1), dtype=np.int32)], 1
    )
    return jnp.asarray(captions), jnp.full((B,), T, jnp.int32)


def test_sat_bf16_matches_fp32_at_init():
    captions, lengths = _batch()
    feats = jax.random.normal(jax.random.PRNGKey(1), (4, 4, 512))
    losses = {}
    for dtype in ("float32", "bfloat16"):
        cfg = Config(embed_size=16, hidden_size=32, crop_size=32, dtype=dtype)
        m = build_model(cfg, V)
        trainable, _ = m.init(jax.random.PRNGKey(0))
        logits, mask, _ = m.decode_train(trainable, feats, captions, lengths)
        if dtype == "bfloat16":
            assert logits.dtype == jnp.bfloat16
        losses[dtype] = float(masked_cross_entropy(logits, captions[:, 1:], mask)[0])
    assert abs(losses["bfloat16"] - losses["float32"]) < 0.05


def test_sat_bf16_grads_are_fp32():
    cfg = Config(embed_size=16, hidden_size=32, crop_size=32, dtype="bfloat16")
    m = build_model(cfg, V)
    trainable, _ = m.init(jax.random.PRNGKey(0))
    captions, lengths = _batch()
    feats = jax.random.normal(jax.random.PRNGKey(1), (4, 4, 512))

    def loss(p):
        logits, mask, _ = m.decode_train(p, feats, captions, lengths)
        return masked_cross_entropy(logits, captions[:, 1:], mask)[0]

    g = jax.grad(loss)(trainable)
    for leaf in jax.tree.leaves(g):
        assert leaf.dtype == jnp.float32  # optimizer state stays full precision
    assert np.isfinite(float(jax.tree.leaves(g)[0].sum()))


def test_show_tell_bf16_decode():
    cfg = Config(
        embed_size=16, hidden_size=32, crop_size=32, model="show_tell",
        dtype="bfloat16", num_layers=2, max_decode_len=5,
    )
    m = build_model(cfg, V)
    trainable, _ = m.init(jax.random.PRNGKey(0))
    feats = jax.random.normal(jax.random.PRNGKey(1), (3, m.feature_dim))
    step_fn, carry, first = m.make_decode_state(trainable, m.init_batch_stats(), feats)
    g = greedy_decode(step_fn, carry, 3, 5, first_logits=first)
    ids, _ = beam_search(step_fn, carry, 3, beam_size=2, max_len=5, first_logits=first)
    assert g.shape == (3, 5) and ids.shape == (3, 5)
    assert (np.asarray(g) >= 0).all() and (np.asarray(g) < V).all()


def test_sat_bf16_beam_consistent_with_greedy_top1():
    cfg = Config(
        embed_size=16, hidden_size=32, crop_size=32, dtype="bfloat16",
        max_decode_len=5,
    )
    m = build_model(cfg, V)
    trainable, _ = m.init(jax.random.PRNGKey(0))
    feats = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 512))
    step1, carry1, _ = m.make_decode_state(trainable, feats, beam_size=1)
    b1, _ = beam_search(step1, carry1, 2, beam_size=1, max_len=5, tile=False)
    stepg, carryg, _ = m.make_decode_state(trainable, feats)
    g = greedy_decode(stepg, carryg, 2, 5)
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(g))


def test_batch_norm_train_bf16_stats_are_fp32_accurate():
    """BN batch statistics must be computed in fp32 even for bf16 inputs:
    the running-stat EMA accumulates hundreds of updates, so bf16-rounded
    means/vars would drift the inference normalization away from the fp32
    stats the mixed-precision design stores."""
    from show_and_tell_tpu.models.layers import batch_norm_train

    rng = np.random.default_rng(0)
    x = (rng.random((64, 128)) * 10 + 5).astype(np.float32)
    p = {
        "scale": jnp.ones((128,)),
        "bias": jnp.zeros((128,)),
        "mean": jnp.zeros((128,)),
        "var": jnp.ones((128,)),
    }
    _, s32 = batch_norm_train(p, jnp.asarray(x), momentum=1.0)
    y16, s16 = batch_norm_train(p, jnp.asarray(x, jnp.bfloat16), momentum=1.0)
    assert y16.dtype == jnp.bfloat16
    assert s16["mean"].dtype == jnp.float32
    # bf16 input quantization costs ~1e-2 relative; fp32 stat accumulation
    # keeps the batch mean/var within that, not bf16's ~4e-3 * range drift
    np.testing.assert_allclose(
        np.asarray(s16["mean"]), np.asarray(s32["mean"]), rtol=3e-2
    )
    np.testing.assert_allclose(
        np.asarray(s16["var"]), np.asarray(s32["var"]), rtol=5e-2
    )
