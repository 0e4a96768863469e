"""Learning-signal test: the full train step memorises a tiny dataset and
greedy decode reproduces the training captions (end-to-end gradient flow
through attention + LSTM + heads)."""

import jax
import jax.numpy as jnp
import numpy as np

from show_and_tell_tpu.config import Config
from show_and_tell_tpu.decode import greedy_decode
from show_and_tell_tpu.models.registry import build_model
from show_and_tell_tpu.train.step import make_train_state, make_train_step
from show_and_tell_tpu.utils.vocab import Vocabulary


def test_sat_memorises_tiny_dataset():
    words = ["man", "dog", "horse", "rides", "runs", "sits", "park", "ball"]
    vocab = Vocabulary.from_words(words)
    cfg = Config(embed_size=24, hidden_size=32, crop_size=32, max_decode_len=6)
    model = build_model(cfg, len(vocab))
    params, frozen = model.init(jax.random.PRNGKey(0))

    B, L = 6, 4
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((B, L, 512)).astype(np.float32)
    caps = [[words[i % len(words)], words[(i + 3) % len(words)]] for i in range(B)]
    captions, lengths = vocab.encode_batch(caps, 6)
    batch = {"captions": captions, "lengths": lengths, "features": feats}

    state = make_train_state(cfg, params)
    step = make_train_step(model, cfg, donate=False)
    first_loss = None
    for i in range(250):
        state, m = step(state, frozen, batch, 5e-3, 0.0, jax.random.PRNGKey(i))
        if first_loss is None:
            first_loss = float(m["loss"])
    final_loss = float(m["loss"])
    assert final_loss < 0.1 * first_loss, (first_loss, final_loss)

    step_fn, carry, _ = model.make_decode_state(state.params, jnp.asarray(feats))
    ids = np.asarray(greedy_decode(step_fn, carry, B, cfg.max_decode_len))
    decoded = vocab.decode_batch(ids)
    expected = [" ".join(c) for c in caps]
    # memorisation: at least 5 of 6 captions reproduced exactly
    assert sum(d == e for d, e in zip(decoded, expected)) >= 5, list(zip(decoded, expected))


def test_show_tell_memorises_and_decodes():
    """ShowTell end-to-end: training conditioning must equal decode-time
    conditioning (the feature step predicts c_1, each later step consumes the
    previous target) — greedy decode of a memorised model reproduces the
    training captions. Regression test for the teacher-forcing off-by-one."""
    words = ["man", "dog", "horse", "rides", "runs", "sits", "park", "ball"]
    vocab = Vocabulary.from_words(words)
    cfg = Config(
        model="show_tell", embed_size=24, hidden_size=32, max_decode_len=6
    )
    model = build_model(cfg, len(vocab))
    params, frozen = model.init(jax.random.PRNGKey(0))
    stats = model.init_batch_stats()

    B = 6
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((B, model.feature_dim)).astype(np.float32)
    caps = [[words[i % len(words)], words[(i + 3) % len(words)]] for i in range(B)]
    captions, lengths = vocab.encode_batch(caps, 6)
    batch = {"captions": captions, "lengths": lengths, "features": feats}

    state = make_train_state(cfg, params, batch_stats=stats)
    step = make_train_step(model, cfg, donate=False)
    first_loss = None
    for i in range(250):
        state, m = step(state, frozen, batch, 5e-3, 0.0, jax.random.PRNGKey(i))
        if first_loss is None:
            first_loss = float(m["loss"])
    final_loss = float(m["loss"])
    assert final_loss < 0.1 * first_loss, (first_loss, final_loss)

    step_fn, carry, first_logits = model.make_decode_state(
        state.params, state.batch_stats, jnp.asarray(feats)
    )
    first_ids = jnp.argmax(first_logits, axis=-1).astype(jnp.int32)
    carry, logits1 = step_fn(carry, first_ids)
    second_ids = jnp.argmax(logits1, axis=-1)
    carry, logits2 = step_fn(carry, second_ids.astype(jnp.int32))
    third_ids = jnp.argmax(logits2, axis=-1)
    ids = np.stack([np.asarray(first_ids), np.asarray(second_ids), np.asarray(third_ids)], 1)
    decoded = vocab.decode_batch(ids)
    expected = [" ".join(c) for c in caps]
    assert sum(d == e for d, e in zip(decoded, expected)) >= 5, list(zip(decoded, expected))
