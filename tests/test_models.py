"""Model-family tests: shapes, torch ground truth for the LSTM stack,
teacher-forcing alignment, and a tiny-overfit end-to-end signal."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from show_and_tell_tpu.config import Config
from show_and_tell_tpu.models.registry import build_model
from show_and_tell_tpu.models.layers import embedding_lookup

V = 23  # tiny vocab


def small_cfg(**kw):
    base = dict(
        embed_size=16,
        hidden_size=24,
        num_layers=1,
        crop_size=32,  # -> 2x2 = 4 VGG patches, fast on CPU
        batch_size=4,
        max_decode_len=5,
    )
    base.update(kw)
    return Config(**base)


def _batch(key, B=3, T=7):
    kc, kl = jax.random.split(key)
    captions = jax.random.randint(kc, (B, T), 4, V).astype(jnp.int32)
    captions = captions.at[:, 0].set(1)  # <start>
    lengths = jnp.clip(jnp.array([T, T - 2, 4, T - 1, 3][:B], jnp.int32), 2, T)
    return captions, lengths


def test_show_attend_tell_shapes():
    cfg = small_cfg()
    m = build_model(cfg.replace(model="show_attend_tell"), V)
    trainable, frozen = m.init(jax.random.PRNGKey(0))
    B, T, L = 3, 7, 4
    feats = jax.random.normal(jax.random.PRNGKey(1), (B, L, 512))
    captions, lengths = _batch(jax.random.PRNGKey(2), B, T)
    logits, mask, alphas = m.decode_train(trainable, feats, captions, lengths)
    assert logits.shape == (B, T - 1, V)
    assert mask.shape == (B, T - 1)
    assert alphas.shape == (B, T - 1, L)
    # mask[t] = t < len-1
    assert mask[0].sum() == 6 and mask[1].sum() == 4 and mask[2].sum() == 3


def test_show_attend_tell_backbone_grid():
    cfg = small_cfg()
    m = build_model(cfg.replace(model="show_attend_tell"), V)
    _, frozen = m.init(jax.random.PRNGKey(0))
    imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    feats = m.backbone_features(frozen, imgs)
    assert feats.shape == (2, 4, 512)  # 32/16=2 -> 2x2 grid


def test_show_tell_lstm_stack_matches_torch():
    torch = pytest.importorskip("torch")
    cfg = small_cfg(num_layers=2, model="show_tell")
    m = build_model(cfg, V)
    trainable, _ = m.init(jax.random.PRNGKey(0))
    B, T = 3, 6
    E, H = cfg.embed_size, cfg.hidden_size
    captions, lengths = _batch(jax.random.PRNGKey(1), B, T)
    feat_embed = jax.random.normal(jax.random.PRNGKey(2), (B, E))

    logits, mask = m.decode_train(trainable, feat_embed, captions, lengths)
    assert logits.shape == (B, T - 1, V)

    # torch ground truth: same inputs through nn.LSTM with copied weights.
    # Step 0 is the image feature; step t >= 1 consumes c_t (the token step
    # t-1 predicts) so training conditioning == decode-time conditioning.
    emb = np.asarray(embedding_lookup(trainable["embed"], captions[:, 1:-1]))
    inputs = np.concatenate([np.asarray(feat_embed)[:, None, :], emb], 1)
    lstm = torch.nn.LSTM(E, H, num_layers=2, batch_first=True)
    with torch.no_grad():
        for l in range(2):
            w = np.asarray(trainable["lstm"][l]["w"])
            insz = E if l == 0 else H
            getattr(lstm, f"weight_ih_l{l}").copy_(torch.from_numpy(w[:insz].T.copy()))
            getattr(lstm, f"weight_hh_l{l}").copy_(torch.from_numpy(w[insz:].T.copy()))
            getattr(lstm, f"bias_ih_l{l}").copy_(
                torch.from_numpy(np.asarray(trainable["lstm"][l]["b"]).copy())
            )
            getattr(lstm, f"bias_hh_l{l}").zero_()
        hs, _ = lstm(torch.from_numpy(inputs.astype(np.float32)))
        out = hs.numpy() @ np.asarray(trainable["out"]["w"]) + np.asarray(
            trainable["out"]["b"]
        )
    np.testing.assert_allclose(np.asarray(logits), out, atol=2e-5)


def test_show_tell_encode_bn_modes():
    cfg = small_cfg(model="show_tell")
    m = build_model(cfg, V)
    trainable, _ = m.init(jax.random.PRNGKey(0))
    stats = m.init_batch_stats()
    feats = jax.random.normal(jax.random.PRNGKey(1), (8, m.feature_dim)) * 3 + 1
    y, new_stats = m.encode(trainable, stats, feats, train=True)
    # train mode: output is batch-normalised
    np.testing.assert_allclose(np.asarray(y.mean(0)), 0, atol=1e-4)
    # running stats moved toward batch stats with momentum 0.01
    assert not np.allclose(np.asarray(new_stats["mean"]), 0)
    y2, s2 = m.encode(trainable, stats, feats, train=False)
    assert np.asarray(s2["mean"]).sum() == 0  # eval mode: stats untouched


def test_scheduled_sampling_changes_logits():
    cfg = small_cfg()
    m = build_model(cfg, V)
    trainable, _ = m.init(jax.random.PRNGKey(0))
    B, T, L = 3, 7, 4
    feats = jax.random.normal(jax.random.PRNGKey(1), (B, L, 512))
    captions, lengths = _batch(jax.random.PRNGKey(2), B, T)
    rng = jax.random.PRNGKey(7)
    l0, _, _ = m.decode_train(trainable, feats, captions, lengths, rng, ss_prob=0.0)
    l1, _, _ = m.decode_train(trainable, feats, captions, lengths, rng, ss_prob=1.0)
    assert not np.allclose(np.asarray(l0), np.asarray(l1))
    # t=0 always consumes ground truth <start>: step-0 logits identical
    np.testing.assert_allclose(np.asarray(l0[:, 0]), np.asarray(l1[:, 0]), atol=1e-6)


def test_tiny_overfit():
    """A few Adam steps on one batch must reduce masked CE (e2e signal)."""
    import optax

    cfg = small_cfg()
    m = build_model(cfg, V)
    trainable, _ = m.init(jax.random.PRNGKey(0))
    B, T, L = 4, 6, 4
    feats = jax.random.normal(jax.random.PRNGKey(1), (B, L, 512))
    captions, lengths = _batch(jax.random.PRNGKey(2), B, T)

    def loss_fn(p):
        logits, mask, _ = m.decode_train(p, feats, captions, lengths)
        tgt = captions[:, 1:]
        ll = jnp.take_along_axis(
            jax.nn.log_softmax(logits), tgt[..., None], axis=-1
        ).squeeze(-1)
        return -(ll * mask).sum() / mask.sum()

    tx = optax.adam(1e-2)
    opt_state = tx.init(trainable)
    p = trainable

    @jax.jit
    def step(p, s):
        loss, g = jax.value_and_grad(loss_fn)(p)
        updates, s = tx.update(g, s, p)
        return optax.apply_updates(p, updates), s, loss

    losses = []
    for _ in range(30):
        p, opt_state, loss = step(p, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.7, losses[::10]


def test_greedy_with_attention_maps():
    """Attention-map export (Show-Attend-Tell hallmark visualisation)."""
    cfg = small_cfg(max_decode_len=5)
    m = build_model(cfg, V)
    trainable, _ = m.init(jax.random.PRNGKey(0))
    feats = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 512))
    ids, alphas = m.greedy_with_attention(trainable, feats, max_len=5)
    assert ids.shape == (2, 5)
    assert alphas.shape == (2, 5, 4)
    np.testing.assert_allclose(np.asarray(alphas.sum(-1)), 1.0, atol=1e-5)
    # same tokens as the plain greedy path
    from show_and_tell_tpu.decode import greedy_decode

    step_fn, carry, _ = m.make_decode_state(trainable, feats)
    g = greedy_decode(step_fn, carry, 2, 5)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(g))


def test_show_tell_scheduled_sampling():
    cfg = small_cfg(model="show_tell")
    m = build_model(cfg, V)
    trainable, _ = m.init(jax.random.PRNGKey(0))
    B, T = 3, 7
    captions, lengths = _batch(jax.random.PRNGKey(1), B, T)
    feat = jax.random.normal(jax.random.PRNGKey(2), (B, cfg.embed_size))
    rng = jax.random.PRNGKey(7)
    l0, _ = m.decode_train(trainable, feat, captions, lengths, rng, 0.0)
    l1, _ = m.decode_train(trainable, feat, captions, lengths, rng, 1.0)
    assert not np.allclose(np.asarray(l0), np.asarray(l1))
    # step 0 consumes the image feature either way: identical logits
    np.testing.assert_allclose(np.asarray(l0[:, 0]), np.asarray(l1[:, 0]), atol=1e-6)


def test_sat_teacher_forcing_fast_path_matches_scan_head():
    """decode_train's static ss=0.0 fast path (head batched outside the
    scan) must be bit-identical to the general scheduled-sampling path
    (head in-scan; forced by passing ss_prob as a traced-style jnp scalar,
    which the isinstance check rejects)."""
    cfg = small_cfg(model="show_attend_tell")
    model = build_model(cfg, V)
    params, _ = model.init(jax.random.PRNGKey(0))
    feats = jnp.asarray(
        np.random.default_rng(0).standard_normal((3, model.num_patches, model.feature_dim)),
        jnp.float32,
    )
    caps = jnp.asarray(np.random.default_rng(1).integers(4, V, (3, 7)), jnp.int32)
    caps = caps.at[:, 0].set(1)
    lengths = jnp.asarray([7, 5, 3], jnp.int32)
    rng = jax.random.PRNGKey(2)
    lf, mf, af = model.decode_train(params, feats, caps, lengths, rng, 0.0)
    ls, ms, as_ = model.decode_train(
        params, feats, caps, lengths, rng, jnp.float32(0.0)
    )
    np.testing.assert_array_equal(np.asarray(lf), np.asarray(ls))
    np.testing.assert_array_equal(np.asarray(mf), np.asarray(ms))
    np.testing.assert_array_equal(np.asarray(af), np.asarray(as_))


def test_show_tell_teacher_forcing_fast_path_matches_scan_head():
    cfg = small_cfg(model="show_tell")
    model = build_model(cfg, V)
    params, _ = model.init(jax.random.PRNGKey(0))
    stats = model.init_batch_stats()
    feats = jnp.asarray(
        np.random.default_rng(0).standard_normal((3, model.feature_dim)), jnp.float32
    )
    feat_embed, _ = model.encode(params, stats, feats, train=False)
    caps = jnp.asarray(np.random.default_rng(1).integers(4, V, (3, 7)), jnp.int32)
    caps = caps.at[:, 0].set(1)
    lengths = jnp.asarray([7, 5, 3], jnp.int32)
    rng = jax.random.PRNGKey(2)
    lf, mf = model.decode_train(params, feat_embed, caps, lengths, rng, 0.0)
    ls, ms = model.decode_train(
        params, feat_embed, caps, lengths, rng, jnp.float32(0.0)
    )
    np.testing.assert_array_equal(np.asarray(lf), np.asarray(ls))
    np.testing.assert_array_equal(np.asarray(mf), np.asarray(ms))
