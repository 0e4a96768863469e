"""Serving API + failure-detection guard + scaled (BASELINE #5) config."""

import jax
import jax.numpy as jnp
import numpy as np

from show_and_tell_tpu.config import Config
from show_and_tell_tpu.models.registry import build_model
from show_and_tell_tpu.serve import Captioner
from show_and_tell_tpu.utils.vocab import Vocabulary


def _vocab():
    return Vocabulary.from_words(["a", "man", "rides", "horse", "dog"])


def test_captioner_batching_and_modes():
    cfg = Config(
        embed_size=16, hidden_size=32, crop_size=32, max_decode_len=4, beam_size=2
    )
    vocab = _vocab()
    cap = Captioner.from_checkpoint(cfg, None, vocab, bucket_sizes=(2, 4))
    images = (np.random.default_rng(0).random((5, 40, 40, 3)) * 255).astype(np.uint8)
    for mode in ("greedy", "beam"):
        caps = cap.caption_images(images, mode=mode)
        assert len(caps) == 5
        assert all(isinstance(c, str) for c in caps)
    # 5 images with buckets (2,4): uses 4 + 2(padded) -> two compiled fns
    assert (4, "beam") in cap._fns and (2, "beam") in cap._fns


def test_captioner_multichip_mesh_matches_single_device():
    """Serving over a data-parallel mesh: identical captions to the
    single-device Captioner (SPMD is a layout, not a semantics, change)."""
    from show_and_tell_tpu.parallel import mesh as mesh_lib

    cfg = Config(
        embed_size=16, hidden_size=32, crop_size=32, max_decode_len=4, beam_size=2
    )
    vocab = _vocab()
    images = (np.random.default_rng(0).random((8, 40, 40, 3)) * 255).astype(np.uint8)
    single = Captioner.from_checkpoint(cfg, None, vocab, bucket_sizes=(8,))
    mesh = mesh_lib.make_mesh(num_devices=min(8, len(jax.devices())))
    sharded = Captioner.from_checkpoint(
        cfg, None, vocab, bucket_sizes=(8,), mesh=mesh
    )
    a = single.caption_images(images, mode="beam")
    b = sharded.caption_images(images, mode="beam")
    assert a == b
    # the interactive surfaces shard over the mesh too (review fix: nbest/
    # attention chunks used to dispatch unsharded). Captions identical;
    # scores agree to float tolerance (sharded layout changes reduction
    # order by a few ulps)
    nb_s, nb_1 = sharded.caption_nbest(images), single.caption_nbest(images)
    assert [[c for c, _ in alts] for alts in nb_s] == [
        [c for c, _ in alts] for alts in nb_1
    ]
    np.testing.assert_allclose(
        [[s for _, s in alts] for alts in nb_s],
        [[s for _, s in alts] for alts in nb_1],
        rtol=1e-5,
    )
    # EXPLICIT bucket sizes must divide the data axis
    try:
        Captioner.from_checkpoint(cfg, None, vocab, bucket_sizes=(3,), mesh=mesh)
        assert mesh.devices.size == 1  # only reachable on a 1-device mesh
    except ValueError as e:
        assert "divisible" in str(e)
    # DEFAULT buckets adapt to the mesh instead of erroring (review fix):
    # every bucket a multiple of dp, and captioning still works
    dp = mesh.shape[mesh_lib.DATA_AXIS]
    auto = Captioner.from_checkpoint(cfg, None, vocab, mesh=mesh)
    assert all(b % dp == 0 for b in auto.bucket_sizes)
    assert auto.caption_images(images[:3], mode="greedy")  # pads to a bucket


def test_captioner_show_tell():
    cfg = Config(
        embed_size=16, hidden_size=32, crop_size=32, max_decode_len=4,
        model="show_tell", beam_size=2,
    )
    cap = Captioner.from_checkpoint(cfg, None, _vocab(), bucket_sizes=(2,))
    images = (np.random.default_rng(0).random((2, 40, 40, 3)) * 255).astype(np.uint8)
    assert len(cap.caption_images(images, mode="beam")) == 2


def test_nonfinite_guard_skips_update():
    from show_and_tell_tpu.train.step import make_train_state, make_train_step

    cfg = Config(embed_size=16, hidden_size=32, crop_size=32, skip_nonfinite=True)
    model = build_model(cfg, 9)
    params, frozen = model.init(jax.random.PRNGKey(0))
    state = make_train_state(cfg, params)
    step = make_train_step(model, cfg, donate=False)
    B, T, L = 4, 5, 4
    batch = {
        "captions": np.ones((B, T), np.int32),
        "lengths": np.full((B,), T, np.int32),
        # NaN features -> NaN loss/grads -> update must be dropped
        "features": np.full((B, L, 512), np.nan, np.float32),
    }
    new_state, metrics = step(state, frozen, batch, 1e-2, 0.0, jax.random.PRNGKey(0))
    assert not np.isfinite(float(metrics["grad_norm"]))
    for a, b in zip(jax.tree.leaves(new_state.params), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and a healthy batch does update
    batch["features"] = np.random.default_rng(0).random((B, L, 512)).astype(np.float32)
    s2, m2 = step(state, frozen, batch, 1e-2, 0.0, jax.random.PRNGKey(0))
    assert np.isfinite(float(m2["grad_norm"]))
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(s2.params), jax.tree.leaves(state.params))
    )
    assert changed


def test_nonfinite_guard_protects_batch_stats():
    """ShowTell carries BN running stats: a NaN batch must not poison them
    through the EMA when the update is skipped (review regression)."""
    from show_and_tell_tpu.train.step import make_train_state, make_train_step

    cfg = Config(
        embed_size=16, hidden_size=32, crop_size=32, model="show_tell",
        skip_nonfinite=True,
    )
    model = build_model(cfg, 9)
    params, frozen = model.init(jax.random.PRNGKey(0))
    stats = model.init_batch_stats()
    state = make_train_state(cfg, params, batch_stats=stats)
    step = make_train_step(model, cfg, donate=False)
    B, T = 4, 5
    batch = {
        "captions": np.ones((B, T), np.int32),
        "lengths": np.full((B,), T, np.int32),
        "features": np.full((B, 2048), np.nan, np.float32),
    }
    new_state, metrics = step(state, frozen, batch, 1e-2, 0.0, jax.random.PRNGKey(0))
    assert not np.isfinite(float(metrics["grad_norm"]))
    for a, b in zip(
        jax.tree.leaves(new_state.batch_stats), jax.tree.leaves(state.batch_stats)
    ):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(a).all()
        np.testing.assert_array_equal(a, b)
    # a healthy batch does advance the running stats
    batch["features"] = np.random.default_rng(0).random((B, 2048)).astype(np.float32)
    s2, _ = step(state, frozen, batch, 1e-2, 0.0, jax.random.PRNGKey(0))
    moved = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(s2.batch_stats), jax.tree.leaves(state.batch_stats))
    )
    assert moved


def test_scaled_config_inception_dp():
    """BASELINE.json config 5: Inception-v3 encoder + 2-layer LSTM,
    data-parallel over the virtual 8-device mesh."""
    from show_and_tell_tpu.parallel import mesh as mesh_lib
    from show_and_tell_tpu.train.step import make_train_state, make_train_step

    cfg = Config(
        model="show_tell", encoder="inception_v3", embed_size=16,
        hidden_size=32, num_layers=2, crop_size=139,
    )
    model = build_model(cfg, 9)
    assert model.feature_dim == 2048
    mesh = mesh_lib.make_mesh()
    params, frozen = model.init(jax.random.PRNGKey(0))
    params = mesh_lib.place_params(mesh, params)
    frozen = mesh_lib.replicate(mesh, frozen)
    state = make_train_state(cfg, params, model.init_batch_stats())
    step = make_train_step(model, cfg, donate=False)
    B, T = 8, 5
    rng = np.random.default_rng(0)
    batch = mesh_lib.shard_batch(
        mesh,
        {
            "images": rng.integers(0, 256, (B, 150, 150, 3), dtype=np.uint8),
            "captions": np.concatenate(
                [np.ones((B, 1), np.int32), rng.integers(4, 9, (B, T - 1), dtype=np.int32)], 1
            ),
            "lengths": np.full((B,), T, np.int32),
        },
    )
    state, metrics = step(state, frozen, batch, 1e-3, 0.0, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))


def test_device_resize_transform():
    from show_and_tell_tpu.data.transforms import resize_transform

    imgs = (np.random.default_rng(0).random((2, 100, 80, 3)) * 255).astype(np.uint8)
    out = resize_transform(jnp.asarray(imgs), size=64, crop=56)
    assert out.shape == (2, 56, 56, 3)
    # value-range regression: a constant uint8 image must normalize exactly
    # as (v/255 - mean)/std — resize outputs float in the INPUT's range, so
    # the uint8 rescale has to happen inside resize_transform
    from show_and_tell_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

    const = np.full((1, 100, 80, 3), 128, np.uint8)
    got = np.asarray(resize_transform(jnp.asarray(const), size=64, crop=56))
    want = (128 / 255.0 - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD)
    np.testing.assert_allclose(got, np.broadcast_to(want, got.shape), atol=1e-5)
    out_t = resize_transform(
        jnp.asarray(imgs), size=64, crop=56, train=True, rng=jax.random.PRNGKey(0)
    )
    assert out_t.shape == (2, 56, 56, 3)


def test_captioner_sample_mode():
    cfg = Config(
        embed_size=16, hidden_size=32, crop_size=32, max_decode_len=4, beam_size=2
    )
    cap = Captioner.from_checkpoint(cfg, None, _vocab(), bucket_sizes=(4,))
    images = (np.random.default_rng(0).random((4, 40, 40, 3)) * 255).astype(np.uint8)
    cap.temperature = 1.5
    caps1 = cap.caption_images(images, mode="sample")
    assert len(caps1) == 4
    # the rng counter advances per request (review fix: a serving endpoint
    # must not return the identical "sample" forever) ...
    assert cap._sample_count == 4
    cap.caption_images(images, mode="sample")
    assert cap._sample_count == 8
    # ... while a fresh Captioner with the same seed reproduces the same
    # sequence (deterministic given the same key state)
    cap_b = Captioner.from_checkpoint(cfg, None, _vocab(), bucket_sizes=(4,))
    cap_b.temperature = 1.5
    assert cap_b.caption_images(images, mode="sample") == caps1
    # top_k=1 collapses to greedy
    cap.top_k = 1
    cap._fns.clear()
    greedy = cap.caption_images(images, mode="greedy")
    k1 = cap.caption_images(images, mode="sample")
    assert greedy == k1
    # top_p ~ 0 keeps only the argmax: also greedy (knob is part of the
    # program cache key, so flipping the attribute takes effect)
    cap.top_k = 0
    cap.top_p = 1e-6
    p0 = cap.caption_images(images, mode="sample")
    assert greedy == p0


def test_caption_paths_sample_keys_unique_across_chunks(tmp_path):
    """caption_paths chunks by max bucket; in sample mode the running
    _sample_count counter gives each chunk fresh GLOBAL keys (review fix) —
    so the chunked path reproduces exactly what one caption_images call
    over all images would sample (from the same counter state), instead of
    re-using the chunk-0 keys per chunk."""
    from PIL import Image

    cfg = Config(
        embed_size=16, hidden_size=32, crop_size=32, max_decode_len=6, beam_size=2
    )
    cap = Captioner.from_checkpoint(cfg, None, _vocab(), bucket_sizes=(2,))
    cap.temperature = 2.0
    rng = np.random.default_rng(1)
    images = (rng.random((4, 256, 256, 3)) * 255).astype(np.uint8)
    paths = []
    for i, arr in enumerate(images):
        p = str(tmp_path / f"img{i}.png")
        Image.fromarray(arr).save(p)
        paths.append(p)
    whole = cap.caption_images(images, mode="sample")  # counter 0 -> 4
    # fresh captioner at counter 0: the chunked path must equal the whole
    # call, NOT repeat chunk-0 keys per chunk
    cap2 = Captioner.from_checkpoint(cfg, None, _vocab(), bucket_sizes=(2,))
    cap2.temperature = 2.0
    chunked = cap2.caption_paths(paths, mode="sample")  # 2 chunks of 2
    assert chunked == whole
    assert cap2._sample_count == 4
    # and successive logical requests on ONE captioner use fresh keys
    # (counter advanced), not a replay of the first call's keys
    assert cap._sample_count == 4


def test_attention_sheet_rendering(tmp_path):
    """visualize.save_attention_sheets: one panel per word + input, written
    as a real PNG with the expected geometry."""
    from show_and_tell_tpu.utils.visualize import attention_overlay, save_attention_sheets
    from show_and_tell_tpu.utils.vocab import Vocabulary
    from PIL import Image

    rng = np.random.default_rng(0)
    H = W = 32
    img = rng.integers(0, 255, (1, H, W, 3), dtype=np.uint8)
    L, T = 16, 3  # 4x4 grid, 3 steps
    alphas = rng.random((1, T, L)).astype(np.float32)
    v = Vocabulary.from_words(["a", "dog", "runs"])
    ids = np.array([[4, 5, 2]], np.int32)  # "a dog" then <end>
    out = str(tmp_path / "sheet.png")
    written = save_attention_sheets(img, ids, alphas, v, [out])
    assert written == [out]
    sheet = Image.open(out)
    # 3 panels (input + 2 words) in one row of width 3*W
    assert sheet.size[0] == 3 * W and sheet.size[1] >= H

    # peaked attention brightens its own cell relative to a dark cell
    alpha = np.zeros((L,), np.float32)
    alpha[0] = 1.0
    const = np.full((H, W, 3), 128, np.uint8)
    ov = attention_overlay(const, alpha)
    assert ov[2, 2].mean() > ov[-2, -2].mean()


def test_captioner_warmup_precompiles_buckets():
    cfg = Config(
        embed_size=16, hidden_size=32, crop_size=32, max_decode_len=4,
        beam_size=2,
    )
    cap = Captioner.from_checkpoint(cfg, None, _vocab(), bucket_sizes=(2, 4))
    dt = cap.warmup(modes=("beam", "greedy"))
    assert dt > 0
    # smallest + largest buckets compiled for both modes, nothing else
    assert set(cap._fns) == {
        (2, "beam"), (4, "beam"), (2, "greedy"), (4, "greedy")
    }
    # sample-mode warmup must not consume live rng sequence positions
    images = (np.random.default_rng(0).random((2, 40, 40, 3)) * 255).astype(
        np.uint8
    )
    live = cap.caption_images(images, mode="sample")
    cap2 = Captioner.from_checkpoint(cfg, None, _vocab(), bucket_sizes=(2, 4))
    cap2.warmup(modes=("sample",), buckets=(2,))
    assert cap2._sample_count == 0
    assert cap2.caption_images(images, mode="sample") == live
    # the interactive surfaces warm too (review fix: their first request
    # used to cold-compile while holding the Captioner lock)
    cap3 = Captioner.from_checkpoint(cfg, None, _vocab(), bucket_sizes=(2,))
    cap3.warmup(modes=("nbest", "attention"), buckets=(2,))
    assert (2, "nbest") in cap3._fns and (2, "attention") in cap3._fns


def test_caption_with_attention_shapes_and_agreement():
    import pytest

    cfg = Config(
        embed_size=16, hidden_size=32, crop_size=32, max_decode_len=4,
        beam_size=2,
    )
    cap = Captioner.from_checkpoint(cfg, None, _vocab(), bucket_sizes=(2,))
    images = (
        np.random.default_rng(0).random((3, 256, 256, 3)) * 255
    ).astype(np.uint8)
    caps, alphas = cap.caption_with_attention(images)
    assert len(caps) == 3
    assert alphas.shape[0] == 3 and alphas.shape[1] == cfg.max_decode_len
    # alphas are softmax maps over the patch grid
    np.testing.assert_allclose(alphas.sum(-1), 1.0, atol=1e-3)
    # greedy captions agree with the plain greedy path
    assert caps == cap.caption_images(images, mode="greedy")

    # ShowTell exposes no attention: loud error, not garbage maps
    cfg2 = Config(
        model="show_tell", encoder="resnet152", embed_size=16,
        hidden_size=32, crop_size=64, max_decode_len=3,
    )
    cap2 = Captioner.from_checkpoint(cfg2, None, _vocab(), bucket_sizes=(1,))
    with pytest.raises(ValueError, match="no attention"):
        cap2.caption_with_attention(images[:1])


def test_caption_nbest_surfaces_full_beam():
    cfg = Config(
        embed_size=16, hidden_size=32, crop_size=32, max_decode_len=4,
        beam_size=3,
    )
    cap = Captioner.from_checkpoint(cfg, None, _vocab(), bucket_sizes=(2,))
    images = (
        np.random.default_rng(0).random((3, 256, 256, 3)) * 255
    ).astype(np.uint8)
    nbest = cap.caption_nbest(images)
    assert len(nbest) == 3
    for alts in nbest:
        assert len(alts) == cfg.beam_size
        scores = [s for _, s in alts]
        assert scores == sorted(scores, reverse=True)  # best-first
        assert all(isinstance(c, str) for c, _ in alts)
    # the n-best head agrees with the single-best beam path
    best = cap.caption_images(images, mode="beam")
    assert [alts[0][0] for alts in nbest] == best
