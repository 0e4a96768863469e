"""Int8 backbone PTQ: numerics bound + functional caption stability."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from show_and_tell_tpu.config import Config
from show_and_tell_tpu.models import quantize
from show_and_tell_tpu.models.encoders import init_vgg16, vgg16_features


def _images(n=4, size=64, seed=0):
    rng = np.random.default_rng(seed)
    # image-like statistics post-normalize: zero-ish mean, unit-ish scale
    return jnp.asarray(rng.standard_normal((n, size, size, 3)), jnp.float32)


def test_quantized_features_close_to_f32():
    frozen = {"convs": init_vgg16(jax.random.PRNGKey(0))["convs"]}
    imgs = _images()
    q = quantize.quantize_vgg16(frozen, imgs)
    assert quantize.is_quantized(q) and not quantize.is_quantized(frozen)
    f = np.asarray(vgg16_features(frozen, imgs))
    g = np.asarray(quantize.vgg16_features_q(q, imgs))
    assert f.shape == g.shape
    cos = quantize.feature_agreement(frozen, q, imgs)
    assert cos > 0.98, cos
    # held-out images (not the calibration batch) stay finite and close
    imgs2 = _images(seed=7)
    cos2 = quantize.feature_agreement(frozen, q, imgs2)
    assert np.isfinite(np.asarray(quantize.vgg16_features_q(q, imgs2))).all()
    assert cos2 > 0.97, cos2


def test_quantized_weight_layout():
    frozen = {"convs": init_vgg16(jax.random.PRNGKey(1))["convs"]}
    q = quantize.quantize_vgg16(frozen, _images(n=2))
    assert len(q["qconvs"]) == len(frozen["convs"]) - 1  # conv0 stays float
    for qc, conv in zip(q["qconvs"], frozen["convs"][1:]):
        assert qc["wq"].dtype == jnp.int8
        assert qc["wq"].shape == conv["w"].shape
        assert qc["sw"].shape == (conv["w"].shape[-1],)  # per-output-channel
        # dequantized weights reproduce the originals within one scale step
        deq = np.asarray(qc["wq"], np.float32) * np.asarray(qc["sw"])
        np.testing.assert_allclose(
            deq, np.asarray(conv["w"]), atol=float(np.asarray(qc["sw"]).max())
        )


def test_captioner_quantized_matches_f32_captions():
    """Train the tiny color model, then caption with and without int8
    backbone: same captions (the functional accuracy bound)."""
    from show_and_tell_tpu.serve import Captioner
    from show_and_tell_tpu.utils.vocab import Vocabulary
    from show_and_tell_tpu.train.step import make_train_state, make_train_step

    colors = {"red": (200, 30, 30), "green": (30, 200, 30),
              "blue": (30, 30, 200), "white": (230, 230, 230)}
    names = list(colors)
    vocab = Vocabulary.from_words(["a", "ball"] + names)
    cfg = Config(
        embed_size=24, hidden_size=48, crop_size=64, max_decode_len=4,
        beam_size=2,
    )
    rng = np.random.default_rng(0)
    imgs = np.stack([
        np.clip(
            np.array(colors[names[i % 4]], np.float32)[None, None, :]
            + rng.normal(0, 10, (256, 256, 3)),
            0, 255,
        ).astype(np.uint8)
        for i in range(16)
    ])
    caps, lens = vocab.encode_batch(
        [["a", names[i % 4], "ball"] for i in range(16)], 6
    )

    cap = Captioner.from_checkpoint(cfg, None, vocab, bucket_sizes=(16,))
    # train the decoder against the f32 backbone features
    from show_and_tell_tpu.data.transforms import eval_transform

    feats = cap.model.backbone_features(
        cap.frozen, eval_transform(jnp.asarray(imgs), cfg.crop_size)
    )
    state = make_train_state(cfg, cap.params)
    step = make_train_step(cap.model, cfg, donate=False)
    batch = {
        "features": feats,
        "captions": jnp.asarray(np.pad(caps, ((0, 0), (0, 0)))),
        "lengths": jnp.asarray(lens),
    }
    key = jax.random.PRNGKey(0)
    for _ in range(150):
        key, k = jax.random.split(key)
        state, metrics = step(state, cap.frozen, batch, 5e-3, 0.0, k)
    assert float(metrics["loss"]) < 0.2
    cap.params = state.params

    f32_caps = cap.caption_images(imgs, mode="beam")
    expected = [f"a {names[i % 4]} ball" for i in range(16)]
    assert sum(c == e for c, e in zip(f32_caps, expected)) >= 14

    qcfg = cfg.replace(quantize_backbone=True)
    qcap = Captioner.from_checkpoint(qcfg, None, vocab, bucket_sizes=(16,))
    qcap.params = state.params
    qcap.frozen = cap.frozen  # same backbone weights, pre-quantization
    q_caps = qcap.caption_images(imgs, mode="beam")
    assert quantize.is_quantized(qcap.frozen)  # first batch calibrated it
    assert q_caps == f32_caps  # int8 backbone preserves the captions
    # second call reuses the quantized tree (no recalibration)
    assert qcap.caption_images(imgs[:2], mode="greedy")


def test_evaluation_with_quantized_backbone():
    """The eval driver runs end to end on an int8 trunk (the
    cli.evaluate --quantize_backbone path's core)."""
    from show_and_tell_tpu.data.transforms import eval_transform
    from show_and_tell_tpu.evalsuite.driver import evaluation
    from show_and_tell_tpu.models.registry import build_model
    from show_and_tell_tpu.utils.vocab import Vocabulary

    vocab = Vocabulary.from_words(["a", "dog", "runs", "ball"])
    cfg = Config(embed_size=16, hidden_size=24, crop_size=64, max_decode_len=4,
                 beam_size=2)
    model = build_model(cfg, len(vocab))
    params, frozen = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    B = 4
    imgs = (rng.random((B, 256, 256, 3)) * 255).astype(np.uint8)
    caps, lens = vocab.encode_batch([["a", "dog", "runs"]] * B, 6)
    batches = [{
        "captions": caps, "lengths": lens,
        "imgids": list(range(B)), "cocoids": list(range(100, 100 + B)),
        "images": imgs,
    }]
    frozen_q = quantize.quantize_vgg16(
        frozen, eval_transform(jnp.asarray(imgs), cfg.crop_size)
    )
    val_loss, preds, stats = evaluation(
        model, cfg, params, None, frozen_q, batches, vocab, mode="greedy",
        ann_file=None,
    )
    assert np.isfinite(val_loss)
    assert len(preds) == B and all("caption" in p for p in preds)


def test_train_step_with_quantized_backbone():
    """make_train_step consumes an int8 trunk (frozen is stop-gradient
    either way): finite loss, params update."""
    from show_and_tell_tpu.data.transforms import eval_transform
    from show_and_tell_tpu.models.registry import build_model
    from show_and_tell_tpu.train.step import make_train_state, make_train_step
    from show_and_tell_tpu.utils.vocab import Vocabulary

    vocab = Vocabulary.from_words(["a", "dog", "runs"])
    cfg = Config(embed_size=16, hidden_size=24, crop_size=64, max_decode_len=5)
    model = build_model(cfg, len(vocab))
    params, frozen = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    imgs = (rng.random((4, 256, 256, 3)) * 255).astype(np.uint8)
    frozen_q = quantize.quantize_vgg16(
        frozen, eval_transform(jnp.asarray(imgs), cfg.crop_size)
    )
    caps, lens = vocab.encode_batch([["a", "dog", "runs"]] * 4, 6)
    state = make_train_state(cfg, params)
    step = make_train_step(model, cfg, donate=False)
    batch = {"images": jnp.asarray(imgs), "captions": jnp.asarray(caps),
             "lengths": jnp.asarray(lens)}
    new_state, metrics = step(state, frozen_q, batch, 1e-3, 0.0, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1


def test_trainer_quantizes_on_first_batch(tmp_path):
    """cli.main with quantize_backbone: the Trainer calibrates on batch 1
    and trains through the int8 trunk end to end."""
    import json

    from PIL import Image

    from show_and_tell_tpu.cli.main import main as train_main
    from show_and_tell_tpu.data.preprocess import preprocess
    from show_and_tell_tpu import ckpt

    w = str(tmp_path)
    import os
    os.makedirs(f"{w}/imgs", exist_ok=True)
    rng = np.random.default_rng(0)
    images = []
    for i in range(8):
        Image.fromarray((rng.random((256, 256, 3)) * 255).astype(np.uint8)).save(
            f"{w}/imgs/img{i}.png"
        )
        images.append({"split": "train" if i < 6 else "val", "imgid": i,
                       "cocoid": 100 + i, "filepath": "",
                       "filename": f"img{i}.png",
                       "sentences": [{"tokens": ["a", "dog", "runs"]}],
                       "sentids": [i]})
    json.dump({"images": images}, open(f"{w}/captions.json", "w"))
    cfg = Config(caption_json=f"{w}/captions.json", images_root=f"{w}/imgs",
                 vocab_path=f"{w}/vocab.json", output_json=f"{w}/data.json",
                 word_count_threshold=1, print_stats=False)
    preprocess(cfg, resize_images=True, data_root=f"{w}/resized")
    cfg = cfg.replace(
        data_json=f"{w}/data.json", expr_dir=f"{w}/exp", batch_size=3,
        num_devices=1,
        max_epochs=2, save_checkpoint_every=4, embed_size=16, hidden_size=24,
        crop_size=64, max_decode_len=5, num_buckets=1, beam_size=2,
        language_eval=0, log_step=50, quantize_backbone=True,
    )
    train_main(cfg)
    infos = ckpt.load_infos(f"{w}/exp/default/showattendtell")
    assert infos and infos["loss_history"], "training produced no history"
    losses = [v for v in infos["loss_history"].values()]
    assert all(np.isfinite(v) for v in losses)


# --------------------------------------------------------------------------
# ResNet-152 (ShowTell trunk): BN folding + int8
# --------------------------------------------------------------------------


def _randomize_bn(bn, rng):
    return {
        "scale": jnp.asarray(rng.uniform(0.5, 1.5, bn["scale"].shape).astype(np.float32)),
        "bias": jnp.asarray(rng.normal(0, 0.2, bn["bias"].shape).astype(np.float32)),
        "mean": jnp.asarray(rng.normal(0, 0.3, bn["mean"].shape).astype(np.float32)),
        "var": jnp.asarray(rng.uniform(0.5, 2.0, bn["var"].shape).astype(np.float32)),
    }


def test_bn_folding_exact():
    from show_and_tell_tpu.models.layers import batch_norm_inference, conv2d, init_conv

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    conv = init_conv(key, 3, 3, 16, 32, bias=False)
    bn = _randomize_bn(
        {"scale": np.zeros(32), "bias": np.zeros(32),
         "mean": np.zeros(32), "var": np.ones(32)}, rng,
    )
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 16)), jnp.float32)
    want = batch_norm_inference(bn, conv2d(conv, x, padding=1))
    folded = quantize._fold_conv_bn(conv, bn)
    got = conv2d({"w": jnp.asarray(folded["w"]), "b": jnp.asarray(folded["b"])},
                 x, padding=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_resnet152_quantized_features_close():
    from show_and_tell_tpu.models.encoders import init_resnet152, resnet152_features
    from show_and_tell_tpu.models.quantize import _cosine

    rng = np.random.default_rng(0)
    frozen = init_resnet152(jax.random.PRNGKey(0))
    # randomize BN stats so the folding actually does something
    frozen["stem_bn"] = _randomize_bn(frozen["stem_bn"], rng)
    for blocks in frozen["layers"]:
        for blk in blocks:
            for k in list(blk):
                if k.startswith("bn") or k == "down_bn":
                    blk[k] = _randomize_bn(blk[k], rng)
    imgs = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    q = quantize.quantize_resnet152(frozen, imgs)
    assert quantize.is_quantized(q)
    f = np.asarray(resnet152_features(frozen, imgs))
    g = np.asarray(quantize.resnet152_features_q(q, imgs))
    assert f.shape == g.shape == (2, 2048)
    assert np.isfinite(g).all()
    cos = _cosine(f, g)
    assert cos > 0.95, cos


def test_show_tell_captioner_quantized_smoke():
    from show_and_tell_tpu.serve import Captioner
    from show_and_tell_tpu.utils.vocab import Vocabulary

    cfg = Config(
        model="show_tell", embed_size=16, hidden_size=24, crop_size=64,
        max_decode_len=4, beam_size=2, quantize_backbone=True,
    )
    vocab = Vocabulary.from_words(["a", "dog", "runs"])
    cap = Captioner.from_checkpoint(cfg, None, vocab, bucket_sizes=(2,))
    imgs = (np.random.default_rng(0).random((2, 256, 256, 3)) * 255).astype(np.uint8)
    caps = cap.caption_images(imgs, mode="greedy")
    assert len(caps) == 2
    assert quantize.is_quantized(cap.frozen)
    assert "qlayers" in cap.frozen  # the ResNet recipe, not the VGG one


def test_quantized_tree_save_load_roundtrip(tmp_path):
    """Calibrated trees persist (serving replicas share one calibration)."""
    frozen = {"convs": init_vgg16(jax.random.PRNGKey(2))["convs"]}
    imgs = _images(n=2)
    q = quantize.quantize_vgg16(frozen, imgs)
    p = str(tmp_path / "backbone.int8.msgpack")
    quantize.save_quantized(p, q)
    # atomic write: no stale tmp artifact left behind (review fix — a
    # replica racing the writer must never see a torn msgpack)
    assert not os.path.exists(p + ".tmp")
    q2 = quantize.load_quantized(p)
    assert quantize.is_quantized(q2)
    a = np.asarray(quantize.vgg16_features_q(q, imgs))
    b = np.asarray(quantize.vgg16_features_q(q2, imgs))
    np.testing.assert_array_equal(a, b)
    assert np.asarray(q2["qconvs"][0]["wq"]).dtype == np.int8
    bad = str(tmp_path / "bad.msgpack")
    quantize.save_quantized(bad, {"convs": []})  # writes fine (any tree)
    with pytest.raises(ValueError, match="not a quantized"):
        quantize.load_quantized(bad)


def test_obtain_quantized_shares_calibration(tmp_path):
    """obtain_quantized(path=...) calibrates once, persists, and every
    later call loads the SAME tree regardless of its own calib batch."""
    frozen = {"convs": init_vgg16(jax.random.PRNGKey(3))["convs"]}
    p = str(tmp_path / "cal.msgpack")
    q1 = quantize.obtain_quantized("vgg16", frozen, _images(seed=1), path=p)
    # different calibration images -> would give different scales, but the
    # persisted tree wins
    q2 = quantize.obtain_quantized("vgg16", frozen, _images(seed=9), path=p)
    np.testing.assert_array_equal(
        np.asarray(q1["qconvs"][0]["sx"]), np.asarray(q2["qconvs"][0]["sx"])
    )
    # without a path, fresh calibration differs
    q3 = quantize.quantize_vgg16(frozen, _images(seed=9))
    assert float(q3["qconvs"][0]["sx"]) != float(q1["qconvs"][0]["sx"])


def test_inception_v3_quantized_features_close():
    from show_and_tell_tpu.models.encoders import (
        init_inception_v3,
        inception_v3_features,
    )

    frozen = init_inception_v3(jax.random.PRNGKey(0))
    # 96px: smallest convenient size that survives the VALID stem/reduction
    # stack; random weights + image-like inputs
    imgs = _images(n=2, size=96)
    q = quantize.quantize_inception_v3(frozen, imgs)
    assert quantize.is_quantized(q) and not quantize.is_quantized(frozen)
    # stem stays float, every other BasicConv2d node is int8-folded
    qt = q["qinception"]
    assert "conv" in qt["Conv2d_1a_3x3"] and "wq" not in qt["Conv2d_1a_3x3"]
    assert qt["Conv2d_2a_3x3"]["wq"].dtype == jnp.int8
    assert qt["Mixed_7c"]["branch_pool"]["wq"].dtype == jnp.int8
    f = np.asarray(inception_v3_features(frozen, imgs))
    g = np.asarray(quantize.inception_v3_features_q(q, imgs))
    assert f.shape == g.shape == (2, 2048)
    cos = quantize.feature_agreement(frozen, q, imgs)
    assert cos > 0.97, cos
    # held-out batch: finite + close (calibrated scales generalize)
    imgs2 = _images(n=2, size=96, seed=3)
    assert np.isfinite(np.asarray(quantize.inception_v3_features_q(q, imgs2))).all()
    assert quantize.feature_agreement(frozen, q, imgs2) > 0.96


def test_inception_v3_quantized_save_load_roundtrip(tmp_path):
    from show_and_tell_tpu.models.encoders import init_inception_v3

    frozen = init_inception_v3(jax.random.PRNGKey(1))
    imgs = _images(n=2, size=96, seed=1)
    q = quantize.quantize_inception_v3(frozen, imgs)
    p = str(tmp_path / "q_inc.msgpack")
    quantize.save_quantized(p, q)
    q2 = quantize.load_quantized(p)
    a = np.asarray(quantize.inception_v3_features_q(q, imgs))
    b = np.asarray(quantize.inception_v3_features_q(q2, imgs))
    np.testing.assert_array_equal(a, b)
    # wrong-architecture guard: a vgg model must refuse this tree
    with pytest.raises(ValueError, match="calibrated for inception_v3"):
        quantize.obtain_quantized("vgg16", frozen, imgs, path=p)


def test_warmup_never_calibrates_on_dummies():
    """warmup() with quantize_backbone on and no calibration source must
    NOT calibrate int8 scales from its zero dummy batches (constant
    images produce absmax scales that clip every real activation);
    calibration defers to the first real batch. With calib_images,
    warmup calibrates from them at startup."""
    from show_and_tell_tpu.serve import Captioner
    from show_and_tell_tpu.utils.vocab import Vocabulary

    vocab = Vocabulary.from_words(["a", "ball"])
    cfg = Config(
        embed_size=16, hidden_size=24, crop_size=32, max_decode_len=3,
        beam_size=2, quantize_backbone=True,
    )
    cap = Captioner.from_checkpoint(cfg, None, vocab, bucket_sizes=(2,))
    cap.warmup(modes=("greedy",))
    assert not quantize.is_quantized(cap.frozen)  # zeros never calibrate
    rng = np.random.default_rng(0)
    imgs = (rng.random((2, 256, 256, 3)) * 255).astype(np.uint8)
    cap.caption_images(imgs, mode="greedy")  # first real batch calibrates
    assert quantize.is_quantized(cap.frozen)

    cap2 = Captioner.from_checkpoint(cfg, None, vocab, bucket_sizes=(2,))
    cap2.warmup(modes=("greedy",), calib_images=imgs)
    assert quantize.is_quantized(cap2.frozen)  # calibrated at startup
