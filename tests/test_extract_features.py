"""Feature-extraction workflow: encode once, train/decode from the .npz."""

import json

import numpy as np

from show_and_tell_tpu.cli.extract_features import extract
from show_and_tell_tpu.config import Config
from show_and_tell_tpu.data.dataset import CocoCaptionDataset
from show_and_tell_tpu.data.pipeline import Loader
from show_and_tell_tpu.data.preprocess import preprocess
from show_and_tell_tpu.utils.vocab import Vocabulary
from tests.test_data import make_karpathy_json


def test_extract_and_train_from_features(tmp_path):
    ann, img_root = make_karpathy_json(tmp_path)
    cfg = Config(
        caption_json=ann,
        images_root=img_root,
        vocab_path=str(tmp_path / "vocab.json"),
        output_json=str(tmp_path / "data.json"),
        word_count_threshold=1,
        print_stats=False,
        crop_size=32,
        embed_size=16,
        hidden_size=32,
        batch_size=4,
        num_buckets=1,
    )
    preprocess(cfg, resize_images=True, data_root=str(tmp_path / "resized"))

    cfg = cfg.replace(
        data_json=cfg.output_json, output_json=str(tmp_path / "feats.npz")
    )
    path = extract(cfg, splits=("train", "val"))

    blob = np.load(path)
    assert len(blob.files) == 6  # one entry per unique image
    # SAT features: [L, 512] grid with L = (32/16)^2 = 4
    assert blob[blob.files[0]].shape == (4, 512)

    # decoder-only loader consumes the npz directly
    vocab = Vocabulary.load(cfg.vocab_path)
    with open(cfg.data_json) as f:
        records = json.load(f)
    ds = CocoCaptionDataset(records, vocab, "train", num_buckets=1)
    loader = Loader(ds, batch_size=4, load_images=False, features=path)
    batch = next(iter(loader))
    assert batch["features"].shape == (4, 4, 512)
    assert "images" not in batch

    # features path trains (no images anywhere)
    import jax

    from show_and_tell_tpu.models.registry import build_model
    from show_and_tell_tpu.train.step import make_train_state, make_train_step

    model = build_model(cfg, len(vocab))
    params, frozen = model.init(jax.random.PRNGKey(0))
    state = make_train_state(cfg, params)
    step = make_train_step(model, cfg, donate=False)
    dev_batch = {k: batch[k] for k in ("captions", "lengths", "features")}
    state, m = step(state, frozen, dev_batch, 1e-3, 0.0, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))


def test_npz_loader_thread_safety(tmp_path):
    """Concurrent worker lookups into one NpzFile must be race-free and
    produce the same batches as a single worker."""
    rng = np.random.default_rng(0)
    n = 32
    np.savez(tmp_path / "f.npz", **{str(i): rng.standard_normal((4, 8)).astype(np.float32) for i in range(n)})
    recs = [
        {"split": "train", "imgid": i, "cocoid": i, "file_path": "x",
         "final_caption": ["w"] * 3, "sentids": i}
        for i in range(n)
    ]
    vocab = Vocabulary.from_words(["w"])
    ds = CocoCaptionDataset(recs, vocab, num_buckets=1)
    l1 = Loader(ds, batch_size=4, shuffle=False, load_images=False,
                features=str(tmp_path / "f.npz"), num_workers=8, prefetch_depth=8)
    l2 = Loader(ds, batch_size=4, shuffle=False, load_images=False,
                features=str(tmp_path / "f.npz"), num_workers=1)
    for a, b in zip(l1, l2):
        np.testing.assert_array_equal(a["features"], b["features"])
        assert a["cocoids"] == b["cocoids"]


def test_features_path_config_wires_loaders(tmp_path):
    """--features_path flows Config -> make_loader -> Loader: batches carry
    features, never images (the decoder-only CLI workflow)."""
    ann, img_root = make_karpathy_json(tmp_path)
    cfg = Config(
        caption_json=ann,
        images_root=img_root,
        vocab_path=str(tmp_path / "vocab.json"),
        output_json=str(tmp_path / "data.json"),
        word_count_threshold=1,
        print_stats=False,
        crop_size=32,
        embed_size=16,
        hidden_size=32,
        batch_size=4,
        num_buckets=1,
    )
    preprocess(cfg, resize_images=True, data_root=str(tmp_path / "resized"))
    cfg = cfg.replace(
        data_json=cfg.output_json, output_json=str(tmp_path / "feats.npz")
    )
    path = extract(cfg, splits=("train", "val"))

    from show_and_tell_tpu.data.pipeline import make_loader

    cfg = cfg.replace(features_path=path)
    vocab = Vocabulary.load(cfg.vocab_path)
    with open(cfg.data_json) as f:
        records = json.load(f)
    ds = CocoCaptionDataset(records, vocab, "train", num_buckets=1)
    loader = make_loader(cfg, ds, mode="train")
    batch = next(iter(loader))
    assert "features" in batch and "images" not in batch
    assert batch["features"].shape[0] == 4
