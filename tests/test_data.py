"""Data layer: preprocessing, bucketing, pipeline, device transforms."""

import json
import os

import numpy as np
import pytest

from show_and_tell_tpu.config import Config
from show_and_tell_tpu.data.dataset import CocoCaptionDataset
from show_and_tell_tpu.data.pipeline import Loader
from show_and_tell_tpu.data.preprocess import build_vocab, preprocess, resize_image
from show_and_tell_tpu.utils.vocab import PAD_ID, START_ID, END_ID, Vocabulary


def make_karpathy_json(tmp_path, n_images=6):
    """Synthetic Karpathy-format annotation file + images on disk."""
    from PIL import Image

    words = ["a", "man", "rides", "horse", "dog", "runs", "fast", "tall", "rare1"]
    images = []
    img_dir = tmp_path / "imgs"
    os.makedirs(img_dir, exist_ok=True)
    for i in range(n_images):
        fname = f"img{i}.png"
        arr = (np.random.default_rng(i).random((64, 48, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / fname)
        sents = []
        for s in range(2):
            toks = words[: 2 + (i + s) % 5]
            sents.append({"tokens": toks})
        images.append(
            {
                "split": "train" if i < 4 else "val",
                "imgid": i,
                "cocoid": 1000 + i,
                "filepath": "",
                "filename": fname,
                "sentences": sents,
                "sentids": [i * 2, i * 2 + 1],
            }
        )
    ann = tmp_path / "captions.json"
    with open(ann, "w") as f:
        json.dump({"images": images}, f)
    return str(ann), str(img_dir)


def test_build_vocab_threshold(tmp_path):
    # Controlled corpus so the threshold genuinely excludes something:
    # counts are a=2, man=2, rides=1, rare1=1 — threshold 2 must keep
    # {a, man} and map {rides, rare1} to <unk> (preprocess keeps
    # cnt >= word_count_threshold).
    images = [
        {"split": "train", "imgid": 0, "cocoid": 1000, "filepath": "",
         "filename": "x0.png", "sentids": [0],
         "sentences": [{"tokens": ["a", "man", "rides"]}]},
        {"split": "train", "imgid": 1, "cocoid": 1001, "filepath": "",
         "filename": "x1.png", "sentids": [1],
         "sentences": [{"tokens": ["a", "man", "rare1"]}]},
    ]
    ann = tmp_path / "thresh.json"
    with open(ann, "w") as f:
        json.dump({"images": images}, f)
    vocab, imgs = build_vocab(str(ann), word_count_threshold=2, show_stats=False)
    assert vocab("a") >= 4 and vocab("man") >= 4  # specials occupy 0..3
    assert vocab("rides") == 3 and vocab("rare1") == 3  # below threshold -> <unk>
    assert len(imgs) == 2
    # threshold 1 keeps everything — proves the filter (not absence) did it
    vocab1, _ = build_vocab(str(ann), word_count_threshold=1, show_stats=False)
    assert vocab1("rides") >= 4 and vocab1("rare1") >= 4


def test_preprocess_outputs(tmp_path):
    ann, img_root = make_karpathy_json(tmp_path)
    cfg = Config(
        caption_json=ann,
        images_root=img_root,
        vocab_path=str(tmp_path / "vocab.json"),
        output_json=str(tmp_path / "data.json"),
        word_count_threshold=1,
        print_stats=False,
    )
    vp, dp = preprocess(cfg)
    vocab = Vocabulary.load(vp)
    with open(dp) as f:
        records = json.load(f)
    assert len(records) == 12  # one record per sentence
    lens = [len(r["final_caption"]) for r in records]
    assert lens == sorted(lens)  # ascending sort (preprocess.py:133)
    assert {r["split"] for r in records} == {"train", "val"}
    assert all("cocoid" in r and "imgid" in r and "file_path" in r for r in records)


def test_resize_image_grayscale(tmp_path):
    from PIL import Image

    src = tmp_path / "g.png"
    Image.fromarray((np.ones((40, 30)) * 128).astype(np.uint8)).save(src)
    dst = tmp_path / "g_rgb.png"
    assert resize_image(str(src), str(dst), size=32)
    out = np.asarray(Image.open(dst))
    assert out.shape == (32, 32, 3)


def _records(n=20, split="train"):
    rng = np.random.default_rng(0)
    recs = []
    for i in range(n):
        L = int(rng.integers(2, 12))
        recs.append(
            {
                "split": split,
                "imgid": i,
                "cocoid": i,
                "file_path": f"none{i}.png",
                "final_caption": ["w"] * L,
                "sentids": i,
            }
        )
    return recs


def test_bucketing_invariants():
    vocab = Vocabulary.from_words(["w"])
    ds = CocoCaptionDataset(_records(50), vocab, split="train", num_buckets=3)
    all_idx = np.concatenate([b["indices"] for b in ds.buckets])
    assert sorted(all_idx) == list(range(50))  # partition, no loss/dup
    for b in ds.buckets:
        for i in b["indices"]:
            enc_len = len(ds.data[i]["final_caption"]) + 2
            assert enc_len <= b["pad_len"]
        assert b["pad_len"] % 4 == 0  # rounded for TPU-friendly shapes


def test_batches_static_shapes_and_padding():
    vocab = Vocabulary.from_words(["w"])
    ds = CocoCaptionDataset(_records(10), vocab, num_buckets=2)
    loader = Loader(ds, batch_size=4, shuffle=False, load_images=False)
    batches = list(loader)
    assert len(loader) == len(batches)
    for b in batches:
        assert b["captions"].shape[0] == 4  # padded to full batch
        assert b["captions"].dtype == np.int32
        assert (b["captions"][:, 0] == START_ID).all()
        # every row ends with <end> then pads
        for row, ln in zip(b["captions"], b["lengths"]):
            assert row[ln - 1] == END_ID
            assert (row[ln:] == PAD_ID).all()


def test_loader_bounded_prefetch_and_abandon():
    """A slow consumer must not cause the whole epoch to materialize: at most
    prefetch_depth + num_workers batches may ever be in flight. Abandoning
    iteration must stop the producer instead of decoding the rest."""
    import threading
    import time

    vocab = Vocabulary.from_words(["w"])
    ds = CocoCaptionDataset(_records(400), vocab, num_buckets=1)
    loader = Loader(
        ds, batch_size=4, num_workers=2, prefetch_depth=2, load_images=False
    )
    n_batches = len(loader)
    assert n_batches >= 50
    materialized = []
    lock = threading.Lock()
    orig = loader._materialize

    def counting(plan):
        with lock:
            materialized.append(1)
        return orig(plan)

    loader._materialize = counting
    it = iter(loader)
    next(it)
    time.sleep(0.5)  # give an eager producer time to run away
    limit = loader.prefetch_depth + loader.num_workers + 1  # +1 consumed
    assert len(materialized) <= limit, (len(materialized), limit)
    # abandoning stops the producer
    it.close()
    # poll until the count is stable for several consecutive checks — a fixed
    # two-snapshot comparison races a worker that was mid-_materialize at
    # close() on an oversubscribed machine
    deadline = time.monotonic() + 10.0
    stable, prev = 0, -1
    while stable < 5 and time.monotonic() < deadline:
        time.sleep(0.1)
        cur = len(materialized)
        stable = stable + 1 if cur == prev else 0
        prev = cur
    assert stable >= 5, "materialize count never stabilized after close()"
    assert len(materialized) < n_batches


def test_loader_deterministic_and_reiterable():
    vocab = Vocabulary.from_words(["w"])
    ds = CocoCaptionDataset(_records(16), vocab, num_buckets=2)
    l1 = Loader(ds, batch_size=4, seed=7, load_images=False)
    a = [b["imgids"] for b in l1]
    l2 = Loader(ds, batch_size=4, seed=7, load_images=False)
    b_ = [b["imgids"] for b in l2]
    assert a == b_
    # second epoch reshuffles
    c = [b["imgids"] for b in l1]
    assert a != c


def test_loader_set_epoch_resume_determinism():
    """set_epoch pins the shuffle so a resumed process reproduces an epoch's
    batch order regardless of how many epochs this process already ran."""
    vocab = Vocabulary.from_words(["w"])
    ds = CocoCaptionDataset(_records(16), vocab, num_buckets=2)
    l1 = Loader(ds, batch_size=4, seed=7, load_images=False)
    l1.set_epoch(3)
    a = [b["imgids"] for b in l1]
    l2 = Loader(ds, batch_size=4, seed=7, load_images=False)
    _ = [b for b in l2]  # consume an epoch first (simulates pre-crash run)
    l2.set_epoch(3)
    b_ = [b["imgids"] for b in l2]
    assert a == b_


def test_loader_resume_skip():
    """set_resume_skip drops the first n batch plans of the next epoch only
    (resume replay without decode), preserving the order past the skip."""
    vocab = Vocabulary.from_words(["w"])
    ds = CocoCaptionDataset(_records(16), vocab, num_buckets=2)
    l1 = Loader(ds, batch_size=4, seed=7, load_images=False)
    l1.set_epoch(2)
    full = [b["imgids"] for b in l1]
    l2 = Loader(ds, batch_size=4, seed=7, load_images=False)
    l2.set_epoch(2)
    l2.set_resume_skip(2)
    tail = [b["imgids"] for b in l2]
    assert tail == full[2:]
    # the skip is one-shot: a fresh epoch on the same loader is complete
    l2.set_epoch(2)
    assert [b["imgids"] for b in l2] == full


def test_loader_with_images(tmp_path):
    ann, img_root = make_karpathy_json(tmp_path)
    cfg = Config(
        caption_json=ann,
        images_root=img_root,
        vocab_path=str(tmp_path / "vocab.json"),
        output_json=str(tmp_path / "data.json"),
        word_count_threshold=1,
        print_stats=False,
    )
    preprocess(cfg, resize_images=True, data_root=str(tmp_path / "resized"))
    vocab = Vocabulary.load(cfg.vocab_path)
    with open(cfg.output_json) as f:
        records = json.load(f)
    ds = CocoCaptionDataset(records, vocab, split="train", num_buckets=2)
    loader = Loader(ds, batch_size=4, num_workers=2, image_size=256)
    batch = next(iter(loader))
    assert batch["images"].shape == (4, 256, 256, 3)
    assert batch["images"].dtype == np.uint8


def test_loader_with_features():
    vocab = Vocabulary.from_words(["w"])
    ds = CocoCaptionDataset(_records(8), vocab, num_buckets=1)
    feats = {i: np.random.default_rng(i).random((4, 512)) for i in range(8)}
    loader = Loader(ds, batch_size=4, load_images=False, features=feats)
    batch = next(iter(loader))
    assert batch["features"].shape == (4, 4, 512)
    assert batch["features"].dtype == np.float32


def test_device_transforms():
    import jax
    import jax.numpy as jnp

    from show_and_tell_tpu.data.transforms import (
        center_crop,
        eval_transform,
        train_transform,
    )

    imgs = (np.random.default_rng(0).random((3, 256, 256, 3)) * 255).astype(np.uint8)
    out = eval_transform(jnp.asarray(imgs), 224)
    assert out.shape == (3, 224, 224, 3)
    # normalize: a mid-gray pixel maps near zero
    gray = jnp.full((1, 8, 8, 3), 124, jnp.uint8)
    normed = eval_transform(gray, 8)
    assert abs(float(normed.mean())) < 0.4
    out2 = train_transform(jax.random.PRNGKey(0), jnp.asarray(imgs), 224)
    assert out2.shape == (3, 224, 224, 3)
    out3 = train_transform(jax.random.PRNGKey(1), jnp.asarray(imgs), 224)
    assert not np.allclose(np.asarray(out2), np.asarray(out3))  # random aug
    c = center_crop(jnp.asarray(imgs), 224)
    np.testing.assert_array_equal(np.asarray(c), np.asarray(imgs)[:, 16:240, 16:240])


def test_resize_image_palette_mode_preserves_colors(tmp_path):
    """A palette-mode (P) PNG must convert through the palette, not treat
    its 2-D palette indices as gray pixel values (review fix — a solid red
    P-mode image came out near-black)."""
    from PIL import Image

    rgb = np.zeros((40, 30, 3), np.uint8)
    rgb[..., 0] = 255  # solid red
    src = tmp_path / "p.png"
    Image.fromarray(rgb).convert("P", palette=Image.ADAPTIVE).save(src)
    dst = tmp_path / "p_rgb.png"
    assert resize_image(str(src), str(dst), size=32)
    out = np.asarray(Image.open(dst))
    assert out.shape == (32, 32, 3)
    assert out[..., 0].mean() > 200 and out[..., 1].mean() < 30


def test_resize_image_la_mode_saves_as_jpeg(tmp_path):
    """LA-mode (gray+alpha) sources must save as JPEG instead of raising
    'cannot write mode LA as JPEG' (review fix)."""
    from PIL import Image

    src = tmp_path / "la.png"
    Image.fromarray((np.ones((40, 30)) * 200).astype(np.uint8)).convert(
        "LA"
    ).save(src)
    dst = tmp_path / "la.jpg"
    assert resize_image(str(src), str(dst), size=32)
    assert np.asarray(Image.open(dst)).shape == (32, 32, 3)


def test_preprocess_skips_failed_resizes(tmp_path):
    """One unreadable image must not abort the offline pass: its caption
    records are dropped and the run completes (review fix — the reference's
    swallow-and-report contract, preprocess.py:89-92)."""
    ann, img_root = make_karpathy_json(tmp_path)
    # corrupt one source image
    imgs = sorted(os.listdir(img_root))
    with open(os.path.join(img_root, imgs[0]), "wb") as f:
        f.write(b"not an image")
    cfg = Config(
        caption_json=ann,
        images_root=img_root,
        vocab_path=str(tmp_path / "vocab2.json"),
        output_json=str(tmp_path / "data2.json"),
        word_count_threshold=1,
        print_stats=False,
    )
    preprocess(cfg, resize_images=True, data_root=str(tmp_path / "resized2"))
    with open(cfg.output_json) as f:
        records = json.load(f)
    assert records  # the rest of the dataset survived
    assert all(imgs[0] not in r["file_path"] for r in records)



def test_loader_native_decode_fails_fast(monkeypatch):
    """native_decode=True without the C++ decoder built raises at Loader
    CONSTRUCTION, not as an opaque future.result() error mid-epoch
    (review fix)."""
    import pytest

    from show_and_tell_tpu.data import pipeline as pl

    vocab = Vocabulary.from_words(["w"])
    ds = CocoCaptionDataset(_records(4), vocab, num_buckets=1)
    monkeypatch.setattr(pl, "_native_available", lambda: False)
    with pytest.raises(RuntimeError, match="native_decode=True"):
        pl.Loader(ds, batch_size=2, native_decode=True)
    # explicit False and auto (None) still construct fine
    pl.Loader(ds, batch_size=2, native_decode=False, load_images=False)
    pl.Loader(ds, batch_size=2, load_images=False)
