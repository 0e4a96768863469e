"""Decode-free memmap image shards (VERDICT r4 item 3 / data/memmap.py).

Pins: pack->read bit-identity with the online decode path, shard-boundary
addressing, undecodable-image exclusion + loader fallback, loader fast
path (full hit) and mixed-batch path, idempotent re-pack, size mismatch
guard, and the preprocess/CLI integration.
"""

import json
import os

import numpy as np
import pytest
from PIL import Image

from show_and_tell_tpu.data.memmap import INDEX, MemmapImages, pack_memmap
from show_and_tell_tpu.data.pipeline import Loader, _load_image


def _write_images(d, n, size=32, prefix="im"):
    paths = []
    rng = np.random.default_rng(7)
    for i in range(n):
        p = os.path.join(d, f"{prefix}{i}.png")
        Image.fromarray(
            rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
        ).save(p)
        paths.append(p)
    return paths


def test_pack_and_read_bit_identical(tmp_path):
    imgs = _write_images(str(tmp_path), 5)
    out = str(tmp_path / "mm")
    idx = pack_memmap(imgs, out, size=32, items_per_shard=2)
    assert os.path.exists(idx)
    mm = MemmapImages(out)
    assert len(mm) == 5
    # 5 items at 2/shard -> 3 shards; boundary rows land where expected
    assert len(mm.shard_names) == 3
    for p in imgs:
        np.testing.assert_array_equal(mm.get(p), _load_image(p, 32))
    batch = mm.get_batch(imgs[1:4])
    for i, p in enumerate(imgs[1:4]):
        np.testing.assert_array_equal(batch[i], _load_image(p, 32))


def test_pack_skips_undecodable_and_is_idempotent(tmp_path):
    imgs = _write_images(str(tmp_path), 3)
    bad = str(tmp_path / "bad.png")
    with open(bad, "wb") as f:
        f.write(b"not an image")
    out = str(tmp_path / "mm")
    pack_memmap(imgs + [bad], out, size=32)
    mm = MemmapImages(out)
    assert bad not in mm and len(mm) == 3
    # re-pack with a subset: existing complete index is reused untouched
    before = os.path.getmtime(os.path.join(out, INDEX))
    pack_memmap(imgs[:2], out, size=32)
    assert os.path.getmtime(os.path.join(out, INDEX)) == before


class _DS:
    """Minimal dataset stub exposing the Loader contract."""

    def __init__(self, paths):
        self.paths = paths

    def num_batches(self, bs, drop_remainder=False):
        return (len(self.paths) + bs - 1) // bs

    def iter_index_batches(self, bs, shuffle, rng, drop_remainder=False):
        for lo in range(0, len(self.paths), bs):
            yield {"indices": list(range(lo, min(lo + bs, len(self.paths)))),
                   "pad_len": 4}

    def encode_indices(self, idx, pad_len):
        caps = np.ones((len(idx), pad_len), np.int32)
        return caps, np.full((len(idx),), pad_len, np.int32)

    def batch_meta(self, idx):
        return {
            "imgids": [i for i in idx],
            "cocoids": [i for i in idx],
            "paths": [self.paths[i] for i in idx],
        }


def test_loader_memmap_fast_path_matches_decode(tmp_path):
    imgs = _write_images(str(tmp_path), 6)
    out = str(tmp_path / "mm")
    pack_memmap(imgs, out, size=32)
    kw = dict(batch_size=3, shuffle=False, num_workers=1, image_size=32)
    plain = list(Loader(_DS(imgs), **kw))
    mapped = list(Loader(_DS(imgs), memmap_images=out, **kw))
    assert len(plain) == len(mapped) == 2
    for a, b in zip(plain, mapped):
        np.testing.assert_array_equal(a["images"], b["images"])
        np.testing.assert_array_equal(a["captions"], b["captions"])


def test_loader_mixed_batch_falls_back_for_missing_keys(tmp_path):
    imgs = _write_images(str(tmp_path), 4)
    out = str(tmp_path / "mm")
    pack_memmap(imgs[:2], out, size=32)  # half the batch misses the index
    loader = Loader(
        _DS(imgs), batch_size=4, shuffle=False, num_workers=1,
        image_size=32, memmap_images=out,
    )
    (batch,) = list(loader)
    for i, p in enumerate(imgs):
        np.testing.assert_array_equal(batch["images"][i], _load_image(p, 32))


def test_loader_memmap_with_corrupt_miss_substitutes(tmp_path):
    imgs = _write_images(str(tmp_path), 3)
    bad = str(tmp_path / "bad.png")
    with open(bad, "wb") as f:
        f.write(b"nope")
    out = str(tmp_path / "mm")
    pack_memmap(imgs + [bad], out, size=32)  # bad is excluded from index
    loader = Loader(
        _DS(imgs + [bad]), batch_size=4, shuffle=False, num_workers=1,
        image_size=32, memmap_images=out,
    )
    (batch,) = list(loader)
    assert loader.corrupt_skipped == 1
    # the corrupt row was substituted by a healthy in-batch record
    assert not np.all(batch["images"][3] == 0)


def test_size_mismatch_guard(tmp_path):
    imgs = _write_images(str(tmp_path), 2)
    out = str(tmp_path / "mm")
    pack_memmap(imgs, out, size=32)
    with pytest.raises(ValueError, match="32px"):
        Loader(_DS(imgs), batch_size=2, image_size=64, memmap_images=out)


def test_preprocess_writes_memmap_and_make_loader_uses_it(tmp_path):
    from show_and_tell_tpu.config import Config
    from show_and_tell_tpu.data.dataset import CocoCaptionDataset
    from show_and_tell_tpu.data.pipeline import make_loader
    from show_and_tell_tpu.data.preprocess import preprocess
    from show_and_tell_tpu.utils.vocab import Vocabulary

    d = str(tmp_path)
    imgs = _write_images(d, 4, size=64)
    caption_json = {
        "images": [
            {
                "split": "train", "imgid": i, "cocoid": 100 + i,
                "filepath": "", "filename": os.path.basename(p),
                "sentences": [{"tokens": ["a", "dog"]}], "sentids": [i],
            }
            for i, p in enumerate(imgs)
        ]
    }
    with open(f"{d}/captions.json", "w") as f:
        json.dump(caption_json, f)
    cfg = Config(
        caption_json=f"{d}/captions.json",
        images_root=d,
        vocab_path=f"{d}/vocab.json",
        output_json=f"{d}/data.json",
        word_count_threshold=1,
        print_stats=False,
        memmap_dir=f"{d}/mm",
        num_workers=2,
    )
    preprocess(cfg, resize_images=True, data_root=f"{d}/resized")
    assert os.path.exists(f"{d}/mm/{INDEX}")

    records = json.load(open(f"{d}/data.json"))
    vocab = Vocabulary.load(cfg.vocab_path)
    ds = CocoCaptionDataset(records, vocab, "train", 10, 1)
    loader = make_loader(cfg.replace(data_json=f"{d}/data.json",
                                     batch_size=4), ds, mode="val")
    assert loader.memmap_images is not None
    (batch,) = list(loader)
    np.testing.assert_array_equal(
        batch["images"][0], _load_image(records[0]["file_path"], 256)
    )
