"""Corrupt-input policy: one bad image file must not kill an epoch or a
serving batch (VERDICT r2 item 6 — the online extension of the reference's
offline swallow-and-report contract, preprocess.py:89-92).

Fixtures cover the realistic failure zoo: zero-byte file, truncated JPEG,
wrong-format bytes behind an image extension, and a missing path; exercised
on both the PIL and (when built) the C++ decoder paths.
"""

import json

import numpy as np
import pytest
from PIL import Image

from show_and_tell_tpu.config import Config
from show_and_tell_tpu.data.dataset import CocoCaptionDataset
from show_and_tell_tpu.data import pipeline
from show_and_tell_tpu.data.pipeline import Loader, _load_image_checked
from show_and_tell_tpu.serve import Captioner, ERROR_CAPTION
from show_and_tell_tpu.utils.vocab import Vocabulary


def _good_image(path, seed=0, size=64):
    rng = np.random.default_rng(seed)
    Image.fromarray((rng.random((size, size, 3)) * 255).astype(np.uint8)).save(path)
    return str(path)


def _corrupt_fixtures(tmp_path):
    """{name: path} of files that must all fail to decode."""
    zero = tmp_path / "zero.jpg"
    zero.write_bytes(b"")
    trunc = tmp_path / "trunc.jpg"
    whole = tmp_path / "whole.jpg"
    _good_image(whole, seed=1, size=128)
    data = whole.read_bytes()
    trunc.write_bytes(data[: len(data) // 2])
    text = tmp_path / "text.png"
    text.write_bytes(b"this is not an image at all")
    missing = tmp_path / "does_not_exist.jpg"
    return {"zero": str(zero), "trunc": str(trunc), "text": str(text),
            "missing": str(missing)}


def test_load_image_checked_failure_zoo(tmp_path):
    good = _good_image(tmp_path / "ok.png")
    img, ok = _load_image_checked(good, 64)
    assert ok and img.shape == (64, 64, 3)
    for name, path in _corrupt_fixtures(tmp_path).items():
        img, ok = _load_image_checked(path, 64)
        assert not ok, name
        assert img.shape == (64, 64, 3) and img.dtype == np.uint8
        assert not img.any()


def _dataset(tmp_path, paths):
    vocab = Vocabulary.from_words(["a", "dog", "runs", "sits"])
    recs = []
    for i, p in enumerate(paths):
        recs.append({
            "split": "train", "imgid": i, "cocoid": i, "file_path": p,
            "final_caption": ["a", "dog", "runs"], "sentids": i,
        })
    return CocoCaptionDataset(recs, vocab, split="train", num_buckets=1)


@pytest.mark.parametrize("native", [False, None])
def test_loader_substitutes_corrupt_records(tmp_path, native):
    if native is None and not pipeline._native_available():
        pytest.skip("native decoder not built")
    bad = _corrupt_fixtures(tmp_path)
    paths = [_good_image(tmp_path / f"g{i}.png", seed=i, size=256) for i in range(5)]
    paths.insert(2, bad["trunc"])
    paths.insert(4, bad["text"])
    ds = _dataset(tmp_path, paths)
    loader = Loader(ds, batch_size=7, shuffle=False, num_workers=2,
                    image_size=256, native_decode=native)
    batches = list(loader)
    assert loader.corrupt_skipped == 2
    total = sum(b["images"].shape[0] for b in batches)
    assert total == 7  # static shapes preserved; nothing dropped
    for b in batches:
        assert b["images"].dtype == np.uint8
        # substituted slots carry a healthy record: no all-zero images left
        assert all(img.any() for img in b["images"])
        # every (image, imgid) row is a valid pairing: the imgids present
        # must map back to healthy source indices
        healthy = {i for i, p in enumerate(paths) if not p.endswith(("trunc.jpg", "text.png"))}
        assert set(np.asarray(b["imgids"]).tolist()) <= healthy


def test_loader_raise_policy(tmp_path):
    bad = _corrupt_fixtures(tmp_path)
    paths = [_good_image(tmp_path / "g.png", size=256), bad["zero"]]
    ds = _dataset(tmp_path, paths)
    loader = Loader(ds, batch_size=2, shuffle=False, num_workers=1,
                    image_size=256, native_decode=False, on_corrupt="raise")
    with pytest.raises(RuntimeError, match="failed to decode"):
        list(loader)
    with pytest.raises(ValueError, match="on_corrupt"):
        Loader(ds, batch_size=2, on_corrupt="ignore")


def test_loader_all_corrupt_batch_raises(tmp_path):
    bad = _corrupt_fixtures(tmp_path)
    ds = _dataset(tmp_path, [bad["zero"], bad["text"]])
    loader = Loader(ds, batch_size=2, shuffle=False, num_workers=1,
                    image_size=256, native_decode=False)
    with pytest.raises(RuntimeError, match="every image"):
        list(loader)


def _tiny_captioner():
    cfg = Config(embed_size=16, hidden_size=24, crop_size=32,
                 max_decode_len=4, beam_size=2)
    vocab = Vocabulary.from_words(["a", "dog", "runs", "sits"])
    return cfg, Captioner.from_checkpoint(cfg, None, vocab, bucket_sizes=(2,))


def test_captioner_corrupt_path_marker(tmp_path):
    bad = _corrupt_fixtures(tmp_path)
    paths = [
        _good_image(tmp_path / "g0.png", seed=0, size=256),
        bad["trunc"],
        _good_image(tmp_path / "g1.png", seed=1, size=256),
        bad["missing"],
    ]
    _, cap = _tiny_captioner()
    caps = cap.caption_paths(paths, mode="greedy")
    assert len(caps) == 4
    assert caps[1] == ERROR_CAPTION and caps[3] == ERROR_CAPTION
    assert caps[0] != ERROR_CAPTION and caps[2] != ERROR_CAPTION
    assert cap.last_errors == [(1, paths[1]), (3, paths[3])]
    # errors reset per call
    ok_only = cap.caption_paths([paths[0]], mode="greedy")
    assert ok_only[0] != ERROR_CAPTION and cap.last_errors == []


def test_cli_caption_corrupt_exit(tmp_path, capsys, monkeypatch):
    from show_and_tell_tpu.cli import caption as caption_cli

    bad = _corrupt_fixtures(tmp_path)
    good = _good_image(tmp_path / "g.png", size=256)
    vocab_path = str(tmp_path / "vocab.json")
    Vocabulary.from_words(["a", "dog", "runs"]).save(vocab_path)
    monkeypatch.chdir(tmp_path)  # caption_log.txt etc. land in tmp
    argv = [good, bad["text"],
            "--vocab_path", vocab_path, "--embed_size", "16",
            "--hidden_size", "24", "--crop_size", "32",
            "--max_decode_len", "4", "--beam_size", "1"]
    with pytest.raises(SystemExit) as ei:
        caption_cli.main(argv)
    assert "1 of 2" in str(ei.value)
    recs = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert len(recs) == 2
    assert "error" not in recs[0] and recs[0]["caption"] != ERROR_CAPTION
    assert recs[1]["error"] == "image failed to decode"
    assert recs[1]["caption"] == ERROR_CAPTION
