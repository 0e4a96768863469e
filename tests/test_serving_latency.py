"""benchmarks/serving_latency.py mechanics at tiny dims (the measured
full-scale curves live in docs/STATUS.md)."""

import json

import numpy as np
import pytest

import benchmarks.serving_latency as sl
from show_and_tell_tpu.config import Config
from show_and_tell_tpu.serve import Captioner, DynamicBatcher
from show_and_tell_tpu.utils.vocab import Vocabulary


def _small_captioner():
    cfg = Config(
        embed_size=16, hidden_size=24, crop_size=32, beam_size=2,
        max_decode_len=20,
    )
    vocab = Vocabulary.from_words([f"w{i}" for i in range(30)])
    return Captioner.from_checkpoint(cfg, None, vocab, bucket_sizes=(1, 4))


def test_train_decoder_enables_early_exit():
    """train_decoder teaches <end> at a fixed position: the trained beam
    caption ends far short of the 20-step budget."""
    cap = _small_captioner()
    loss = sl.train_decoder(cap, steps=120)
    assert loss < 0.5
    img = sl.bench_image(trained=True)
    words = cap.caption_images(img[None], mode="beam")[0].split()
    assert 8 <= len(words) <= 14  # ~11-token target, not the 19-token cap


def test_run_level_reports_percentiles():
    cap = _small_captioner()
    img = sl.bench_image(trained=False)
    cap.warmup(modes=("beam",))  # both buckets compile outside the window
    b = DynamicBatcher(cap, max_batch=4, max_delay_ms=5.0)
    old_m, old_w = sl.MEASURE_S, sl.WARMUP_S
    sl.MEASURE_S, sl.WARMUP_S = 2.0, 0.5
    try:
        r = sl.run_level(b, 2, img)
    finally:
        sl.MEASURE_S, sl.WARMUP_S = old_m, old_w
        b.close()
    assert r["requests"] > 0
    assert 0 < r["p50_ms"] <= r["p95_ms"] <= r["p99_ms"]
    assert r["img_s"] > 0
