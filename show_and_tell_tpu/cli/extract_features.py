"""Feature extraction: run the frozen encoder once over a dataset and save
per-image features for fast decoder-only training/eval (the precomputed-
features workflow of BASELINE.json config 2 — "greedy decode ... from
precomputed ResNet encoder features").

The reference recomputes the frozen CNN on every epoch of every run; with
the encoder frozen that work is identical each time, so precomputing it once
turns decoder training into a features -> LSTM problem (~10x less compute
per step) and eval into pure decode.

Usage::

    python -m show_and_tell_tpu.cli.extract_features \
        --data_json data/data.json --vocab_path data/vocab.json \
        --model show_attend_tell --output_json features.npz
"""

from __future__ import annotations

import json
import logging
import sys

import jax
import numpy as np

from show_and_tell_tpu.config import parse_config
from show_and_tell_tpu.data.dataset import CocoCaptionDataset
from show_and_tell_tpu.data.pipeline import Loader
from show_and_tell_tpu.data.transforms import eval_transform
from show_and_tell_tpu.models.registry import build_model
from show_and_tell_tpu.utils.compile_cache import enable as enable_compile_cache
from show_and_tell_tpu.utils.logging import setup_logging
from show_and_tell_tpu.utils.rng import KeyChain
from show_and_tell_tpu.utils.vocab import Vocabulary

log = logging.getLogger(__name__)


def extract(cfg, splits=("train", "val")) -> str:
    """Returns the path of the saved .npz (keys = str(cocoid))."""
    vocab = Vocabulary.load(cfg.vocab_path)
    with open(cfg.data_json) as f:
        records = json.load(f)
    model = build_model(cfg, len(vocab))
    params, frozen = model.init(KeyChain(cfg.random_seed).key("init"))
    if cfg.encoder_weights:
        from show_and_tell_tpu.models.encoders import load_torch_encoder

        frozen = load_torch_encoder(model.encoder_name, cfg.encoder_weights)

    @jax.jit
    def encode(frozen, images_u8):
        return model.backbone_features(
            frozen, eval_transform(images_u8, cfg.crop_size)
        )

    out = {}
    for split in splits:
        # One record per image: the dataset yields one record per CAPTION
        # (~5/image on COCO), and the encoder output is identical for all of
        # them — dedup before loading so each image is decoded+encoded once.
        seen, unique_records = set(), []
        for r in records:
            if r.get("split") == split and r["cocoid"] not in seen:
                seen.add(r["cocoid"])
                unique_records.append(r)
        ds = CocoCaptionDataset(unique_records, vocab, split, cfg.max_caption_len, 1)
        loader = Loader(
            ds, cfg.batch_size, shuffle=False, num_workers=cfg.num_workers
        )
        n_before = len(out)
        for batch in loader:
            feats = np.asarray(encode(frozen, batch["images"]), np.float32)
            for cocoid, f in zip(batch["cocoids"], feats):
                out[str(cocoid)] = f
        log.info("%s: %d images encoded", split, len(out) - n_before)

    path = cfg.output_json if cfg.output_json.endswith(".npz") else cfg.output_json + ".npz"
    np.savez_compressed(path, **out)
    log.info("saved %d feature maps to %s", len(out), path)
    return path


def main(argv=None):
    cfg = parse_config(argv if argv is not None else sys.argv[1:])
    setup_logging("extract_log.txt")
    enable_compile_cache()
    return extract(cfg)


if __name__ == "__main__":
    main()
