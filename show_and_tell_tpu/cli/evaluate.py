"""Standalone evaluation entry point (the reference's ``eval.py`` used as a
library had no CLI; this adds one for the common serving/eval workflow).

Usage::

    python -m show_and_tell_tpu.cli.evaluate --data_json data/data.json \
        --vocab_path data/vocab.json --load_model_path experiment/u/e \
        --ann_file captions_val2014.json --beam_size 3
"""

from __future__ import annotations

import json
import logging
import sys

from show_and_tell_tpu import ckpt
from show_and_tell_tpu.config import parse_config
from show_and_tell_tpu.data.dataset import CocoCaptionDataset
from show_and_tell_tpu.data.pipeline import make_loader
from show_and_tell_tpu.evalsuite.driver import evaluation
from show_and_tell_tpu.models.registry import build_model
from show_and_tell_tpu.utils.compile_cache import enable as enable_compile_cache
from show_and_tell_tpu.utils.logging import setup_logging
from show_and_tell_tpu.utils.rng import KeyChain
from show_and_tell_tpu.utils.vocab import Vocabulary

log = logging.getLogger(__name__)


def main(argv=None):
    cfg = parse_config(argv if argv is not None else sys.argv[1:])
    enable_compile_cache()
    setup_logging("eval_log.txt")
    vocab = Vocabulary.load(cfg.vocab_path)
    with open(cfg.data_json) as f:
        records = json.load(f)
    val_ds = CocoCaptionDataset(records, vocab, "val", cfg.max_caption_len, cfg.num_buckets)
    loader = make_loader(cfg, val_ds, mode="val")

    model = build_model(cfg, len(vocab))
    params, frozen = model.init(KeyChain(cfg.random_seed).key("init"))
    if cfg.encoder_weights:
        from show_and_tell_tpu.models.encoders import load_torch_encoder

        frozen = load_torch_encoder(model.encoder_name, cfg.encoder_weights)
    batch_stats = model.init_batch_stats() if hasattr(model, "init_batch_stats") else None
    if cfg.torch_checkpoint:
        # --torch_checkpoint model-best.pth: evaluate a reference-trained
        # checkpoint directly (ckpt/torch_import.py; the state_dict carries
        # the frozen trunk, so no --encoder_weights needed)
        from show_and_tell_tpu.ckpt.torch_import import apply_reference_checkpoint

        params, batch_stats, frozen, has_enc = apply_reference_checkpoint(
            cfg, params, batch_stats, frozen
        )
        if not has_enc and not cfg.encoder_weights and not cfg.features_path:
            # (with --features_path the backbone never runs — no warning)
            log.warning(
                "--torch_checkpoint %s carries no encoder weights and "
                "--encoder_weights is unset: the frozen encoder is randomly "
                "initialized — expect near-zero scores.",
                cfg.torch_checkpoint,
            )
        if cfg.load_model_path:
            log.warning(
                "--torch_checkpoint overrides --load_model_path: the "
                "checkpoint in %s is NOT being evaluated", cfg.load_model_path
            )
    elif cfg.load_model_path and not cfg.encoder_weights and not cfg.features_path:
        # Checkpoints persist only trainable params + batch stats; the frozen
        # backbone is rebuilt from init. Without --encoder_weights that means
        # a RANDOM encoder under a trained decoder — scores would be garbage
        # with no error. (Captioner.from_checkpoint carries the same warning
        # for the serving path; the eval path doesn't go through it.)
        log.warning(
            "--load_model_path given without --encoder_weights: the frozen "
            "encoder is randomly initialized (checkpoints do not store it). "
            "Pass the same --encoder_weights used in training, or expect "
            "near-zero scores."
        )
    if cfg.load_model_path and not cfg.torch_checkpoint:
        restored = ckpt.load_best_params(cfg.load_model_path, params, batch_stats)
        if restored is None:
            raise SystemExit(f"no checkpoint found in {cfg.load_model_path}")
        params, batch_stats = restored

    from show_and_tell_tpu.models import quantize as quantize_mod

    if (
        cfg.quantize_backbone
        and model.encoder_name in quantize_mod.QUANTIZABLE_ENCODERS
        and not cfg.features_path
    ):
        # int8 PTQ eval path (models/quantize.py): calibrate on the first
        # val batch's images, then backbone_features dispatches to int8
        import jax.numpy as jnp

        from show_and_tell_tpu.data.transforms import eval_transform

        first = next(iter(loader))
        if "images" in first:
            calib = eval_transform(
                jnp.asarray(first["images"][:32]), cfg.crop_size
            )
            frozen = quantize_mod.obtain_quantized(
                model.encoder_name, frozen, calib,
                path=cfg.quantized_backbone_path,
            )
            log.info("backbone quantized to int8 (calibrated on %d images)",
                     min(32, first["images"].shape[0]))

    mode = "beam" if cfg.beam_size > 1 else "greedy"
    val_loss, preds, stats = evaluation(
        model, cfg, params, batch_stats, frozen, loader, vocab,
        mode=mode, ann_file=cfg.ann_file,
    )
    log.info("val loss: %.4f", val_loss)
    for k, v in stats.items():
        log.info("%s: %.4f", k, v)
    return val_loss, preds, stats


if __name__ == "__main__":
    main()
