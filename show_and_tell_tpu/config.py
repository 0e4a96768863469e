"""Typed configuration system.

Replaces the reference's single argparse blob (``config.py:6-69``, 25 flags
spanning data paths, model dims, optimization, LR decay, scheduled sampling and
eval cadence) with a dataclass whose fields are the single source of truth: the
CLI parser is generated from the dataclass, and configs persist as JSON (the
reference pickles the argparse namespace, ``config.py:71-80`` — opaque and
version-fragile; JSON is inspectable and diffable).

Field-for-field parity notes:
- ``num_gpu`` becomes ``num_devices`` (TPU chips in the mesh); 0 = use all
  visible devices.
- ``load_pretrained`` keeps the reference's *intent* (a real boolean that can
  be enabled) — the reference flag can never become True
  (``action='store_false', default=False``, config.py:36), a latent bug we fix.
- LR decay (config.py:42-48) and scheduled sampling (config.py:50-57) knobs are
  carried over verbatim; scheduled sampling is actually *implemented* here
  (the reference comments it out, train.py:109-113).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
from dataclasses import dataclass, fields
from typing import Any, List, Optional


@dataclass
class Config:
    # --- Data input settings (reference config.py:10-21) ---
    root_dir: str = "."
    data_json: str = "data/data.json"
    vocab_path: str = "data/vocab.json"
    crop_size: int = 224
    batch_size: int = 128

    # --- Devices / reproducibility (reference config.py:13-14) ---
    num_devices: int = 0  # 0 = all visible devices on the mesh data axis
    model_parallel: int = 1  # size of the mesh "model" axis (reference: no TP)
    # multi-host (pod) training: initialize the JAX distributed runtime,
    # shard dataset IO per host, globalize batches over the mesh, and gate
    # checkpoint/infos writes to process 0 (parallel/distributed.py)
    multihost: bool = False
    coordinator_address: Optional[str] = None  # None = auto-detect
    random_seed: int = 123

    # --- Experiment management (reference config.py:20-25) ---
    expr_dir: str = "experiment"
    exp_id: str = "showattendtell"
    user_id: str = "default"
    start_from: Optional[str] = None

    # --- Model dims (reference config.py:27-30) ---
    model: str = "show_attend_tell"  # or "show_tell" (models.py pair)
    encoder: str = "vgg16"  # show_tell uses resnet152; scaled config inception_v3
    embed_size: int = 512
    hidden_size: int = 1024
    num_layers: int = 1
    encoder_weights: Optional[str] = None  # path to converted pretrained weights

    # --- Checkpoint / resume (reference config.py:32-36) ---
    load_best_score: bool = True
    load_model_path: Optional[str] = None
    load_optim_path: Optional[str] = None
    load_pretrained: bool = False
    # migration path: a reference-trained model-best.pth (state_dict of
    # model2.ShowAttendTellModel or the models.py pair) imported directly
    # (ckpt/torch_import.py) — serve/evaluate a reference checkpoint on TPU
    # with one flag, no retraining
    torch_checkpoint: Optional[str] = None

    # --- Optimization (reference config.py:38-48) ---
    learning_rate: float = 1e-3
    # >1 = average gradients over k microbatches, one Adam update per k
    # steps (optax.MultiSteps): k x effective batch at the same peak memory
    grad_accum_steps: int = 1
    # >0 = maintain a Polyak/EMA average of the trainable params
    # (ema = d*ema + (1-d)*params each step, typical d 0.999); evaluation
    # and best-checkpoint gating then use the AVERAGED weights — the
    # standard production smoothing the reference lacks. 0 = off.
    ema_decay: float = 0.0
    max_epochs: int = 20
    learning_rate_decay_start: int = 1  # epoch; -1 = no decay
    learning_rate_decay_every: int = 3
    learning_rate_decay_rate: float = 0.8
    grad_clip: float = 0.1  # per-element clamp, reference train.py:88-91

    # --- Scheduled sampling (reference config.py:50-57) ---
    scheduled_sampling_start: int = -1  # epoch; -1 = off
    scheduled_sampling_increase_every: int = 5
    scheduled_sampling_increase_prob: float = 0.05
    scheduled_sampling_max_prob: float = 0.25

    # --- Logging / eval cadence (reference config.py:59-66) ---
    log_step: int = 10
    language_eval: int = 1  # 1: CIDEr checkpoint gate; 0: -val_loss
    # iterations between val-eval + checkpoint gate; the reference's record
    # run used 3236 (~once/epoch at batch 128, log.txt) — 1 would evaluate
    # after every step
    save_checkpoint_every: int = 3000
    # SIGTERM/SIGINT -> finish the step, save full train state, exit clean
    # (train/preempt.py); resume is bit-continuous
    preempt_save: bool = True
    # >0: a watchdog thread monitors this process's resident set size and
    # triggers the SAME clean preempt-save path once it crosses this many
    # GB — a host memory leak (e.g. a leaking device-transport client)
    # causes a checkpointed handoff instead of an OOM kill. The epoch-chain
    # supervisor (cli/train_chain.py) then respawns and resumes. 0 = off.
    rss_preempt_gb: float = 0.0

    # --- Decoding (reference models.py:60 / model2.py:100: hard 20-step cap) ---
    max_decode_len: int = 20
    beam_size: int = 3  # reference declares beam search but stubs it
    length_penalty: float = 0.0  # GNMT ((5+len)/6)^alpha; 0 = raw sum-logprob

    # --- Preprocessing (reference preprocess.py:144-156) ---
    caption_json: Optional[str] = None
    output_json: str = "data/data.json"
    images_root: Optional[str] = None
    word_count_threshold: int = 5
    print_stats: bool = True

    # --- Data pipeline (TPU additions; reference uses DataLoader workers) ---
    num_workers: int = 8  # host decode threads; a v5e chip consumes >1.5k img/s
    prefetch_depth: int = 2
    max_caption_len: int = 57  # longest COCO caption + <start>/<end>
    num_buckets: int = 4  # length-bucketing replaces sort+pack
    # None = auto (C++ GIL-free decoder when built — measured 1.6x PIL);
    # False forces PIL, True requires the native library.
    native_decode: Optional[bool] = None
    # per-item decode-failure policy: "substitute" skips the corrupt record
    # (healthy in-batch duplicate keeps shapes static) with a warning;
    # "raise" fails fast (data/pipeline.py Loader)
    on_corrupt: str = "substitute"
    # .npz from cli/extract_features (keys = str(cocoid)): loaders feed
    # precomputed encoder features instead of images — decoder-only training
    # and image-free eval (BASELINE config 2's workflow)
    features_path: Optional[str] = None
    # decode-free storage (data/memmap.py): directory of pre-decoded uint8
    # image shards + index. cli.preprocess writes it when set (opt-in; the
    # reference's resize-to-disk taken to its TPU conclusion,
    # preprocess.py:86-101); loaders then serve batches by memory-mapped
    # gather instead of JPEG decode — the host pipeline stops being
    # codec-bound (one core feeds the chip)
    memmap_dir: Optional[str] = None
    # cli.caption: also write one attention-overlay contact sheet per image
    # (greedy decode, utils/visualize — the Show-Attend-Tell figure) into
    # this directory
    attention_dir: Optional[str] = None

    # --- Eval data (reference eval.py:20 hardcodes this path) ---
    ann_file: Optional[str] = None

    # --- TPU compute knobs ---
    dtype: str = "float32"  # compute dtype; "bfloat16" = MXU-native mixed precision
    # int8 post-training quantization of the FROZEN serving backbone
    # (models/quantize.py): per-channel weights + calibrated activation
    # scales; the Captioner calibrates on its first batch. Serving opt-in.
    quantize_backbone: bool = False
    # optional persisted calibration: loaded when the file exists, written
    # after first-batch calibration otherwise — serving replicas share one
    # calibration instead of each deriving scales from its first batch
    quantized_backbone_path: Optional[str] = None
    use_pallas: Optional[bool] = None  # None = default (XLA cell; see ops/lstm.py)
    donate: bool = True  # donate train-state buffers across steps
    skip_nonfinite: bool = True  # failure detection: drop updates w/ NaN/inf grads

    # --- Observability ---
    profile_dir: Optional[str] = None  # jax.profiler trace output dir
    profile_step: int = -1  # trace this training iteration (-1 = never)

    # Derived at runtime, persisted for the record (reference train.py:103-107).
    current_lr: float = 1e-3
    ss_prob: float = 0.0

    def replace(self, **kw: Any) -> "Config":
        return dataclasses.replace(self, **kw)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> "Config":
        known = {f.name for f in fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


def _add_field_arg(parser: argparse.ArgumentParser, f: dataclasses.Field) -> None:
    name = "--" + f.name
    default = f.default if f.default is not dataclasses.MISSING else None
    if f.type in ("bool", bool):
        parser.add_argument(
            name, type=lambda s: s.lower() in ("1", "true", "yes"), default=default
        )
    elif f.type in ("Optional[bool]",):
        parser.add_argument(
            name,
            type=lambda s: s.lower() in ("1", "true", "yes"),
            default=default,
        )
    elif f.type in ("int", int):
        parser.add_argument(name, type=int, default=default)
    elif f.type in ("float", float):
        parser.add_argument(name, type=float, default=default)
    else:
        parser.add_argument(name, type=str, default=default)


def parse_config(argv: Optional[List[str]] = None) -> Config:
    """Build a Config from CLI flags (auto-generated from the dataclass).

    Mirrors the surface of the reference's ``parse_opt`` (config.py:6-69) with
    every field addressable as ``--field_name``.
    """
    parser = argparse.ArgumentParser(description="show_and_tell_tpu")
    for f in fields(Config):
        _add_field_arg(parser, f)
    ns = parser.parse_args(argv)
    return Config.from_dict(vars(ns))


def save_config(cfg: Config, path: Optional[str] = None) -> str:
    """Persist config as JSON (reference pickles it, config.py:71-80)."""
    if path is None:
        os.makedirs(cfg.expr_dir, exist_ok=True)
        path = os.path.join(cfg.expr_dir, f"config_expr_{cfg.exp_id}.json")
    with open(path, "w") as f:
        json.dump(cfg.to_dict(), f, indent=2, sort_keys=True)
    return path


def load_config(path: str) -> Config:
    with open(path) as f:
        return Config.from_dict(json.load(f))
