"""Training entry point — the ``main.py`` of the framework.

Usage::

    python -m show_and_tell_tpu.cli.main --data_json data/data.json \
        --vocab_path data/vocab.json --ann_file captions_val2014.json ...

Mirrors the reference flow (main.py:13-46): parse config, create
``experiment/<user_id>/<exp_id>/``, seed, build loaders for train/val splits,
construct the Trainer, run. Differences are the TPU-native substance: mesh
construction, device-side transforms (transforms live inside the jitted step
rather than main.py:26-36 host composes), and JSON config persistence.
"""

from __future__ import annotations

import json
import logging
import os
import sys

from show_and_tell_tpu.config import Config, parse_config
from show_and_tell_tpu.data.dataset import CocoCaptionDataset
from show_and_tell_tpu.data.pipeline import make_loader
from show_and_tell_tpu.evalsuite.driver import make_trainer_eval_fn
from show_and_tell_tpu.models.registry import build_model
from show_and_tell_tpu.train.trainer import Trainer
from show_and_tell_tpu.utils.experiment import make_experiment_dir
from show_and_tell_tpu.utils.compile_cache import enable as enable_compile_cache
from show_and_tell_tpu.utils.logging import setup_logging
from show_and_tell_tpu.utils.vocab import Vocabulary

log = logging.getLogger(__name__)


def main(cfg: Config) -> Trainer:
    enable_compile_cache()
    host_shard = None
    if cfg.multihost:
        # must run before anything touches the XLA backend
        # (parallel/distributed.py — review fix: the documented multi-host
        # sequence had no caller, so pod launches ran N duplicated
        # single-host jobs)
        from show_and_tell_tpu.parallel import distributed

        distributed.initialize(cfg.coordinator_address)
        host_shard = distributed.host_shard_info()
    cfg = make_experiment_dir(cfg)
    # log inside the experiment dir (a cwd-relative mode='w' log.txt let a
    # second run truncate the first run's log — review fix); secondary
    # hosts get their own file
    log_name = "log.txt" if not host_shard or host_shard[0] == 0 else (
        f"log.proc{host_shard[0]}.txt"
    )
    # a resumed run appends (an epoch-chain respawn must not truncate the
    # previous processes' epochs out of the shared run log)
    setup_logging(
        os.path.join(cfg.expr_dir, log_name),
        mode="a" if cfg.start_from else "w",
    )
    log.info("run arguments: %s", json.dumps(cfg.to_dict(), indent=4, sort_keys=True))
    if host_shard is not None:
        log.info("multi-host: process %d of %d", host_shard[0], host_shard[1])

    vocab = Vocabulary.load(cfg.vocab_path)
    with open(cfg.data_json) as f:
        records = json.load(f)

    train_ds = CocoCaptionDataset(
        records, vocab, "train", cfg.max_caption_len, cfg.num_buckets,
        host_shard=host_shard,
    )
    val_ds = CocoCaptionDataset(
        records, vocab, "val", cfg.max_caption_len, cfg.num_buckets,
        host_shard=host_shard,
    )
    trainloader = make_loader(cfg, train_ds, mode="train")
    validloader = make_loader(cfg, val_ds, mode="val")
    log.info(
        "total iterations in training phase : %d\n"
        "total iterations in validation phase : %d",
        len(trainloader),
        len(validloader),
    )

    model = build_model(cfg, len(vocab))
    eval_fn = make_trainer_eval_fn(model, cfg, validloader, vocab)
    trainer = Trainer(cfg, model, trainloader, validloader, eval_fn=eval_fn)
    trainer.train()
    log.info("done")
    return trainer


def cli_entry() -> None:
    main(parse_config(sys.argv[1:]))


if __name__ == "__main__":
    cli_entry()
