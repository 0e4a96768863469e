"""Export a trained checkpoint as a reference-format ``model-best.pth``.

The reverse migration path (ckpt/torch_export.py): a model trained here
leaves as a PyTorch ``state_dict`` keyed exactly like the reference's
modules (model2.ShowAttendTellModel, or models.py DecoderRNN/EncoderCNN
via the ``decoder.``/``encoder.`` wrapper prefixes), loadable with
``torch.load`` + ``load_state_dict``.

Usage::

    python -m show_and_tell_tpu.cli.export_torch \
        --vocab_path data/vocab.json --load_model_path experiment/u/e \
        --encoder_weights vgg16.pth --export_path model-best.pth

``--encoder_weights`` matters for show_attend_tell: the exported
state_dict includes the ``encoder.*`` VGG trunk (the reference's save
does too), so pass the weights the checkpoint was trained with or the
export carries a random trunk (a warning is printed either way by the
restore path).
"""

from __future__ import annotations

import logging
import sys

from show_and_tell_tpu import ckpt
from show_and_tell_tpu.ckpt.torch_export import export_checkpoint
from show_and_tell_tpu.config import parse_config
from show_and_tell_tpu.models.registry import build_model
from show_and_tell_tpu.utils.logging import setup_logging
from show_and_tell_tpu.utils.rng import KeyChain
from show_and_tell_tpu.utils.vocab import Vocabulary

log = logging.getLogger(__name__)


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    # --export_path is CLI-local (not a Config knob): peel it off first,
    # accepting both "--export_path OUT" and "--export_path=OUT" (review
    # fix: the = form reached parse_config as an unknown flag, and a
    # trailing bare flag raised IndexError instead of a usage error)
    out_path = None
    rest = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--export_path":
            if i + 1 >= len(argv):
                raise SystemExit("--export_path requires a value")
            out_path = argv[i + 1]
            i += 2
            continue
        if a.startswith("--export_path="):
            out_path = a.split("=", 1)[1]
            i += 1
            continue
        rest.append(a)
        i += 1
    argv = rest
    if not out_path:
        raise SystemExit("--export_path OUT.pth is required")
    cfg = parse_config(argv)
    setup_logging("export_log.txt")
    if not cfg.load_model_path:
        raise SystemExit("--load_model_path <experiment dir> is required")
    vocab = Vocabulary.load(cfg.vocab_path)
    model = build_model(cfg, len(vocab))
    params, frozen = model.init(KeyChain(cfg.random_seed).key("init"))
    if cfg.encoder_weights:
        from show_and_tell_tpu.models.encoders import load_torch_encoder

        frozen = load_torch_encoder(model.encoder_name, cfg.encoder_weights)
    elif cfg.model == "show_attend_tell":
        log.warning(
            "exporting without --encoder_weights: the state_dict's "
            "encoder.* trunk is randomly initialized (checkpoints do not "
            "store it)"
        )
    batch_stats = (
        model.init_batch_stats() if hasattr(model, "init_batch_stats") else None
    )
    restored = ckpt.load_best_params(cfg.load_model_path, params, batch_stats)
    if restored is None:
        raise SystemExit(f"no checkpoint found under {cfg.load_model_path}")
    params, batch_stats = restored
    export_checkpoint(
        cfg, params, out_path, batch_stats=batch_stats, frozen=frozen
    )
    log.info("exported %s (%s) -> %s", cfg.load_model_path, cfg.model, out_path)
    print(out_path)
    return out_path


if __name__ == "__main__":
    main()
