"""Model registry: both reference families are importable capabilities
(train.py:11-12 imports both; main trains show_attend_tell via train.py:37)."""

from __future__ import annotations

from show_and_tell_tpu.config import Config
from show_and_tell_tpu.models.show_attend_tell import ShowAttendTellModel
from show_and_tell_tpu.models.show_tell import ShowTellModel

MODELS = {
    "show_tell": ShowTellModel,
    "show_attend_tell": ShowAttendTellModel,
}


def build_model(cfg: Config, vocab_size: int):
    try:
        cls = MODELS[cfg.model]
    except KeyError:
        raise ValueError(f"unknown model {cfg.model!r}; options: {sorted(MODELS)}")
    return cls(cfg, vocab_size)
