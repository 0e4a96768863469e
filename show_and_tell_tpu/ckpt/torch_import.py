"""Import reference-trained PyTorch checkpoints into this framework.

A user of the reference repo holds ``model-best.pth`` — a
``state_dict`` of ``model2.ShowAttendTellModel`` (train.py:191-196) or of
the ``models.py`` ``EncoderCNN``/``DecoderRNN`` pair. This module converts
those state_dicts into our parameter trees so an existing trained model
can be served/evaluated/fine-tuned on TPU without retraining — the
migration path the encoder-only ``models.encoders.load_torch_encoder``
does not cover.

Weight-layout conversions (verified by cross-implementation logit-parity
tests, tests/test_torch_import.py):

- torch ``nn.Linear`` stores ``weight [out, in]``; ours is ``w [in, out]``
  -> transpose.
- torch ``nn.LSTMCell``/``nn.LSTM`` store ``weight_ih [4H, in]`` +
  ``weight_hh [4H, H]`` with gate order (i, f, g, o) and TWO bias vectors;
  ours is one ``w [in+H, 4H]`` (x rows first, h rows below — the
  ``[x; h] @ w`` layout) with the same gate order and ``b = b_ih + b_hh``.
- ``image_att_w`` / ``embedding.weight`` orientations already match.
- the reference's ``encoder.<i>.*`` keys are the VGG ``features``
  Sequential sliced ``[:-3]`` (model2.py:16) — indices coincide with
  torchvision's ``features.<i>.*`` for the 12 kept convs, so the frozen
  trunk converts through ``encoders.from_torch_vgg16`` after a prefix
  rename.

Conditioning conventions are NOT changed by the import: our decode feeds
the fresh attention context (the reference's sample() reuses the previous
step's — a documented intended-behavior fix), so greedy outputs can differ
on the margin while the teacher-forced math is identical.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

Params = Dict


def _t(a) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a, dtype=np.float32).T)


def _arr(a) -> np.ndarray:
    return np.asarray(a, dtype=np.float32)


def _linear(sd: Dict, prefix: str) -> Params:
    return {"w": _t(sd[f"{prefix}.weight"]), "b": _arr(sd[f"{prefix}.bias"])}


def _lstm_cell(sd: Dict, prefix: str, suffix: str = "") -> Params:
    """torch LSTMCell/LSTM-layer -> our ``{"w": [in+H, 4H], "b": [4H]}``."""
    w_ih = _arr(sd[f"{prefix}.weight_ih{suffix}"])  # [4H, in]
    w_hh = _arr(sd[f"{prefix}.weight_hh{suffix}"])  # [4H, H]
    b = _arr(sd[f"{prefix}.bias_ih{suffix}"]) + _arr(sd[f"{prefix}.bias_hh{suffix}"])
    return {"w": np.concatenate([w_ih.T, w_hh.T], axis=0), "b": b}


def _strip_prefix(sd: Dict, prefix: str) -> Dict:
    n = len(prefix)
    return {k[n:]: v for k, v in sd.items() if k.startswith(prefix)}


def import_show_attend_tell(sd: Dict) -> Tuple[Params, Optional[Params]]:
    """model2.ShowAttendTellModel state_dict -> ``(trainable, frozen)``.

    ``frozen`` is the converted VGG trunk when ``encoder.*`` keys are
    present (they are, in a full state_dict save), else None (caller keeps
    its own encoder weights).
    """
    trainable = {
        "att": {
            "w_img": _arr(sd["image_att_w"]),
            "w_hh": _t(sd["weight_hh.weight"]),
            "b_hh": _arr(sd["weight_hh.bias"]),
            "w_att": _arr(sd["weight_att"]).reshape(-1),
        },
        "init_h": _linear(sd, "init_hidden"),
        "init_c": _linear(sd, "init_memory"),
        "embed": _arr(sd["embedding.weight"]),
        "lstm": _lstm_cell(sd, "lstmcell"),
        "c2o": _linear(sd, "context2out"),
        "h2o": _linear(sd, "hidden2tout"),
        "classifier": _linear(sd, "classifier"),
    }
    trainable = {k: _to_jnp(v) for k, v in trainable.items()}

    frozen = None
    enc = _strip_prefix(sd, "encoder.")
    if enc:
        from show_and_tell_tpu.models.encoders import from_torch_vgg16

        frozen = from_torch_vgg16({f"features.{k}": v for k, v in enc.items()})
    return trainable, frozen


def import_show_tell(
    sd: Dict, num_layers: int = 1
) -> Tuple[Params, Optional[Params], Optional[Params]]:
    """models.py EncoderCNN + DecoderRNN state_dicts -> our ShowTell trees.

    ``sd`` may contain DecoderRNN keys bare (``embed.weight``, ``lstm.*``,
    ``linear.*``) or under a ``decoder.`` prefix, and EncoderCNN keys bare
    (``resnet.*``, ``bn.*``) or under an ``encoder.`` prefix — covering
    both separate-module saves and a combined wrapper save.

    Returns ``(trainable, batch_stats, frozen)``; ``batch_stats`` carries
    the trained BN running statistics when EncoderCNN keys are present,
    and ``frozen`` the converted ResNet-152 trunk when the full
    ``resnet.*`` backbone is in the dict.
    """
    dec = _strip_prefix(sd, "decoder.") or sd
    enc = _strip_prefix(sd, "encoder.") or sd

    trainable: Params = {
        "embed": _arr(dec["embed.weight"]),
        "lstm": [
            _lstm_cell(dec, "lstm", f"_l{layer}") for layer in range(num_layers)
        ],
        "out": _linear(dec, "linear"),
    }

    batch_stats = None
    frozen = None
    if "resnet.fc.weight" in enc:
        trainable["proj"] = _linear(enc, "resnet.fc")
    if "bn.weight" in enc:
        trainable["bn"] = {
            "scale": _arr(enc["bn.weight"]),
            "bias": _arr(enc["bn.bias"]),
        }
        batch_stats = {
            "mean": _arr(enc["bn.running_mean"]),
            "var": _arr(enc["bn.running_var"]),
        }
    if "resnet.conv1.weight" in enc:
        from show_and_tell_tpu.models.encoders import from_torch_resnet152

        frozen = from_torch_resnet152(_strip_prefix(enc, "resnet."))

    trainable = {k: _to_jnp(v) for k, v in trainable.items()}
    if batch_stats is not None:
        batch_stats = _to_jnp(batch_stats)
    return trainable, batch_stats, frozen


def _to_jnp(tree):
    import jax.numpy as jnp

    if isinstance(tree, dict):
        return {k: _to_jnp(v) for k, v in tree.items()}
    if isinstance(tree, list):
        return [_to_jnp(v) for v in tree]
    return jnp.asarray(tree)


def load_reference_checkpoint(
    path: str, model: str = "show_attend_tell", num_layers: int = 1
):
    """``model-best.pth`` from the reference Trainer -> parameter trees.

    ``model='show_attend_tell'`` returns ``(trainable, frozen_or_None)``;
    ``model='show_tell'`` returns ``(trainable, batch_stats, frozen)``.
    Tensors are loaded on CPU; DataParallel's ``module.`` prefix
    (train.py:44 wraps the model) is stripped automatically.
    """
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    sd = {k: v.numpy() for k, v in sd.items()}
    if any(k.startswith("module.") for k in sd):
        sd = _strip_prefix(sd, "module.")
    if model == "show_attend_tell":
        return import_show_attend_tell(sd)
    if model == "show_tell":
        return import_show_tell(sd, num_layers=num_layers)
    raise ValueError(f"unknown model {model!r}")


def apply_reference_checkpoint(cfg, params, batch_stats, frozen):
    """Overlay ``cfg.torch_checkpoint`` onto freshly initialized trees —
    the one implementation of the migration overlay shared by the serving,
    eval and training entry points (it previously lived as three copies).

    Returns ``(params, batch_stats, frozen, has_encoder)``; ``has_encoder``
    is False for a decoder-only ``.pth`` (separate-module save), in which
    case the caller decides whether a random frozen encoder deserves a
    warning (not when precomputed features bypass the backbone).
    """
    if cfg.model == "show_tell":
        t, bs, fr = load_reference_checkpoint(
            cfg.torch_checkpoint, "show_tell", cfg.num_layers
        )
        params = {**params, **t}
        if bs is not None:
            batch_stats = bs
    else:
        t, fr = load_reference_checkpoint(cfg.torch_checkpoint)
        params = t
    if fr is not None:
        frozen = fr
    return params, batch_stats, frozen, fr is not None
