"""Export our trained parameter trees as reference-format PyTorch
checkpoints — the inverse of :mod:`ckpt.torch_import`.

Interop goes both ways: ``torch_import`` lets a reference user bring
``model-best.pth`` here; this lets a model trained on TPU go BACK into the
reference codebase (or any torch tooling) as a ``state_dict`` keyed
exactly like ``model2.ShowAttendTellModel`` / ``models.py``'s
``DecoderRNN``+``EncoderCNN`` (reference train.py:191-196 saves, eval
loads ``load_state_dict``).

Layout conversions are the exact inverses of torch_import.py's (Linear
transposed back to ``[out, in]``; our single fused LSTM matrix
``[in+H, 4H]`` split into ``weight_ih``/``weight_hh`` with the summed
bias emitted as ``bias_ih`` and a ZERO ``bias_hh`` — torch adds the two,
so the cell math is unchanged). Round-trip (export -> import) is
bit-exact; loading the export into the ACTUAL reference modules and
comparing teacher-forced logits is pinned in tests/test_torch_export.py.

Notes:
- show_attend_tell: the export includes ``encoder.<i>.*`` VGG keys when
  the frozen trunk is provided — the full state_dict the reference saves
  (its encoder is part of the module), so ``load_state_dict`` is strict.
- show_tell: the reference keeps EncoderCNN and DecoderRNN as separate
  modules; the decoder export is strict-loadable, while the encoder
  export carries the trained parts (``resnet.fc`` projection + ``bn``)
  and is loaded with ``strict=False`` over a torchvision ResNet-152 —
  exactly how the reference constructs EncoderCNN (models.py:13-15,
  ``pretrained=True`` trunk that is never trained).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

Params = Dict


def _np(a) -> np.ndarray:
    return np.asarray(a, dtype=np.float32)


def _t(a) -> np.ndarray:
    return np.ascontiguousarray(_np(a).T)


def _linear(p: Params, prefix: str, out: Dict) -> None:
    out[f"{prefix}.weight"] = _t(p["w"])
    out[f"{prefix}.bias"] = _np(p["b"])


def _lstm_cell(p: Params, prefix: str, out: Dict, suffix: str = "") -> None:
    w, b = _np(p["w"]), _np(p["b"])  # [in+H, 4H], [4H]
    H = b.shape[0] // 4
    n_in = w.shape[0] - H
    out[f"{prefix}.weight_ih{suffix}"] = _t(w[:n_in])  # [4H, in]
    out[f"{prefix}.weight_hh{suffix}"] = _t(w[n_in:])  # [4H, H]
    out[f"{prefix}.bias_ih{suffix}"] = b
    out[f"{prefix}.bias_hh{suffix}"] = np.zeros_like(b)


def export_show_attend_tell(
    params: Params, frozen: Optional[Params] = None
) -> Dict[str, np.ndarray]:
    """Our SAT trees -> ``model2.ShowAttendTellModel`` state_dict."""
    sd: Dict[str, np.ndarray] = {}
    att = params["att"]
    sd["image_att_w"] = _np(att["w_img"])
    sd["weight_hh.weight"] = _t(att["w_hh"])
    sd["weight_hh.bias"] = _np(att["b_hh"])
    sd["weight_att"] = _np(att["w_att"]).reshape(-1, 1)
    _linear(params["init_h"], "init_hidden", sd)
    _linear(params["init_c"], "init_memory", sd)
    sd["embedding.weight"] = _np(params["embed"])
    _lstm_cell(params["lstm"], "lstmcell", sd)
    _linear(params["c2o"], "context2out", sd)
    _linear(params["h2o"], "hidden2tout", sd)
    _linear(params["classifier"], "classifier", sd)
    if frozen is not None:
        from show_and_tell_tpu.models.encoders import _VGG_TORCH_IDX

        for conv, idx in zip(frozen["convs"], _VGG_TORCH_IDX):
            # ours [kh, kw, cin, cout] -> torch [cout, cin, kh, kw]
            sd[f"encoder.{idx}.weight"] = np.ascontiguousarray(
                _np(conv["w"]).transpose(3, 2, 0, 1)
            )
            sd[f"encoder.{idx}.bias"] = _np(conv["b"])
    return sd


def export_show_tell(
    params: Params,
    batch_stats: Optional[Params] = None,
    num_layers: int = 1,
) -> Dict[str, np.ndarray]:
    """Our ShowTell trees -> combined state_dict with ``decoder.`` /
    ``encoder.`` prefixes (the wrapper-save convention torch_import also
    accepts). Use :func:`split_show_tell` for the two separate-module
    dicts the reference's ``models.py`` classes load directly."""
    sd: Dict[str, np.ndarray] = {}
    sd["decoder.embed.weight"] = _np(params["embed"])
    for layer in range(num_layers):
        _lstm_cell(params["lstm"][layer], "decoder.lstm", sd, f"_l{layer}")
    _linear(params["out"], "decoder.linear", sd)
    if "proj" in params:
        _linear(params["proj"], "encoder.resnet.fc", sd)
    if "bn" in params:
        sd["encoder.bn.weight"] = _np(params["bn"]["scale"])
        sd["encoder.bn.bias"] = _np(params["bn"]["bias"])
        bs = batch_stats or {}
        H = sd["encoder.bn.weight"].shape[0]
        sd["encoder.bn.running_mean"] = _np(bs.get("mean", np.zeros(H)))
        sd["encoder.bn.running_var"] = _np(bs.get("var", np.ones(H)))
        sd["encoder.bn.num_batches_tracked"] = np.asarray(0, np.int64)
    return sd


def split_show_tell(sd: Dict[str, np.ndarray]):
    """Combined export -> ``(decoder_sd, encoder_sd)`` for the reference's
    separate ``DecoderRNN`` / ``EncoderCNN`` modules (load the encoder
    dict with ``strict=False``: the torchvision trunk supplies the rest)."""
    dec = {k[len("decoder."):]: v for k, v in sd.items() if k.startswith("decoder.")}
    enc = {k[len("encoder."):]: v for k, v in sd.items() if k.startswith("encoder.")}
    return dec, enc


def save_state_dict(sd: Dict[str, np.ndarray], path: str) -> None:
    """Write a ``torch.save``-format checkpoint loadable with
    ``torch.load(path, weights_only=True)`` (and the reference's plain
    ``torch.load``)."""
    import torch

    torch.save({k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}, path)


def export_checkpoint(
    cfg, params: Params, path: str,
    batch_stats: Optional[Params] = None,
    frozen: Optional[Params] = None,
) -> None:
    """One-call export dispatched on ``cfg.model`` (mirrors
    ``apply_reference_checkpoint``'s dispatch)."""
    if cfg.model == "show_tell":
        sd = export_show_tell(params, batch_stats, num_layers=cfg.num_layers)
    elif cfg.model == "show_attend_tell":
        sd = export_show_attend_tell(params, frozen)
    else:
        raise ValueError(f"unknown model {cfg.model!r}")
    save_state_dict(sd, path)
