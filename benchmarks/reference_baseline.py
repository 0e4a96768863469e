"""Measure the ACTUAL reference implementation's captioning throughput.

Runs the reference's own modules (imported from /root/reference/model2.py,
not copied) on this host's CPU — the only hardware the PyTorch reference can
use in this image — and records a measured, provenance-stamped baseline in
benchmarks/reference_baseline.json for bench.py's ``vs_baseline``.

Protocol = the reference's greedy ``sample`` loop (model2.py:91-111):
VGG16 encode once, then 20 x (attention -> LSTMCell -> output head ->
argmax -> embed). Two 2017-era incompatibilities require a shim, documented
here rather than hidden:

- ``sample`` hardcodes ``.cuda()`` (model2.py:93) — no CUDA in this image;
  we monkeypatch ``Tensor.cuda`` to identity.
- ``torch.cat(sampled_ids, 1)`` (model2.py:110) relies on pre-0.4 semantics
  where ``max(1)[1]`` kept a trailing dim; on modern torch the 1-D cat
  crashes. The shim loop below reproduces the sample() body exactly
  (same modules, same call sequence, same shapes) and stacks ids correctly.

Also measured: the reference's teacher-forced training forward
(model2.py:38-63) — runs unmodified.

Usage: python benchmarks/reference_baseline.py [--batch 32] [--iters 3]
"""

from __future__ import annotations

import argparse
import json
import os
import platform
import sys
import time

import numpy as np
import torch


def _vgg16_features() -> torch.nn.Sequential:
    """The standard VGG16 `features` stack (Simonyan & Zisserman config D),
    identical structure to torchvision's — random weights (zero-egress
    image, and the reference's download would fail anyway)."""
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512, "M"]
    layers, in_ch = [], 3
    for v in cfg:
        if v == "M":
            layers.append(torch.nn.MaxPool2d(2, 2))
        else:
            layers.append(torch.nn.Conv2d(in_ch, v, 3, padding=1))
            layers.append(torch.nn.ReLU(inplace=True))
            in_ch = v
    return torch.nn.Sequential(*layers)


def _import_reference():
    """Import /root/reference/model2.py on a torchvision-less, CUDA-less
    host: provide a minimal ``torchvision.models.vgg16`` (the only symbol
    the reference uses, model2.py:6,15) and identity ``Tensor.cuda``."""
    import types

    class _VGG(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.features = _vgg16_features()

    tv = types.ModuleType("torchvision")
    tvm = types.ModuleType("torchvision.models")
    tvm.vgg16 = lambda pretrained=False, **kw: _VGG()
    tv.models = tvm
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = tvm
    torch.Tensor.cuda = lambda self, *a, **kw: self  # no CUDA on this host
    sys.path.insert(0, "/root/reference")
    import model2  # noqa: E402

    return model2


def measure_greedy(model, batch: int, iters: int, steps: int = 20) -> float:
    """images/sec over the reference's sample() call sequence."""
    images = torch.randn(batch, 3, 224, 224)
    with torch.no_grad():
        # warmup
        _greedy_once(model, images, steps)
        t0 = time.perf_counter()
        for _ in range(iters):
            _greedy_once(model, images, steps)
        dt = time.perf_counter() - t0
    return batch * iters / dt


def _greedy_once(model, images, steps):
    # the body of model2.sample() (model2.py:91-111), verbatim call sequence
    embeddings = model.embedding(torch.ones(images.size(0)).long())
    features = model.encoder(images)
    features = features.view(features.size(0), features.size(1), -1).transpose(2, 1)
    context_encode = torch.bmm(
        features,
        model.image_att_w.unsqueeze(0).expand(
            features.size(0), model.image_att_w.size(0), model.image_att_w.size(1)
        ),
    )
    hidden, c = model.init_lstm(features)
    sampled = []
    rnn_input = None
    for i in range(steps):
        context, _alpha = model.attention_layer(features, context_encode, hidden)
        if i == 0:
            rnn_input = torch.cat([embeddings, context], dim=1)
        hidden, c = model.lstmcell(rnn_input, (hidden, c))
        outputs = model.output_layer(context, hidden)
        predicted = outputs.max(1)[1]
        sampled.append(predicted)
        embedding = model.embedding(predicted)
        rnn_input = torch.cat([embedding, context], dim=1)
    return torch.stack(sampled, 1)


def measure_train_forward(model, batch: int, iters: int) -> float:
    """images/sec through the reference's teacher-forced forward + CE loss +
    backward (train.py:139-144 semantics). One shim: model2.py:41 unpacks
    pack_padded_sequence as a 2-tuple (pre-0.4 PackedSequence); restore
    those semantics on the symbol model2 imported."""
    import model2 as _m2
    from torch.nn.utils.rnn import pack_padded_sequence as _pps

    _m2.pack_padded_sequence = lambda *a, **kw: (lambda p: (p.data, p.batch_sizes))(
        _pps(*a, **kw)
    )
    images = torch.randn(batch, 3, 224, 224)
    T = 16
    captions = torch.randint(4, 10000, (batch, T))
    lengths = torch.full((batch,), T, dtype=torch.long)
    crit = torch.nn.CrossEntropyLoss()
    from torch.nn.utils.rnn import pack_padded_sequence

    def once():
        out = model(images, captions[:, :-1], lengths - 1)
        targets = pack_padded_sequence(captions[:, 1:], lengths - 1, batch_first=True)[0]
        loss = crit(out, targets)
        model.zero_grad()
        loss.backward()

    once()  # warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        once()
    return batch * iters / (time.perf_counter() - t0)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument(
        "--out",
        default=os.path.join(os.path.dirname(os.path.abspath(__file__)), "reference_baseline.json"),
    )
    args = ap.parse_args()

    torch.set_num_threads(os.cpu_count() or 1)  # give the reference the host
    model2 = _import_reference()

    class Opt:  # the argparse namespace surface model2 expects
        pass

    torch.manual_seed(0)
    model = model2.ShowAttendTellModel(
        hidden_size=1024, context_size=512, vocab_size=10000, embed_size=512, opt=Opt()
    )
    # model2.py:20,25 allocate image_att_w / weight_att as raw FloatTensors
    # and never initialize them — heap garbage (possibly NaN/denormal, which
    # skews CPU matmul timing and varies run to run). Initialize them under
    # the fixed seed so the measurement is deterministic and numerically
    # sane; everything else is seeded by the module constructors.
    with torch.no_grad():
        for p in (model.image_att_w, model.weight_att):
            p.uniform_(-0.1, 0.1)

    n_threads = torch.get_num_threads()
    model.eval()
    greedy = measure_greedy(model, args.batch, args.iters)
    # train() mode for the train measurement, for protocol fidelity. (It is
    # behaviorally identical here: model2.py:34 declares Dropout(0.5) but
    # the forward never applies it, and the model has no batch norm — noted
    # so nobody "fixes" this into a discrepancy later.)
    model.train()
    train_batch = max(8, args.batch // 4)
    train = measure_train_forward(model, train_batch, max(2, args.iters - 1))
    model.eval()

    result = {
        "greedy_img_s": round(greedy, 3),
        "train_img_s": round(train, 3),
        "batch": args.batch,
        "train_batch": train_batch,
        "device": "cpu",
        "cpu": platform.processor() or platform.machine(),
        "torch_threads": n_threads,
        "torch_version": torch.__version__,
        "source": "/root/reference/model2.py (imported, random VGG16 weights)",
        "protocol": "greedy sample() 20 steps, 224px; shim documented in benchmarks/reference_baseline.py",
        "measured_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
