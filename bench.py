"""Headline benchmark: COCO-protocol captioning throughput on one chip.

Measures the full serving path — uint8 images -> on-device center-crop/
normalize -> frozen VGG16 trunk -> Show-Attend-Tell decoder — in BOTH
protocols: greedy (the only decode the reference implements, models.py:56-67
— the directly comparable protocol per BASELINE.md) and beam=3 (the
headline; the reference stubs beam search at model2.py:113-114).

Weights are randomly initialised (zero-egress image: no pretrained
checkpoints, no COCO images); shapes, dtypes and compute are identical to
the real workload, so throughput is representative.

Prints ONE JSON line:
    {"metric", "value" (beam=3 img/s/chip), "unit", "vs_baseline", ...}

Baseline provenance (VERDICT round-1 #6 — no guessed ratios):
- ``vs_baseline`` = OUR greedy img/s / the reference's MEASURED greedy img/s
  on this host (benchmarks/reference_baseline.json, produced by
  ``python benchmarks/reference_baseline.py`` which runs the actual
  /root/reference modules). Same software protocol; hardware differs
  (1 TPU v5e chip vs this host's CPU — the only device the PyTorch
  reference can use here), stated in ``baseline`` rather than hidden.
- The old single-GPU *estimate* is reported separately as
  ``vs_estimated_gpu`` and never presented as a measurement.
- ``mfu`` = analytic model FLOPs/image x measured img/s / v5e bf16 peak.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

ESTIMATED_REFERENCE_GPU_IMG_S = 120.0  # documented estimate, not a measurement
V5E_PEAK_BF16_FLOPS = 197e12

BATCH = 512
N_WARMUP = 2
N_ITERS = 6

EMBED, HIDDEN, VOCAB, STEPS, PATCHES = 512, 1024, 10000, 20, 196


def _vgg_trunk_flops(crop: int = 224) -> float:
    """2*MAC FLOPs of the VGG16 features[:-3] trunk per image."""
    cfg = [
        (3, 64), (64, 64), "M", (64, 128), (128, 128), "M",
        (128, 256), (256, 256), (256, 256), "M",
        (256, 512), (512, 512), (512, 512), "M",
        (512, 512), (512, 512),  # block5 conv1-2 only ([:-3] drops conv5_3)
    ]
    hw, total = crop, 0.0
    for item in cfg:
        if item == "M":
            hw //= 2
            continue
        cin, cout = item
        total += 2.0 * 9 * cin * cout * hw * hw
    return total


def _decoder_flops(beams: int) -> float:
    """2*MAC FLOPs per image for the attention-LSTM decode."""
    per_image = 2.0 * PATCHES * EMBED * EMBED  # context_encode, once
    per_step = (
        2.0 * HIDDEN * EMBED  # weight_hh
        + 2.0 * PATCHES * EMBED  # attention logits
        + 2.0 * 4 * HIDDEN * (2 * HIDDEN)  # LSTM cell (input 1024 = emb+ctx)
        + 2.0 * (EMBED * EMBED + HIDDEN * EMBED + EMBED * VOCAB)  # output head
    )
    return per_image + beams * STEPS * per_step


def _load_measured_baseline() -> dict:
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "benchmarks", "reference_baseline.json"
    )
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {}


def main() -> None:
    import jax
    import jax.numpy as jnp

    from show_and_tell_tpu.utils.compile_cache import enable as _enable_cache

    _enable_cache()
    from show_and_tell_tpu.config import Config
    from show_and_tell_tpu.data.transforms import eval_transform
    from show_and_tell_tpu.decode import beam_search, greedy_decode
    from show_and_tell_tpu.models.registry import build_model

    cfg = Config(
        embed_size=EMBED, hidden_size=HIDDEN, crop_size=224, beam_size=3,
        max_decode_len=STEPS, dtype="bfloat16",
    )
    model = build_model(cfg, VOCAB)
    params, frozen = model.init(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.integers(0, 256, (BATCH, 256, 256, 3), dtype=np.uint8)
    )

    def make_fn(mode: str):
        @jax.jit
        def caption(params, frozen, images_u8):
            feats = model.backbone_features(
                frozen, eval_transform(images_u8, cfg.crop_size)
            )
            k = cfg.beam_size if mode == "beam" else 1
            step_fn, carry, first = model.make_decode_state(params, feats, beam_size=k)
            if mode == "beam":
                ids, _ = beam_search(
                    step_fn, carry, BATCH, beam_size=cfg.beam_size,
                    max_len=cfg.max_decode_len, first_logits=first, tile=False,
                )
                return ids
            return greedy_decode(step_fn, carry, BATCH, cfg.max_decode_len, first_logits=first)
        return caption

    def measure(fn) -> float:
        # NB: completion is forced by a device->host transfer of the ids each
        # iteration (what a real serving loop does anyway) — on the remote-
        # relay backend ``block_until_ready`` alone does not await device
        # completion. Double-buffered: batch i+1 dispatches before batch i's
        # ids are fetched.
        for _ in range(N_WARMUP):
            np.asarray(fn(params, frozen, images))
        t0 = time.perf_counter()
        prev = None
        for _ in range(N_ITERS):
            cur = fn(params, frozen, images)
            if prev is not None:
                np.asarray(prev)
            prev = cur
        np.asarray(prev)
        return BATCH * N_ITERS / (time.perf_counter() - t0)

    beam_img_s = measure(make_fn("beam"))
    greedy_img_s = measure(make_fn("greedy"))

    baseline = _load_measured_baseline()
    ref_greedy = baseline.get("greedy_img_s")
    trunk = _vgg_trunk_flops(cfg.crop_size)
    mfu_beam = beam_img_s * (trunk + _decoder_flops(3)) / V5E_PEAK_BF16_FLOPS
    mfu_greedy = greedy_img_s * (trunk + _decoder_flops(1)) / V5E_PEAK_BF16_FLOPS

    print(
        json.dumps(
            {
                "metric": "captioning throughput beam=3 (VGG16+SAT, 224px, b512)",
                "value": round(beam_img_s, 2),
                "unit": "images/sec/chip",
                # measured-vs-measured, same greedy protocol; hardware noted
                "vs_baseline": (
                    round(greedy_img_s / ref_greedy, 3) if ref_greedy else None
                ),
                "greedy_img_s": round(greedy_img_s, 2),
                "mfu": round(mfu_beam, 4),
                "mfu_greedy": round(mfu_greedy, 4),
                "baseline": {
                    "measured_reference_greedy_img_s": ref_greedy,
                    "reference_device": baseline.get("device"),
                    "reference_provenance": baseline.get("source"),
                    "note": "ratio is measured TPU-chip vs measured host-CPU, "
                    "same greedy protocol; the reference cannot run on TPU",
                },
                "vs_estimated_gpu": round(
                    greedy_img_s / ESTIMATED_REFERENCE_GPU_IMG_S, 3
                ),
            }
        )
    )


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # transient relay/compile hiccups: one retry
        print(f"bench attempt 1 failed ({e}); retrying", file=sys.stderr)
        main()
