"""Headline benchmark: COCO-protocol captioning throughput, beam=3.

Measures the full serving path on one chip — uint8 images -> on-device
center-crop/normalize -> frozen VGG16 trunk -> Show-Attend-Tell decoder with
batched beam search (k=3, 20 steps) -> token ids — i.e. the pipeline behind
the reference's ``evaluation()`` loop (eval.py:74-99), with the beam search
the reference stubs out (model2.py:113-114).

Weights are randomly initialised (zero-egress image: no pretrained
checkpoints, no COCO images); shapes, dtypes and compute are identical to
the real workload, so throughput is representative.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

``vs_baseline`` compares against REFERENCE_GPU_IMG_S — an *estimate* of the
reference's single-GPU greedy captioning throughput (the reference publishes
no numbers, BASELINE.md; and only supports greedy). To be replaced by a
self-measured GPU baseline when reference hardware is available.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

REFERENCE_GPU_IMG_S = 120.0  # estimated; see module docstring

BATCH = 512
N_WARMUP = 2
N_ITERS = 6


def main() -> None:
    import jax
    import jax.numpy as jnp

    from show_and_tell_tpu.utils.compile_cache import enable as _enable_cache

    _enable_cache()
    from show_and_tell_tpu.config import Config
    from show_and_tell_tpu.data.transforms import eval_transform
    from show_and_tell_tpu.decode import beam_search
    from show_and_tell_tpu.models.registry import build_model

    cfg = Config(
        embed_size=512, hidden_size=1024, crop_size=224, beam_size=3,
        max_decode_len=20, dtype="bfloat16",
    )
    vocab_size = 10000
    model = build_model(cfg, vocab_size)
    params, frozen = model.init(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.integers(0, 256, (BATCH, 256, 256, 3), dtype=np.uint8)
    )

    @jax.jit
    def caption(params, frozen, images_u8):
        feats = model.backbone_features(
            frozen, eval_transform(images_u8, cfg.crop_size)
        )
        step_fn, carry, first = model.make_decode_state(
            params, feats, beam_size=cfg.beam_size
        )
        ids, _ = beam_search(
            step_fn, carry, BATCH, beam_size=cfg.beam_size,
            max_len=cfg.max_decode_len, first_logits=first, tile=False,
        )
        return ids

    # NB: completion is forced by a device->host transfer of the ids each
    # iteration (what a real serving loop does anyway) — on the remote-relay
    # backend ``block_until_ready`` alone does not await device completion.
    # The loop is double-buffered: batch i+1 is enqueued (async dispatch)
    # before batch i's ids are fetched, overlapping host round-trips with
    # device compute exactly as a serving loop would.
    for _ in range(N_WARMUP):
        np.asarray(caption(params, frozen, images))

    t0 = time.perf_counter()
    prev = None
    for _ in range(N_ITERS):
        cur = caption(params, frozen, images)
        if prev is not None:
            np.asarray(prev)
        prev = cur
    np.asarray(prev)
    dt = time.perf_counter() - t0

    img_s = BATCH * N_ITERS / dt
    print(
        json.dumps(
            {
                "metric": "captioning throughput beam=3 (VGG16+SAT, 224px, b512)",
                "value": round(img_s, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(img_s / REFERENCE_GPU_IMG_S, 3),
            }
        )
    )


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # transient relay/compile hiccups: one retry
        print(f"bench attempt 1 failed ({e}); retrying", file=sys.stderr)
        main()
