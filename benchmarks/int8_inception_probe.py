"""Int8 Inception-v3 trunk in the scaled training config: measured probe.

The scaled BASELINE workload (benchmarks/baseline_workloads.py wl5) is
Inception-v3 + 2-layer LSTM ShowTell, bf16, crop 299, b256. This measures
the same step with the frozen trunk swapped for the int8 PTQ tree
(models/quantize.py quantize_inception_v3) — the trunk is stop-gradient
either way, so the swap is training-safe exactly like the VGG case.

    python benchmarks/int8_inception_probe.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EMBED, HIDDEN, VOCAB = 512, 1024, 10000
B, T = 256, 20
ITERS = 6


def main():
    import jax
    import jax.numpy as jnp

    from show_and_tell_tpu.config import Config
    from show_and_tell_tpu.data.transforms import eval_transform
    from show_and_tell_tpu.models import quantize
    from show_and_tell_tpu.models.registry import build_model
    from show_and_tell_tpu.train.step import make_train_state, make_train_step

    print("devices:", jax.devices())
    cfg = Config(
        encoder="inception_v3", num_layers=2, embed_size=EMBED,
        hidden_size=HIDDEN, crop_size=299, dtype="bfloat16",
        model="show_tell", batch_size=B,
    )
    model = build_model(cfg, VOCAB)
    params, frozen = model.init(jax.random.PRNGKey(0))
    stats = model.init_batch_stats()
    step = make_train_step(model, cfg, donate=False)
    rng = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(
            rng.integers(0, 256, (B, 320, 320, 3), dtype=np.uint8)
        ),
        "captions": jnp.asarray(
            rng.integers(4, VOCAB, (B, T)), jnp.int32
        ).at[:, 0].set(1),
        "lengths": jnp.full((B,), T, jnp.int32),
    }

    frozen_q = quantize.quantize_inception_v3(
        frozen, eval_transform(batch["images"][:32], cfg.crop_size)
    )
    cos = quantize.feature_agreement(
        frozen, frozen_q, eval_transform(batch["images"][:8], cfg.crop_size)
    )

    for name, fr in (("bf16", frozen), ("int8", frozen_q)):
        state = make_train_state(cfg, params, batch_stats=stats)
        state, m = step(state, fr, batch, 1e-3, 0.0, jax.random.PRNGKey(1))
        float(m["loss"])  # sync after compile
        t0 = time.perf_counter()
        for i in range(ITERS):
            state, m = step(state, fr, batch, 1e-3, 0.0, jax.random.PRNGKey(i))
        loss = float(m["loss"])  # steady-state sync
        dt = (time.perf_counter() - t0) / ITERS
        print(f"{name}: {B / dt:8.1f} img/s  ({dt * 1e3:.1f} ms/step, loss {loss:.3f})")
    print(f"feature cosine int8 vs f32: {cos:.4f}")


if __name__ == "__main__":
    main()
