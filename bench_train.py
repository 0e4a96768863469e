"""Training-step benchmark (secondary; the driver's headline bench is
bench.py). Full step — uint8 images -> on-device augment -> frozen VGG16 ->
attention-LSTM teacher forcing -> masked CE -> grad clip -> Adam — on one
chip, reference config dims (batch 256, embed 512, hidden 1024, T=20).

Prints one JSON line {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is measured-vs-measured: this chip vs the actual reference
code's teacher-forced forward+backward on this host's CPU
(benchmarks/reference_baseline.json, produced by
benchmarks/reference_baseline.py). The reference's 2017 single-GPU figure
is unknown (it publishes no numbers); the old ~85 img/s guess is reported
separately as ``vs_estimated_gpu`` and labeled an estimate."""

from __future__ import annotations

import json
import sys
import time

import numpy as np

ESTIMATED_REFERENCE_GPU_TRAIN_IMG_S = 85.0  # estimate, not a measurement

from bench import _load_measured_baseline as _measured_baseline  # one loader

BATCH = 256
T = 20
N_WARMUP = 1
N_ITERS = 8
N_REPEATS = 3  # best-of windows (relay-tunnel degradation guard)


def main() -> None:
    import jax

    from show_and_tell_tpu.utils.compile_cache import enable as _enable_cache

    _enable_cache()
    from show_and_tell_tpu.config import Config
    from show_and_tell_tpu.models.registry import build_model
    from show_and_tell_tpu.parallel import mesh as mesh_lib
    from show_and_tell_tpu.train.step import make_train_state, make_train_step

    cfg = Config(
        embed_size=512, hidden_size=1024, crop_size=224, dtype="bfloat16",
        batch_size=BATCH,
    )
    model = build_model(cfg, 10000)
    mesh = mesh_lib.make_mesh()
    params, frozen = model.init(jax.random.PRNGKey(0))
    params = mesh_lib.place_params(mesh, params)
    frozen = mesh_lib.replicate(mesh, frozen)
    state = make_train_state(cfg, params)
    step = make_train_step(model, cfg, donate=True)

    rng = np.random.default_rng(0)
    batch = mesh_lib.shard_batch(
        mesh,
        {
            "images": rng.integers(0, 256, (BATCH, 256, 256, 3), dtype=np.uint8),
            "captions": np.concatenate(
                [np.ones((BATCH, 1), np.int32),
                 rng.integers(4, 10000, (BATCH, T - 1), dtype=np.int32)], 1
            ),
            "lengths": np.full((BATCH,), T, np.int32),
        },
    )

    def steady_state_img_s(state, frozen_tree):
        """Best-of-N_REPEATS steady-state windows (the relay tunnel can
        degrade a whole window; max reports the hardware, not the tunnel).

        Steady-state: fetch step i-1's loss while step i runs — the real
        Trainer syncs the loss only every ``log_step`` (trainer.py:196), so
        a per-step float() here would bill one relay host round-trip
        (~30 ms) to every step, which training never pays. The final fetch
        syncs the chain (steps serialize through the donated state on
        device regardless)."""
        for i in range(N_WARMUP):
            state, m = step(state, frozen_tree, batch, 1e-3, 0.05, jax.random.PRNGKey(i))
            float(m["loss"])
        best = 0.0
        for _ in range(N_REPEATS):
            t0 = time.perf_counter()
            prev = None
            for i in range(N_ITERS):
                state, m = step(state, frozen_tree, batch, 1e-3, 0.05, jax.random.PRNGKey(i))
                if prev is not None:
                    float(prev["loss"])
                prev = m
            float(prev["loss"])  # forces completion through the relay
            best = max(best, BATCH * N_ITERS / (time.perf_counter() - t0))
        return best

    img_s = steady_state_img_s(state, frozen)

    # int8 frozen trunk during training (Config.quantize_backbone — the
    # trunk is stop-gradient either way; models/quantize.py): measure the
    # same steady-state loop through the quantized backbone
    import jax.numpy as jnp

    from show_and_tell_tpu.data.transforms import eval_transform
    from show_and_tell_tpu.models.quantize import quantize_vgg16

    f32_frozen = jax.tree.map(lambda a: a.astype(jnp.float32), frozen)
    frozen_q = mesh_lib.replicate(
        mesh,
        quantize_vgg16(
            f32_frozen, eval_transform(batch["images"][:32], cfg.crop_size)
        ),
    )
    state_q = make_train_state(cfg, mesh_lib.place_params(mesh, model.init(jax.random.PRNGKey(0))[0]))
    img_s_q = steady_state_img_s(state_q, frozen_q)

    baseline = _measured_baseline()
    ref_train = baseline.get("train_img_s")
    print(
        json.dumps(
            {
                "metric": "training throughput (VGG16+SAT full step, b256, bf16)",
                "value": round(img_s, 2),
                "unit": "images/sec/chip",
                "int8_backbone_img_s": round(img_s_q, 2),
                "int8_backbone_speedup": round(img_s_q / img_s, 3),
                "vs_baseline": round(img_s / ref_train, 3) if ref_train else None,
                "baseline": {
                    "measured_reference_train_img_s": ref_train,
                    "reference_device": baseline.get("device"),
                    "note": "measured TPU-chip vs measured host-CPU, same "
                    "teacher-forced protocol; the reference cannot run on TPU",
                },
                "vs_estimated_gpu": round(
                    img_s / ESTIMATED_REFERENCE_GPU_TRAIN_IMG_S, 3
                ),
            }
        )
    )


if __name__ == "__main__":
    try:
        main()
    except Exception as e:
        print(f"bench_train attempt 1 failed ({e}); retrying", file=sys.stderr)
        main()
