"""Standalone reproducer for the axon relay client's host-memory leak
(VERDICT r4 item 6).

The COCO-scale rehearsal measured a ~1:1-per-byte host RSS leak in this
rig's device-transport plugin: every ``jax.device_put`` leaves its payload
behind in host memory, ``del`` + ``gc`` notwithstanding (~91 GB over one
b256 epoch — docs/STATUS.md "Environment finding"). That leak shapes the
whole scaling story (the epoch-chain supervisor + RSS watchdog exist to
contain it), so it must be independently checkable and reportable
upstream. This script is the minimal demonstration:

    python benchmarks/relay_leak_repro.py            # both backends + JSON
    python benchmarks/relay_leak_repro.py --backend cpu   # one backend

Per backend it device_puts N batches of ``--mb`` MB, frees each
immediately, and fits the RSS-vs-bytes-transferred slope. Expected:
~1.0 bytes leaked per byte on the axon relay backend, ~0.0 on the CPU
backend (same loop, same process structure). Output:
benchmarks/relay_leak_repro.json.
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "relay_leak_repro.json")


def _rss_gb() -> float:
    from show_and_tell_tpu.train.preempt import current_rss_gb

    return current_rss_gb()


def measure(n_iters: int, mb: int) -> dict:
    import jax

    backend = jax.default_backend()
    dev = jax.devices()[0]
    chunk = np.empty((mb << 20,), dtype=np.uint8)
    # warm up: first transfers allocate transport buffers that are NOT the
    # leak (they are reused); measure from a settled baseline
    for _ in range(3):
        x = jax.device_put(chunk, dev)
        x.block_until_ready()
        del x
    gc.collect()
    rss0 = _rss_gb()
    points = []
    for i in range(n_iters):
        x = jax.device_put(chunk, dev)
        x.block_until_ready()
        del x
        gc.collect()
        points.append((float((i + 1) * mb) / 1024.0, _rss_gb() - rss0))
    xs = np.array([p[0] for p in points])
    ys = np.array([p[1] for p in points])
    slope = float(np.polyfit(xs, ys, 1)[0]) if len(points) > 1 else 0.0
    return {
        "backend": backend,
        "device": str(dev),
        "chunk_mb": mb,
        "iters": n_iters,
        "transferred_gb": round(float(xs[-1]), 2),
        "rss_growth_gb": round(float(ys[-1]), 3),
        "leaked_bytes_per_transferred_byte": round(slope, 4),
        "rss_curve_gb": [round(float(y), 3) for y in ys],
    }


def _run_child(backend: str, n_iters: int, mb: int) -> dict:
    env = os.environ.copy()
    if backend == "cpu":
        env["JAX_PLATFORMS"] = "cpu"
        for var in ("PALLAS_AXON_POOL_IPS", "JAX_PLATFORM_NAME",
                    "TPU_WORKER_HOSTNAMES"):
            env.pop(var, None)
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--backend", "self",
         "--iters", str(n_iters), "--mb", str(mb)],
        env=env, capture_output=True, text=True, timeout=1800,
    )
    if out.returncode != 0:
        raise RuntimeError(f"{backend} child failed: {out.stderr[-1500:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default="both",
                    choices=["both", "cpu", "default", "self"])
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--mb", type=int, default=50)
    a = ap.parse_args()
    if a.backend == "self":  # child mode: measure THIS process's backend
        print(json.dumps(measure(a.iters, a.mb)))
        return
    results = {}
    if a.backend in ("both", "default"):
        results["device_backend"] = _run_child("default", a.iters, a.mb)
    if a.backend in ("both", "cpu"):
        results["cpu_backend"] = _run_child("cpu", a.iters, a.mb)
    if "device_backend" in results and "cpu_backend" in results:
        results["finding"] = (
            f"device backend leaks "
            f"{results['device_backend']['leaked_bytes_per_transferred_byte']:.2f} "
            f"bytes/byte transferred vs "
            f"{results['cpu_backend']['leaked_bytes_per_transferred_byte']:.2f} "
            "on the CPU backend (same loop) — transport plugin, not framework"
        )
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({k: v for k, v in results.items() if k == "finding"}
                     or results))


if __name__ == "__main__":
    main()
