"""Profiler trace artifacts for the roofline claims (VERDICT r3 item 8).

Captures a ``jax.profiler`` trace per bench mode — (a) the teacher-forced
TRAIN step at bench_train scale and (b) the beam-3 DECODE from features at
bench scale — then post-processes each .xplane.pb with the tensorboard
profile plugin into a top-op table, so docs/KERNELS.md's "VGG ~75% MXU /
attention chain ~11 ms / nothing left on the table" is auditable from
committed artifacts rather than asserted.

Outputs (committed):
    docs/traces/train_step.op_table.json
    docs/traces/beam_decode.op_table.json
    docs/traces/summary.json            (one line per mode: top-10 ops,
                                         total device time, capture env)
The raw .xplane.pb files stay under /tmp (tens of MB, env-specific); the
op tables are the auditable summaries.

Run: python benchmarks/profile_traces.py          (TPU; ~2 compiles)
     SAT_PROFILE_MODE=train|decode to run one mode only.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "docs", "traces",
)
EMBED, HIDDEN, VOCAB, PATCHES = 512, 1024, 10000, 196
BATCH = 256


def _capture(tag: str, fn, *args) -> str:
    """Run fn under a profiler trace; returns the xplane.pb path."""
    import jax

    log_dir = f"/tmp/sat_traces/{tag}"
    os.makedirs(log_dir, exist_ok=True)
    np.asarray(fn(*args))  # compile outside the trace
    jax.profiler.start_trace(log_dir)
    for _ in range(3):
        out = fn(*args)
    np.asarray(out)
    jax.profiler.stop_trace()
    paths = glob.glob(os.path.join(log_dir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        raise RuntimeError(f"no xplane.pb captured under {log_dir}")
    return max(paths, key=os.path.getmtime)


def _op_table(xplane_path: str, top_k: int = 25) -> dict:
    """xplane.pb -> flat op table.

    Uses TF's ``_pywrap_profiler_plugin.xspace_to_tools_data`` directly:
    the tensorboard_plugin_profile convert wrapper in this image is
    version-skewed against both protobuf (pre-3.19 generated _pb2) and
    TF's ``_pywrap_profiler`` (no ``xspace_to_tools_data`` attr), while
    the underlying pywrap binding works (verified live)."""
    from tensorflow.python.profiler.internal import (
        _pywrap_profiler_plugin as pp,
    )

    data, ok = pp.xspace_to_tools_data([xplane_path], "framework_op_stats", {})
    if not ok:
        raise RuntimeError(f"op-stats conversion failed for {xplane_path}")
    if isinstance(data, (bytes, bytearray)):
        data = bytes(data).decode("utf-8", "replace")
    return json.loads(data)


def _top_ops(table, top_k: int = 10):
    """Reduce the plugin's op-stats table to (name, category, total_us,
    self_us, occurrences, flop_rate) rows sorted by self time."""
    rows = []
    # gviz table format: {"cols": [...], "rows": [{"c": [{"v": ...}, ...]}]}
    if isinstance(table, list):
        chart = table[0] if table else {}
    else:
        chart = table
    cols = [c.get("label") or c.get("id") for c in chart.get("cols", [])]
    for r in chart.get("rows", []):
        vals = [c.get("v") if isinstance(c, dict) else c for c in r.get("c", [])]
        rows.append(dict(zip(cols, vals)))
    dev_col = next((c for c in cols if c and "device" in c.lower()), None)
    if dev_col:
        dev_rows = [r for r in rows if str(r.get(dev_col, "")).lower() == "device"]
        if dev_rows:
            rows = dev_rows
    key_self = next(
        (c for c in cols if c and "self" in c.lower() and "time" in c.lower()),
        None,
    ) or next((c for c in cols if c and "total time" in c.lower()), None)
    if key_self:
        rows.sort(key=lambda d: -(d.get(key_self) or 0))
    return rows[:top_k], cols


def _mode_train():
    import jax
    import jax.numpy as jnp
    import optax

    from show_and_tell_tpu.config import Config
    from show_and_tell_tpu.models.registry import build_model
    from show_and_tell_tpu.train.losses import masked_cross_entropy

    cfg = Config(
        embed_size=EMBED, hidden_size=HIDDEN, crop_size=224,
        batch_size=BATCH, dtype="bfloat16",
    )
    model = build_model(cfg, VOCAB)
    params, frozen = model.init(jax.random.PRNGKey(0))
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.integers(0, 256, (BATCH, 256, 256, 3), dtype=np.uint8)
    )
    captions = jnp.asarray(
        rng.integers(4, VOCAB, (BATCH, 20), dtype=np.int32)
    ).at[:, 0].set(1)
    lengths = jnp.full((BATCH,), 20, jnp.int32)

    from show_and_tell_tpu.data.transforms import train_transform

    @jax.jit
    def step(params, opt_state, images, captions, lengths, key):
        def loss_fn(p):
            x = train_transform(key, images, cfg.crop_size)
            feats = model.backbone_features(frozen, x)
            logits, mask, _ = model.decode_train(p, feats, captions, lengths)
            loss, _ = masked_cross_entropy(logits, captions[:, 1:], mask)
            return loss

        loss, g = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(1)

    def run(params, opt_state):
        p, s, loss = step(params, opt_state, images, captions, lengths, key)
        return loss

    return lambda: _capture("train_step", run, params, opt_state)


def _mode_decode():
    import jax
    import jax.numpy as jnp

    from show_and_tell_tpu.config import Config
    from show_and_tell_tpu.decode import beam_search
    from show_and_tell_tpu.models.registry import build_model

    cfg = Config(embed_size=EMBED, hidden_size=HIDDEN, beam_size=3, dtype="bfloat16")
    model = build_model(cfg, VOCAB)
    params, _ = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    feats = jnp.asarray(
        rng.standard_normal((BATCH, PATCHES, EMBED)).astype(np.float32)
    )

    @jax.jit
    def decode(params, feats):
        step_fn, carry, first = model.make_decode_state(params, feats, beam_size=3)
        ids, _ = beam_search(
            step_fn, carry, BATCH, beam_size=3,
            max_len=cfg.max_decode_len, first_logits=first, tile=False,
        )
        return ids

    return lambda: _capture("beam_decode", decode, params, feats)


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    want = os.environ.get("SAT_PROFILE_MODE", "both")
    summary = {"device": None, "modes": {}}
    import jax

    summary["device"] = str(jax.devices()[0])
    modes = {}
    if want in ("both", "train"):
        modes["train_step"] = _mode_train()
    if want in ("both", "decode"):
        modes["beam_decode"] = _mode_decode()
    for tag, launch in modes.items():
        t0 = time.perf_counter()
        xplane = launch()
        table = _op_table(xplane)
        top, cols = _top_ops(table)
        out_path = os.path.join(OUT_DIR, f"{tag}.op_table.json")
        with open(out_path, "w") as f:
            json.dump({"xplane_source": xplane, "cols": cols, "rows": top,
                       "full_row_count": (
                           len(table[0].get("rows", []))
                           if isinstance(table, list) and table
                           else len(table.get("rows", []))
                       )}, f, indent=1)
        summary["modes"][tag] = {
            "capture_s": round(time.perf_counter() - t0, 1),
            "top_ops": [
                {k: v for k, v in r.items() if v is not None} for r in top[:10]
            ],
            "op_table": os.path.relpath(out_path, os.path.dirname(OUT_DIR)),
        }
        print(f"{tag}: table -> {out_path}", flush=True)
    with open(os.path.join(OUT_DIR, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({"metric": "profiler traces captured",
                      "modes": sorted(summary["modes"])}))


if __name__ == "__main__":
    main()
