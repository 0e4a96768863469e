"""HTTP captioning server — production serving front end over Captioner.

The reference has no serving story at all (eval.py is validation-only);
this exposes the bucketed-batch TPU serving path over plain HTTP with
zero dependencies (stdlib ``http.server``):

    python -m show_and_tell_tpu.cli.serve_http \
        --vocab_path data/vocab.json --load_model_path experiment/u/e \
        --encoder_weights vgg16.pth --http_port 8000

    curl -s -X POST --data-binary @photo.jpg localhost:8000/caption
    -> {"caption": "a man riding a horse", "mode": "beam"}

Endpoints:
- ``POST /caption``       — raw image bytes (any PIL format) -> one caption.
  Query params: ``mode=beam|greedy|sample`` (default from --beam_size);
  ``attention=1`` returns a greedy caption plus the attention-overlay
  contact sheet (base64 PNG — the Show-Attend-Tell hallmark figure);
  ``nbest=1`` returns the full beam n-best list (caption + score each).
- ``POST /caption_batch`` — multiple images as a JSON list of base64
  strings -> list of captions (one request = one bucketed device batch).
- ``GET  /healthz``       — liveness + model/config echo + batcher stats.
- ``GET  /metrics``       — Prometheus text exposition of the serving
  counters (requests/batches/queue-wait/errors, per-mode request counts).

Concurrency model: a threaded server accepts any number of simultaneous
connections; every decoded image goes through one ``DynamicBatcher``
(serve.py), whose single worker thread coalesces concurrent requests into
bucketed device batches (same-mode FIFO runs, up to ``--batch_max_size``,
waiting at most ``--batch_max_delay_ms`` after the first request). That
is what keeps the chip busy under many batch=1 clients — and it also
serializes all device work onto one thread, which is what makes the
(non-thread-safe) Captioner safe here. ``--no_dynamic_batch`` falls back
to the old synchronous single-threaded handling. Corrupt images return
400 (single) or ERROR_CAPTION markers (batch) — the per-item policy of
Captioner.caption_paths, mapped onto HTTP.
"""

from __future__ import annotations

import base64
import json
import logging
import os
from http.server import BaseHTTPRequestHandler, HTTPServer, ThreadingHTTPServer
from typing import Optional

import numpy as np

from show_and_tell_tpu.config import Config, parse_config
from show_and_tell_tpu.serve import (
    Captioner,
    DynamicBatcher,
    ERROR_CAPTION,
    QueueFull,
)
from show_and_tell_tpu.utils.compile_cache import enable as enable_compile_cache
from show_and_tell_tpu.utils.logging import setup_logging
from show_and_tell_tpu.utils.vocab import Vocabulary

log = logging.getLogger(__name__)


def _decode_image(data: bytes, size: int = 256) -> Optional[np.ndarray]:
    # the canonical ingest contract lives in data/pipeline.py — one
    # definition of the resize/convert policy for loader, serving and
    # HTTP paths (review fix: this was a second copy that could drift)
    from show_and_tell_tpu.data.pipeline import _load_image_checked

    img, ok = _load_image_checked(data, size)
    return img if ok else None


class CaptionHandler(BaseHTTPRequestHandler):
    # injected by make_server: captioner, default_mode, batcher (None =
    # synchronous single-threaded fallback)
    captioner: Captioner = None
    default_mode: str = "beam"
    batcher: Optional[DynamicBatcher] = None

    def log_message(self, fmt, *args):  # route to our logger, not stderr
        log.info("%s - %s", self.address_string(), fmt % args)

    def _send(self, code: int, payload: dict) -> None:
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _mode(self) -> str:
        from urllib.parse import parse_qs, urlparse

        q = parse_qs(urlparse(self.path).query)
        mode = q.get("mode", [self.default_mode])[0]
        if mode not in ("beam", "greedy", "sample"):
            raise ValueError(f"unknown mode {mode!r}")
        return mode

    def do_GET(self):
        if self.path.startswith("/metrics"):
            return self._metrics()
        if self.path.startswith("/healthz"):
            cfg = self.captioner.cfg
            payload = {
                "ok": True,
                "model": cfg.model,
                "beam_size": cfg.beam_size,
                "buckets": list(self.captioner.bucket_sizes),
            }
            if self.batcher is not None:
                payload["batcher"] = self.batcher.stats()
            self._send(200, payload)
        else:
            self._send(404, {"error": "unknown path"})

    def _metrics(self) -> None:
        """Prometheus text exposition (format 0.0.4) of the batcher
        counters — sums + counts so rate()/avg are computable server-side."""
        if self.batcher is None:
            return self._send(
                404, {"error": "metrics require dynamic batching (drop "
                      "--no_dynamic_batch)"}
            )
        s = self.batcher.stats()
        lines = [
            "# TYPE sat_requests_total counter",
            f"sat_requests_total {s['requests']}",
            "# TYPE sat_batches_total counter",
            f"sat_batches_total {s['batches']}",
            "# TYPE sat_batched_images_total counter",
            f"sat_batched_images_total {s['batch_size_sum']}",
            "# TYPE sat_queue_wait_seconds_total counter",
            f"sat_queue_wait_seconds_total {s['queue_wait_s_sum']:.6f}",
            "# TYPE sat_request_errors_total counter",
            f"sat_request_errors_total {s['errors']}",
            "# TYPE sat_requests_rejected_total counter",
            f"sat_requests_rejected_total {s['rejected']}",
            "# TYPE sat_requests_abandoned_total counter",
            f"sat_requests_abandoned_total {s['abandoned']}",
            "# TYPE sat_requests_by_mode_total counter",
        ]
        lines += [
            f'sat_requests_by_mode_total{{mode="{m}"}} {n}'
            for m, n in s["requests_by_mode"].items()
        ]
        lat = s["latency_ms"]
        if lat["n"]:
            # windowed percentiles as gauges (a proper histogram would need
            # fixed buckets; the p50/p95/p99 summary is what dashboards plot)
            lines.append("# TYPE sat_request_latency_ms gauge")
            lines += [
                f'sat_request_latency_ms{{quantile="{q}"}} {lat[q]}'
                for q in ("p50", "p95", "p99")
            ]
        body = ("\n".join(lines) + "\n").encode()
        self.send_response(200)
        self.send_header("Content-Type", "text/plain; version=0.0.4")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_POST(self):
        try:
            mode = self._mode()
        except ValueError as e:
            return self._send(400, {"error": str(e)})
        try:
            # a malformed Content-Length must map to a 400 like every other
            # bad input, not kill the handler thread (review fix)
            length = int(self.headers.get("Content-Length", 0))
        except (TypeError, ValueError):
            return self._send(400, {"error": "bad Content-Length header"})
        if length <= 0:
            return self._send(400, {"error": "empty body"})
        data = self.rfile.read(length)
        # every failure mode maps to an HTTP response (review fix: a raised
        # TimeoutError/RuntimeError used to escape do_POST, and the client
        # saw a dropped connection instead of a status code)
        try:
            if self.path.startswith("/caption_batch"):
                return self._caption_batch(data, mode)
            if self.path.startswith("/caption"):
                return self._caption_one(data, mode)
        except QueueFull as e:
            return self._send(429, {"error": str(e)})
        except TimeoutError as e:
            return self._send(503, {"error": str(e)})
        except Exception as e:
            log.exception("request handling failed")
            return self._send(500, {"error": f"caption request failed: {e}"})
        self._send(404, {"error": "unknown path"})

    def _caption_one(self, data: bytes, mode: str) -> None:
        img = _decode_image(data)
        if img is None:
            return self._send(400, {"error": "image failed to decode"})
        if self._wants_attention():
            return self._caption_attention(img)
        if self._qflag("nbest"):
            # beam n-best: like the attention endpoint, an interactive
            # surface that bypasses the batcher (the Captioner's internal
            # lock keeps it safe alongside the worker)
            nbest = self.captioner.caption_nbest(img[None])[0]
            return self._send(200, {
                "caption": nbest[0][0], "mode": "beam",
                "nbest": [
                    {"caption": c, "score": round(s, 4)} for c, s in nbest
                ],
            })
        if self.batcher is not None:
            caption = self.batcher.caption(img, mode=mode)
        else:
            caption = self.captioner.caption_images(img[None], mode=mode)[0]
        self._send(200, {"caption": caption, "mode": mode})

    def _wants_attention(self) -> bool:
        return self._qflag("attention")

    def _qflag(self, name: str) -> bool:
        from urllib.parse import parse_qs, urlparse

        q = parse_qs(urlparse(self.path).query)
        return q.get(name, ["0"])[0] in ("1", "true", "yes")

    def _caption_attention(self, img) -> None:
        """``POST /caption?attention=1``: greedy caption + the attention
        contact sheet as base64 PNG (the Show-Attend-Tell figure).

        A demo/debug surface: it bypasses the DynamicBatcher (the
        attention program is its own jit cache entry and the call pattern
        is interactive, not throughput-bound); the Captioner's internal
        lock serializes these calls against the batcher worker (review
        fix: handler threads used to race the worker's _fns mutations)."""
        import io

        from show_and_tell_tpu.utils.visualize import attention_sheet, model_view

        try:
            caps, alphas = self.captioner.caption_with_attention(img[None])
        except ValueError as e:  # model without attention (show_tell) -> 400
            return self._send(400, {"error": str(e)})
        words = caps[0].split() or ["<no caption>"]
        # render on the center crop the model attended over (review fix:
        # the heatmap grid covers crop_size pixels, not the full frame)
        sheet = attention_sheet(
            model_view(img, self.captioner.cfg.crop_size), alphas[0], words
        )
        buf = io.BytesIO()
        sheet.save(buf, format="PNG")
        self._send(200, {
            "caption": caps[0],
            "mode": "greedy",
            "attention_sheet_png_b64": base64.b64encode(buf.getvalue()).decode(),
        })

    def _caption_batch(self, data: bytes, mode: str) -> None:
        try:
            items = json.loads(data)
            assert isinstance(items, list) and items
            blobs = [base64.b64decode(s) for s in items]
        except Exception:
            return self._send(
                400, {"error": "body must be a non-empty JSON list of base64 images"}
            )
        decoded = [_decode_image(b) for b in blobs]
        ok = [d is not None for d in decoded]
        if self.batcher is not None:
            # per-item tickets: this request's images coalesce with every
            # other in-flight client on the one batcher worker. Per-item
            # overload/timeout failures degrade that item to ERROR_CAPTION
            # (reported in "errors") instead of failing the whole request —
            # unless NOTHING succeeded, which surfaces as 429/503 via the
            # do_POST mapping.
            any_decoded = any(ok)
            tickets = []
            for d, good in zip(decoded, ok):
                if not good:
                    tickets.append(None)
                    continue
                try:
                    tickets.append(self.batcher.submit(d, mode=mode))
                except QueueFull as e:
                    tickets.append(e)
            captions = []
            for i, t in enumerate(tickets):
                if t is None or isinstance(t, QueueFull):
                    captions.append(ERROR_CAPTION)
                    if t is not None:
                        ok[i] = False
                    continue
                try:
                    captions.append(t.result(timeout=120.0))
                except (TimeoutError, RuntimeError):
                    captions.append(ERROR_CAPTION)
                    ok[i] = False
            if any_decoded and not any(ok):
                first = next(
                    (t for t in tickets if isinstance(t, QueueFull)), None
                )
                if first is not None:
                    raise first
                raise TimeoutError("no caption request completed")
        else:
            stack = np.stack([
                d if d is not None else np.zeros((256, 256, 3), np.uint8)
                for d in decoded
            ])
            captions = self.captioner.caption_images(stack, mode=mode)
            captions = [
                c if good else ERROR_CAPTION for c, good in zip(captions, ok)
            ]
        self._send(200, {
            "captions": captions,
            "mode": mode,
            "errors": [i for i, good in enumerate(ok) if not good],
        })


def make_server(
    cfg: Config, vocab: Vocabulary, host: str = "127.0.0.1", port: int = 8000,
    captioner: Optional[Captioner] = None,
    dynamic_batch: bool = True,
    batch_max_delay_ms: float = 10.0,
    batch_max_size: Optional[int] = None,
    batch_max_queue: Optional[int] = None,
    warmup: bool = False,
    warmup_calib_dir: Optional[str] = None,
    warmup_surfaces: Optional[str] = None,
) -> HTTPServer:
    """Build (don't start) the HTTP server — tests drive it in a thread.

    With ``dynamic_batch`` (default) the server is threaded and all device
    work flows through one :class:`DynamicBatcher`; the returned server
    carries it as ``server.batcher`` (closed by ``server_close``).
    """
    cap = captioner or Captioner.from_checkpoint(cfg, cfg.load_model_path, vocab)
    if warmup:
        # compile (and int8-calibrate, if configured) BEFORE accepting
        # traffic: a cold TPU compile is 20-60 s — longer than any sane
        # client timeout, so the first real request must never pay it.
        # int8 calibration needs REAL images (--warmup_calib_dir) or a
        # persisted quantized_backbone_path; zeros would wreck the scales.
        calib = None
        if warmup_calib_dir:
            import glob as _glob

            from show_and_tell_tpu.data.pipeline import _load_image_checked

            paths = sorted(
                p for p in _glob.glob(os.path.join(warmup_calib_dir, "*"))
                if os.path.isfile(p)
            )
            ok = []
            # filter AFTER decoding: sidecar files (labels/.json) sorting
            # early must not crowd real images out of the calibration
            # sample (review fix)
            for p in paths:
                im, good = _load_image_checked(p)
                if good:
                    ok.append(im)
                if len(ok) == 32:
                    break
            if not ok:
                raise SystemExit(
                    f"--warmup_calib_dir {warmup_calib_dir}: no decodable "
                    "images found"
                )
            calib = np.stack(ok)
        modes = ["greedy" if cfg.beam_size <= 1 else "beam"]
        modes += [s for s in (warmup_surfaces or "").split(",") if s]
        log.info("warming serving programs (modes=%s)...", modes)
        log.info(
            "warmup done in %.1f s",
            cap.warmup(modes=modes, calib_images=calib),
        )
    batcher = (
        DynamicBatcher(
            cap, max_batch=batch_max_size, max_delay_ms=batch_max_delay_ms,
            max_queue=batch_max_queue,
        )
        if dynamic_batch
        else None
    )
    handler = type(
        "BoundCaptionHandler",
        (CaptionHandler,),
        {
            "captioner": cap,
            "default_mode": "greedy" if cfg.beam_size <= 1 else "beam",
            "batcher": batcher,
        },
    )
    server_cls = ThreadingHTTPServer if batcher is not None else HTTPServer

    class _Server(server_cls):
        daemon_threads = True

        def server_close(self):
            if batcher is not None:
                batcher.close()
            super().server_close()

    try:
        srv = _Server((host, port), handler)
    except Exception:
        # bind failed (e.g. port in use): don't leak the already-started
        # batcher worker thread (review fix)
        if batcher is not None:
            batcher.close()
        raise
    srv.batcher = batcher
    return srv


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(add_help=False)
    ap.add_argument("--http_host", default="0.0.0.0")
    ap.add_argument("--http_port", type=int, default=8000)
    ap.add_argument(
        "--no_dynamic_batch", action="store_true",
        help="synchronous single-threaded handling (no request coalescing)",
    )
    ap.add_argument(
        "--batch_max_delay_ms", type=float, default=10.0,
        help="max wait after the first queued request before dispatch",
    )
    ap.add_argument(
        "--batch_max_size", type=int, default=None,
        help="max coalesced batch (default: the largest serving bucket)",
    )
    ap.add_argument(
        "--batch_max_queue", type=int, default=None,
        help="queue depth past which requests get 429 "
        "(default: 8x the max batch)",
    )
    ap.add_argument(
        "--warmup", action="store_true",
        help="compile the serving programs (every bucket) before "
        "accepting traffic, so no request pays the TPU compile",
    )
    ap.add_argument(
        "--warmup_calib_dir", default=None,
        help="directory of sample REAL images for int8 calibration during "
        "--warmup (quantize_backbone only; without it calibration defers "
        "to the first real batch)",
    )
    ap.add_argument(
        "--warmup_surfaces", default=None,
        help="extra surfaces to pre-compile with --warmup, comma-separated "
        "from {nbest,attention,greedy,beam,sample} — otherwise the first "
        "?nbest=1 / ?attention=1 request compiles while holding the "
        "Captioner lock, stalling the batcher behind it",
    )
    http_args, rest = ap.parse_known_args(argv)
    cfg = parse_config(rest)
    setup_logging("serve_http_log.txt")
    # persistent XLA cache: restarted servers skip the 20-60s bucket
    # compiles (--warmup then only replays cached executables)
    enable_compile_cache()
    vocab = Vocabulary.load(cfg.vocab_path)
    server = make_server(
        cfg, vocab, http_args.http_host, http_args.http_port,
        dynamic_batch=not http_args.no_dynamic_batch,
        batch_max_delay_ms=http_args.batch_max_delay_ms,
        batch_max_size=http_args.batch_max_size,
        batch_max_queue=http_args.batch_max_queue,
        warmup=http_args.warmup,
        warmup_calib_dir=http_args.warmup_calib_dir,
        warmup_surfaces=http_args.warmup_surfaces,
    )
    log.info("serving on %s:%d", http_args.http_host, http_args.http_port)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()


if __name__ == "__main__":
    main()
