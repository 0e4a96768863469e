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
  Query params: ``mode=beam|greedy|sample`` (default from --beam_size).
- ``POST /caption_batch`` — multiple images as a JSON list of base64
  strings -> list of captions (one request = one bucketed device batch).
- ``GET  /healthz``       — liveness + model/config echo.

Request handling is intentionally synchronous and single-threaded: the
TPU program is the bottleneck and the Captioner's bucket batching already
amortizes it; a thread pool in front would only reorder the queue.
Corrupt images return 400 (single) or ERROR_CAPTION markers (batch) —
the per-item policy of Captioner.caption_paths, mapped onto HTTP.
"""

from __future__ import annotations

import base64
import io
import json
import logging
from http.server import BaseHTTPRequestHandler, HTTPServer
from typing import Optional

import numpy as np

from show_and_tell_tpu.config import Config, parse_config
from show_and_tell_tpu.serve import Captioner, ERROR_CAPTION
from show_and_tell_tpu.utils.logging import setup_logging
from show_and_tell_tpu.utils.vocab import Vocabulary

log = logging.getLogger(__name__)


def _decode_image(data: bytes, size: int = 256) -> Optional[np.ndarray]:
    from PIL import Image

    try:
        img = Image.open(io.BytesIO(data)).convert("RGB")
        if img.size != (size, size):
            img = img.resize((size, size))
        return np.asarray(img, dtype=np.uint8)
    except Exception as e:
        log.warning("request image failed to decode: %s", e)
        return None


class CaptionHandler(BaseHTTPRequestHandler):
    # injected by make_server: captioner, default_mode
    captioner: Captioner = None
    default_mode: str = "beam"

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
        if self.path.startswith("/healthz"):
            cfg = self.captioner.cfg
            self._send(200, {
                "ok": True,
                "model": cfg.model,
                "beam_size": cfg.beam_size,
                "buckets": list(self.captioner.bucket_sizes),
            })
        else:
            self._send(404, {"error": "unknown path"})

    def do_POST(self):
        try:
            mode = self._mode()
        except ValueError as e:
            return self._send(400, {"error": str(e)})
        length = int(self.headers.get("Content-Length", 0))
        if length <= 0:
            return self._send(400, {"error": "empty body"})
        data = self.rfile.read(length)
        if self.path.startswith("/caption_batch"):
            return self._caption_batch(data, mode)
        if self.path.startswith("/caption"):
            return self._caption_one(data, mode)
        self._send(404, {"error": "unknown path"})

    def _caption_one(self, data: bytes, mode: str) -> None:
        img = _decode_image(data)
        if img is None:
            return self._send(400, {"error": "image failed to decode"})
        caption = self.captioner.caption_images(img[None], mode=mode)[0]
        self._send(200, {"caption": caption, "mode": mode})

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
        stack = np.stack([
            d if d is not None else np.zeros((256, 256, 3), np.uint8)
            for d in decoded
        ])
        captions = self.captioner.caption_images(stack, mode=mode)
        captions = [c if good else ERROR_CAPTION for c, good in zip(captions, ok)]
        self._send(200, {
            "captions": captions,
            "mode": mode,
            "errors": [i for i, good in enumerate(ok) if not good],
        })


def make_server(
    cfg: Config, vocab: Vocabulary, host: str = "127.0.0.1", port: int = 8000,
    captioner: Optional[Captioner] = None,
) -> HTTPServer:
    """Build (don't start) the HTTP server — tests drive it in a thread."""
    cap = captioner or Captioner.from_checkpoint(cfg, cfg.load_model_path, vocab)
    handler = type(
        "BoundCaptionHandler",
        (CaptionHandler,),
        {
            "captioner": cap,
            "default_mode": "greedy" if cfg.beam_size <= 1 else "beam",
        },
    )
    return HTTPServer((host, port), handler)


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(add_help=False)
    ap.add_argument("--http_host", default="0.0.0.0")
    ap.add_argument("--http_port", type=int, default=8000)
    http_args, rest = ap.parse_known_args(argv)
    cfg = parse_config(rest)
    setup_logging("serve_http_log.txt")
    vocab = Vocabulary.load(cfg.vocab_path)
    server = make_server(cfg, vocab, http_args.http_host, http_args.http_port)
    log.info("serving on %s:%d", http_args.http_host, http_args.http_port)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()


if __name__ == "__main__":
    main()
