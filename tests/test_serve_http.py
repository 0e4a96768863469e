"""HTTP serving endpoint: request/response contract over a live server."""

import base64
import io
import json
import threading
import urllib.request
import urllib.error

import numpy as np
import pytest
from PIL import Image

from show_and_tell_tpu.config import Config
from show_and_tell_tpu.cli.serve_http import make_server
from show_and_tell_tpu.serve import ERROR_CAPTION
from show_and_tell_tpu.utils.vocab import Vocabulary


@pytest.fixture(scope="module")
def server():
    cfg = Config(
        embed_size=16, hidden_size=24, crop_size=32, max_decode_len=4,
        beam_size=2,
    )
    vocab = Vocabulary.from_words(["a", "dog", "runs", "sits"])
    srv = make_server(cfg, vocab, host="127.0.0.1", port=0)  # ephemeral port
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()
    srv.server_close()


def _png_bytes(seed=0):
    rng = np.random.default_rng(seed)
    img = Image.fromarray((rng.random((64, 64, 3)) * 255).astype(np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


def _post(url, data, headers=None):
    req = urllib.request.Request(url, data=data, headers=headers or {})
    with urllib.request.urlopen(req, timeout=60) as r:
        return r.status, json.loads(r.read())


def test_healthz(server):
    with urllib.request.urlopen(f"{server}/healthz", timeout=30) as r:
        body = json.loads(r.read())
    assert r.status == 200 and body["ok"]
    assert body["model"] == "show_attend_tell" and body["beam_size"] == 2


def test_caption_single(server):
    status, body = _post(f"{server}/caption", _png_bytes())
    assert status == 200
    assert isinstance(body["caption"], str) and body["mode"] == "beam"
    status, body = _post(f"{server}/caption?mode=greedy", _png_bytes(1))
    assert status == 200 and body["mode"] == "greedy"


def test_caption_batch_with_corrupt_item(server):
    items = [
        base64.b64encode(_png_bytes(0)).decode(),
        base64.b64encode(b"this is not an image").decode(),
        base64.b64encode(_png_bytes(1)).decode(),
    ]
    status, body = _post(
        f"{server}/caption_batch", json.dumps(items).encode(),
        {"Content-Type": "application/json"},
    )
    assert status == 200
    assert len(body["captions"]) == 3
    assert body["errors"] == [1]
    assert body["captions"][1] == ERROR_CAPTION
    assert body["captions"][0] != ERROR_CAPTION


def test_error_contracts(server):
    # corrupt single image -> 400
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(f"{server}/caption", b"junk bytes")
    assert ei.value.code == 400
    # unknown mode -> 400
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(f"{server}/caption?mode=quantum", _png_bytes())
    assert ei.value.code == 400
    # empty body -> 400
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(f"{server}/caption", b"")
    assert ei.value.code == 400
    # unknown path -> 404
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(f"{server}/nope", _png_bytes())
    assert ei.value.code == 404


def test_overload_maps_to_429(server):
    """A full batcher queue surfaces as HTTP 429, not a dropped connection
    (review fix). Uses a dedicated server whose queue holds nothing."""
    cfg = Config(
        embed_size=16, hidden_size=24, crop_size=32, max_decode_len=4,
        beam_size=2,
    )
    vocab = Vocabulary.from_words(["a", "dog", "runs", "sits"])
    srv = make_server(
        cfg, vocab, host="127.0.0.1", port=0, batch_max_queue=0
    )
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(f"{url}/caption", _png_bytes())
        assert ei.value.code == 429
        # batch endpoint: nothing succeeded -> whole request is 429 too
        items = [base64.b64encode(_png_bytes(0)).decode()]
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(f"{url}/caption_batch", json.dumps(items).encode())
        assert ei.value.code == 429
        assert srv.batcher.stats()["rejected"] == 2
    finally:
        srv.shutdown()
        srv.server_close()


def test_bind_failure_closes_batcher():
    """A failed bind must not leak a running batcher worker (review fix)."""
    import socket

    cfg = Config(
        embed_size=16, hidden_size=24, crop_size=32, max_decode_len=4,
        beam_size=2,
    )
    vocab = Vocabulary.from_words(["a", "dog", "runs", "sits"])
    hog = socket.socket()
    hog.bind(("127.0.0.1", 0))
    hog.listen(1)
    port = hog.getsockname()[1]
    before = set(threading.enumerate())  # other fixtures' workers excluded
    try:
        with pytest.raises(OSError):
            make_server(cfg, vocab, host="127.0.0.1", port=port)
        leaked = [
            th for th in threading.enumerate()
            if th.name == "caption-batcher" and th not in before
        ]
        assert leaked == []  # the autostarted worker was closed, not leaked
    finally:
        hog.close()


def test_caption_attention_endpoint(server):
    """?attention=1 -> greedy caption + a decodable attention-sheet PNG."""
    status, body = _post(f"{server}/caption?attention=1", _png_bytes())
    assert status == 200
    assert body["mode"] == "greedy"
    assert isinstance(body["caption"], str)
    png = base64.b64decode(body["attention_sheet_png_b64"])
    sheet = Image.open(io.BytesIO(png))
    # panels: input + one per word, each a crop_size (32) square — the
    # sheet renders the model's center-cropped view (geometry review fix)
    n_words = max(len(body["caption"].split()), 1)
    assert sheet.width == 32 * min(1 + n_words, 5)
    assert sheet.height % (32 + 14) == 0


def test_caption_nbest_endpoint(server):
    """?nbest=1 -> best caption + the full scored beam list."""
    status, body = _post(f"{server}/caption?nbest=1", _png_bytes())
    assert status == 200
    assert body["mode"] == "beam"
    alts = body["nbest"]
    assert len(alts) >= 2  # beam_size=2 in the fixture config
    assert body["caption"] == alts[0]["caption"]
    scores = [a["score"] for a in alts]
    assert scores == sorted(scores, reverse=True)
