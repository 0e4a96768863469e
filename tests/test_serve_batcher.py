"""DynamicBatcher: request coalescing, mode runs, errors, HTTP concurrency."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from show_and_tell_tpu.config import Config
from show_and_tell_tpu.serve import Captioner, DynamicBatcher
from show_and_tell_tpu.utils.vocab import Vocabulary


@pytest.fixture(scope="module")
def captioner():
    cfg = Config(
        embed_size=16, hidden_size=24, crop_size=32, max_decode_len=4,
        beam_size=2,
    )
    vocab = Vocabulary.from_words(["a", "dog", "runs", "sits"])
    return Captioner.from_checkpoint(cfg, None, vocab)


def _images(n, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.random((n, 256, 256, 3)) * 255).astype(np.uint8)


def test_coalesced_batch_matches_direct_call(captioner):
    """8 tickets queued before the worker starts -> ONE device batch whose
    per-index captions equal a direct caption_images call."""
    imgs = _images(8)
    expected = captioner.caption_images(imgs, mode="beam")
    b = DynamicBatcher(captioner, max_delay_ms=50.0, autostart=False)
    tickets = [b.submit(imgs[i], mode="beam") for i in range(8)]
    b.start()
    got = [t.result(timeout=120.0) for t in tickets]
    assert got == expected
    s = b.stats()
    assert s["requests"] == 8 and s["batches"] == 1
    assert s["mean_batch_size"] == 8.0
    b.close()


def test_mode_runs_split_batches(captioner):
    """A mode change at the queue head closes the batch; FIFO order and
    per-mode results are both preserved."""
    imgs = _images(6, seed=1)
    exp_beam = captioner.caption_images(imgs[:3], mode="beam")
    exp_greedy = captioner.caption_images(imgs[3:], mode="greedy")
    b = DynamicBatcher(captioner, max_delay_ms=50.0, autostart=False)
    tickets = [b.submit(imgs[i], "beam") for i in range(3)]
    tickets += [b.submit(imgs[3 + i], "greedy") for i in range(3)]
    b.start()
    got = [t.result(timeout=120.0) for t in tickets]
    assert got == exp_beam + exp_greedy
    s = b.stats()
    assert s["batches"] == 2 and s["requests"] == 6
    b.close()


def test_max_batch_respected(captioner):
    imgs = _images(5, seed=2)
    b = DynamicBatcher(captioner, max_batch=2, max_delay_ms=20.0, autostart=False)
    tickets = [b.submit(imgs[i]) for i in range(5)]
    b.start()
    for t in tickets:
        t.result(timeout=120.0)
    s = b.stats()
    assert s["batches"] == 3  # 2 + 2 + 1
    b.close()


def test_error_propagates_and_worker_survives(captioner):
    b = DynamicBatcher(captioner, max_delay_ms=5.0)
    bad = np.zeros((16, 16, 3), np.uint8)  # wrong spatial shape for the model
    with pytest.raises(RuntimeError, match="caption request failed"):
        b.caption(bad, timeout=120.0)
    # the worker must still serve the next, valid request (note: a random
    # tiny model may legitimately emit an empty caption — compare against
    # the direct call, don't assert non-empty)
    good = b.caption(_images(1)[0], timeout=120.0)
    assert good == captioner.caption_images(_images(1))[0]
    assert b.stats()["errors"] == 1
    b.close()


def test_close_contracts(captioner):
    b = DynamicBatcher(captioner, max_delay_ms=5.0)
    b.close()
    with pytest.raises(RuntimeError, match="closed"):
        b.submit(_images(1)[0])
    with pytest.raises(RuntimeError, match="closed"):
        b.start()
    # pending tickets fail rather than hang
    b2 = DynamicBatcher(captioner, autostart=False)
    t = b2.submit(_images(1)[0])
    b2.close()
    with pytest.raises(RuntimeError, match="batcher closed"):
        t.result(timeout=5.0)


def test_http_concurrent_requests_coalesce(captioner):
    """Concurrent single-image POSTs against the threaded server end up in
    shared device batches (fewer batches than requests)."""
    import io

    from PIL import Image

    from show_and_tell_tpu.cli.serve_http import make_server

    srv = make_server(
        captioner.cfg, captioner.vocab, host="127.0.0.1", port=0,
        captioner=captioner, batch_max_delay_ms=250.0,
    )
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        def png(seed):
            buf = io.BytesIO()
            Image.fromarray(_images(1, seed=seed)[0]).save(buf, format="PNG")
            return buf.getvalue()

        def post(seed, out, i):
            try:
                req = urllib.request.Request(f"{url}/caption", data=png(seed))
                with urllib.request.urlopen(req, timeout=120) as r:
                    out[i] = json.loads(r.read())
            except Exception as e:  # surface thread failures in the assert
                out[i] = e

        # warm the compile cache so the burst isn't serialized behind it
        post(0, [None], 0)
        n = 8
        out = [None] * n
        threads = [
            threading.Thread(target=post, args=(i, out, i)) for i in range(n)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert all(isinstance(o, dict) and "caption" in o for o in out), out
        stats = srv.batcher.stats()
        assert stats["requests"] == n + 1
        # the burst must have shared batches (worst case: 1 warmup + a
        # first-burst singleton + one batch holding the rest)
        assert stats["batches"] < n + 1
        assert stats["batch_size_sum"] == n + 1
        with urllib.request.urlopen(f"{url}/healthz", timeout=30) as r:
            body = json.loads(r.read())
        assert body["batcher"]["requests"] == n + 1
        assert body["batcher"]["requests_by_mode"]["beam"] == n + 1
        # Prometheus exposition mirrors the same counters
        with urllib.request.urlopen(f"{url}/metrics", timeout=30) as r:
            assert r.headers["Content-Type"].startswith("text/plain")
            text = r.read().decode()
        assert f"sat_requests_total {n + 1}" in text
        assert f'sat_requests_by_mode_total{{mode="beam"}} {n + 1}' in text
        assert "sat_queue_wait_seconds_total" in text
    finally:
        srv.shutdown()
        srv.server_close()
        thread.join(timeout=10)


def test_queue_full_backpressure(captioner):
    """Past max_queue, submit() sheds load with QueueFull instead of
    growing the queue unboundedly (review fix)."""
    from show_and_tell_tpu.serve import QueueFull

    b = DynamicBatcher(captioner, autostart=False, max_queue=2)
    imgs = _images(3, seed=3)
    t0, t1 = b.submit(imgs[0]), b.submit(imgs[1])
    with pytest.raises(QueueFull, match="queue full"):
        b.submit(imgs[2])
    assert b.stats()["rejected"] == 1
    b.start()
    for t in (t0, t1):
        t.result(timeout=120.0)
    assert b.stats()["requests"] == 2
    b.close()


def test_abandoned_tickets_not_dispatched(captioner):
    """A ticket whose client timed out is dropped by the worker, not
    captioned into the void (review fix)."""
    b = DynamicBatcher(captioner, autostart=False, max_delay_ms=5.0)
    imgs = _images(3, seed=4)
    tickets = [b.submit(imgs[i]) for i in range(3)]
    with pytest.raises(TimeoutError):
        tickets[1].result(timeout=0.01)  # client gives up -> abandoned
    assert tickets[1].abandoned
    b.start()
    got0 = tickets[0].result(timeout=120.0)
    got2 = tickets[2].result(timeout=120.0)
    assert got0 == captioner.caption_images(imgs[:1])[0]
    assert got2 == captioner.caption_images(imgs[2:])[0]
    s = b.stats()
    assert s["abandoned"] == 1
    assert s["batch_size_sum"] == 2  # only the live tickets hit the device
    b.close()


def test_mean_queue_wait_is_per_request(captioner):
    """stats() mean wait divides by requests dispatched, not batches
    (review fix: dividing by batches overstated by the batch size)."""
    b = DynamicBatcher(captioner, max_delay_ms=50.0, autostart=False)
    imgs = _images(4, seed=5)
    tickets = [b.submit(imgs[i]) for i in range(4)]
    b.start()
    for t in tickets:
        t.result(timeout=120.0)
    s = b.stats()
    assert s["batches"] == 1 and s["batch_size_sum"] == 4
    want = round(s["queue_wait_s_sum"] / 4 * 1e3, 2)
    assert s["mean_queue_wait_ms"] == want
    b.close()


def test_abandoned_head_does_not_pull_wrong_mode(captioner):
    """Skipping an abandoned ticket mid-gather must not pull a ticket of
    ANOTHER mode into the batch (review fix: the mode boundary was checked
    on the raw queue head, but the pop skipped abandoned tickets and could
    return a later different-mode ticket — a greedy client then silently
    received a beam caption)."""
    b = DynamicBatcher(captioner, autostart=False, max_delay_ms=5.0)
    imgs = _images(3, seed=6)
    t_beam = b.submit(imgs[0], "beam")
    t_dead = b.submit(imgs[1], "beam")
    t_greedy = b.submit(imgs[2], "greedy")
    with pytest.raises(TimeoutError):
        t_dead.result(timeout=0.01)
    b._running = True  # drive _collect on this thread, no worker
    batch = b._collect()
    assert [t.mode for t in batch] == ["beam"]
    assert batch == [t_beam]
    # the greedy ticket is still queued for the next round, not lost
    assert list(b._q) == [t_greedy]
    b.close()


def test_abandoned_ticket_retry_raises_not_none(captioner):
    """result() retried after a timeout must raise, never return a None
    caption (review fix: the worker set the event on abandoned tickets
    with neither caption nor error)."""
    b = DynamicBatcher(captioner, autostart=False, max_delay_ms=5.0)
    imgs = _images(2, seed=7)
    t_dead = b.submit(imgs[0])
    t_live = b.submit(imgs[1])
    with pytest.raises(TimeoutError):
        t_dead.result(timeout=0.01)
    b.start()
    assert isinstance(t_live.result(timeout=120.0), str)
    with pytest.raises(RuntimeError, match="abandoned"):
        t_dead.result(timeout=5.0)
    b.close()


def test_soak_mixed_modes_abandonment_overload(captioner):
    """Randomized concurrency soak: many client threads submit mixed-mode
    requests with random pacing, some abandon (tiny timeout), the queue is
    small enough to trigger 429s — EVERY ticket must resolve exactly once
    (caption, QueueFull, or timeout; never a hang or a None caption), and
    the batcher's counters must reconcile with the client-side tally."""
    import random
    import time

    b = DynamicBatcher(
        captioner, max_batch=8, max_delay_ms=2.0, max_queue=16
    )
    img = _images(1)[0]
    results = {"ok": 0, "rejected": 0, "timeout": 0, "error": 0}
    lock = threading.Lock()

    def client(seed):
        rng = random.Random(seed)
        for _ in range(12):
            mode = rng.choice(["beam", "greedy", "sample"])
            try:
                t = b.submit(img, mode=mode)
            except Exception:
                with lock:
                    results["rejected"] += 1
                continue
            # ~1 in 4 clients give up almost immediately (abandonment)
            timeout = 0.001 if rng.random() < 0.25 else 60.0
            try:
                cap = t.result(timeout=timeout)
                assert isinstance(cap, str) and cap is not None
                with lock:
                    results["ok"] += 1
            except TimeoutError:
                with lock:
                    results["timeout"] += 1
                # a retry on an abandoned ticket must raise, not hang or
                # return None
                try:
                    t.result(timeout=10.0)
                except (TimeoutError, RuntimeError):
                    pass
            except RuntimeError:
                with lock:
                    results["error"] += 1
            if rng.random() < 0.3:
                time.sleep(rng.random() * 0.004)

    threads = [threading.Thread(target=client, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
        assert not t.is_alive(), "client thread hung"
    total = sum(results.values())
    assert total == 6 * 12, results
    assert results["ok"] > 0, results  # the soak must do real work
    s = b.stats()
    # every accepted request either dispatched in a batch or was dropped as
    # abandoned; rejected ones never entered the queue
    assert s["requests"] == total - results["rejected"]
    assert s["batch_size_sum"] + s["abandoned"] + s["errors"] >= results["ok"]
    assert s["rejected"] == results["rejected"]
    b.close()


def test_latency_percentiles_tracked(captioner):
    """stats()['latency_ms'] windows successful requests only: n counts
    them, the quantiles are ordered, and a failed dispatch stays out."""
    imgs = _images(4, seed=7)
    b = DynamicBatcher(captioner, max_delay_ms=5.0)
    assert b.stats()["latency_ms"] == {
        "n": 0, "p50": None, "p95": None, "p99": None
    }
    for i in range(4):
        b.caption(imgs[i], mode="greedy", timeout=120.0)
    lat = b.stats()["latency_ms"]
    assert lat["n"] == 4
    assert 0 < lat["p50"] <= lat["p95"] <= lat["p99"]
    bad = np.zeros((16, 16, 3), np.uint8)  # wrong spatial shape -> error
    with pytest.raises(RuntimeError, match="caption request failed"):
        b.caption(bad, mode="greedy", timeout=120.0)
    assert b.stats()["latency_ms"]["n"] == 4
    b.close()


def test_submit_validates_image_contract(captioner):
    """Malformed submissions are rejected at submit() — never np.stack'ed
    into a coalesced batch where they would 500 every concurrent request
    (review fix). The stacking invariant is queue-local: a mixed shape is
    rejected only while different-shaped tickets are actually queued."""
    b = DynamicBatcher(captioner, max_delay_ms=50.0, autostart=False)
    with pytest.raises(ValueError, match="uint8 image"):
        b.submit(np.zeros((256, 256, 3), np.float32))  # wrong dtype
    with pytest.raises(ValueError, match="uint8 image"):
        b.submit(np.zeros((256, 256), np.uint8))  # wrong rank
    with pytest.raises(ValueError, match="uint8 image"):
        b.submit(np.zeros((256, 256, 4), np.uint8))  # wrong channels
    b.submit(np.zeros((256, 256, 3), np.uint8))
    with pytest.raises(ValueError, match="mixed shapes"):
        b.submit(np.zeros((16, 16, 3), np.uint8))  # mismatch vs queued
    assert b.stats()["requests"] == 1
    b.close()


def test_abandoned_tickets_do_not_block_queue(captioner):
    """Dead (client-timed-out) tickets are purged from the queue before a
    full-queue rejection: a burst of client timeouts must not 429 fresh,
    serviceable requests (review fix)."""
    b = DynamicBatcher(
        captioner, max_delay_ms=50.0, autostart=False, max_queue=4
    )
    imgs = _images(5, seed=3)
    tickets = [b.submit(imgs[i]) for i in range(4)]
    for t in tickets:
        t.abandoned = True  # simulate result() timeouts
    # queue is "full" of dead tickets; a fresh request must still land
    fresh = b.submit(imgs[4])
    assert b.stats()["abandoned"] == 4
    for t in tickets:  # purged tickets fail loudly, not silently
        with pytest.raises(RuntimeError, match="abandoned"):
            t.result(timeout=0.1)
    b.start()
    assert fresh.result(timeout=120.0) == captioner.caption_images(
        imgs[4:5]
    )[0]
    b.close()


def test_caption_with_attention_empty_batch(captioner):
    """An empty input returns ([], empty alphas) like caption_images([])
    instead of raising from np.concatenate([]) (review fix)."""
    caps, alphas = captioner.caption_with_attention(
        np.zeros((0, 256, 256, 3), np.uint8)
    )
    assert caps == [] and alphas.shape[0] == 0 and alphas.ndim == 3


def test_from_checkpoint_missing_dir_raises(captioner, tmp_path):
    """A passed expr_dir with no model-best checkpoint raises instead of
    silently serving a randomly-initialized decoder (review fix)."""
    from show_and_tell_tpu.config import Config
    from show_and_tell_tpu.utils.vocab import Vocabulary

    cfg = Config(embed_size=16, hidden_size=24, crop_size=32)
    vocab = Vocabulary.from_words(["a", "dog"])
    with pytest.raises(FileNotFoundError, match="model-best"):
        Captioner.from_checkpoint(cfg, str(tmp_path), vocab)
