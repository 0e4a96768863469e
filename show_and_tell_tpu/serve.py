"""High-level captioning API — the serving front door.

The reference has no inference entry point beyond the eval loop; this gives
the one-call path a production user wants::

    captioner = Captioner.from_checkpoint(cfg, "experiment/u/e", vocab)
    captions = captioner.caption_paths(["img1.jpg", "img2.jpg"])

Design: one jitted program per (batch-bucket, decode-mode); inputs are
uint8 images (resized host-side to 256x256 by PIL or pre-batched arrays);
center-crop/normalize/backbone/beam all run on device. Short batches are
padded to the bucket size so every request shape hits a cached compilation.
"""

from __future__ import annotations

import logging
import os
import threading
import time
from collections import deque
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from show_and_tell_tpu import ckpt
from show_and_tell_tpu.config import Config
from show_and_tell_tpu.data.pipeline import _load_image_checked
from show_and_tell_tpu.data.transforms import eval_transform
from show_and_tell_tpu.decode import decode_ids
from show_and_tell_tpu.models.registry import build_model
from show_and_tell_tpu.utils.rng import KeyChain
from show_and_tell_tpu.utils.vocab import Vocabulary

log = logging.getLogger(__name__)

#: caption emitted for a path whose image could not be decoded (see
#: Captioner.caption_paths) — machine-checkable marker, never a real caption
#: (real captions are lowercase vocab words).
ERROR_CAPTION = "<error: image failed to decode>"


class Captioner:
    def __init__(
        self,
        cfg: Config,
        model,
        params,
        frozen,
        vocab: Vocabulary,
        batch_stats=None,
        bucket_sizes: Optional[Sequence[int]] = None,
        mesh=None,
    ):
        """``mesh``: optional ``jax.sharding.Mesh`` for multi-chip serving —
        params/batch_stats are replicated, each request batch is sharded
        over the ``data`` axis, and XLA runs the whole caption program SPMD
        (the serving mirror of the training mesh). Explicit ``bucket_sizes``
        must be divisible by the data-axis size; the default buckets
        (1, 8, 32, 128, 256) are rounded up to multiples of it
        automatically. 256 tops the list from the on-chip batch sweep
        (bench.py): beam-3 throughput at B=256 measures ~22% above B=128
        and ~7% above B=512, so bulk jobs chunk at the measured optimum."""
        self.cfg = cfg
        self.model = model
        self.vocab = vocab
        explicit_buckets = bucket_sizes is not None
        self.bucket_sizes = sorted(bucket_sizes or (1, 8, 32, 128, 256))
        self.mesh = mesh
        if mesh is not None:
            from show_and_tell_tpu.parallel import mesh as mesh_lib

            dp = mesh.shape[mesh_lib.DATA_AXIS]
            bad = [b for b in self.bucket_sizes if b % dp]
            if bad and explicit_buckets:
                raise ValueError(
                    f"bucket sizes {bad} not divisible by the mesh data axis ({dp})"
                )
            if bad:  # adapt the defaults instead of erroring
                self.bucket_sizes = sorted(
                    {-(-b // dp) * dp for b in self.bucket_sizes}
                )
            params = mesh_lib.replicate(mesh, params)
            frozen = mesh_lib.replicate(mesh, frozen)
            if batch_stats is not None:
                batch_stats = mesh_lib.replicate(mesh, batch_stats)
        self.params = params
        self.frozen = frozen
        self.batch_stats = batch_stats
        self._fns: Dict = {}
        # sampling-mode knobs (mode="sample")
        self.temperature = 1.0
        self.top_k = 0
        self.top_p = 1.0  # nucleus mass; 1.0 = off
        self._sample_key = jax.random.PRNGKey(cfg.random_seed)
        self._sample_count = 0  # images sampled so far (rng counter)
        # Serializes the serving entry points (caption_images /
        # caption_with_attention): the DynamicBatcher worker and the HTTP
        # attention endpoint's handler threads may hit one Captioner
        # concurrently, and _fns / frozen / the sample counter are not
        # otherwise safe to mutate from two threads (review fix: a
        # quantization _fns.clear() racing get_fn could 500 a request).
        # RLock because caption_paths calls caption_images.
        self._lock = threading.RLock()
        self._quant_deferred = False  # warmup guard: never calibrate on dummies
        #: (index, path) pairs for images the last caption_paths call could
        #: not decode (their captions are ERROR_CAPTION)
        self.last_errors: List = []

    @classmethod
    def from_checkpoint(
        cls, cfg: Config, expr_dir: Optional[str], vocab: Vocabulary, **kw
    ) -> "Captioner":
        model = build_model(cfg, len(vocab))
        params, frozen = model.init(KeyChain(cfg.random_seed).key("init"))
        if cfg.encoder_weights:
            from show_and_tell_tpu.models.encoders import load_torch_encoder

            frozen = load_torch_encoder(model.encoder_name, cfg.encoder_weights)
        batch_stats = (
            model.init_batch_stats() if hasattr(model, "init_batch_stats") else None
        )
        if cfg.torch_checkpoint:
            # migration path: a reference-trained model-best.pth state_dict
            # (ckpt/torch_import.py) — takes the place of an expr_dir restore
            from show_and_tell_tpu.ckpt.torch_import import apply_reference_checkpoint

            params, batch_stats, frozen, has_enc = apply_reference_checkpoint(
                cfg, params, batch_stats, frozen
            )
            if not has_enc and not cfg.encoder_weights:
                # decoder-only .pth (a separate-module save): same random-
                # frozen-encoder footgun as the expr_dir path below
                log.warning(
                    "%s contains no encoder weights and encoder_weights is "
                    "unset: the frozen encoder is randomly initialized — "
                    "captions will be garbage. Pass the encoder weights the "
                    "checkpoint was trained with.",
                    cfg.torch_checkpoint,
                )
            return cls(cfg, model, params, frozen, vocab, batch_stats, **kw)
        if expr_dir:
            if not cfg.encoder_weights:
                # Checkpoints persist only trainable params + batch stats;
                # a trained decoder over a RANDOM frozen encoder silently
                # produces garbage. One warning here covers every restore
                # path (serve CLI, evaluate CLI, direct API use).
                log.warning(
                    "restoring %s without encoder_weights: the frozen "
                    "encoder is randomly initialized (checkpoints do not "
                    "store it) — pass the encoder weights used in training",
                    expr_dir,
                )
            restored = ckpt.load_best_params(expr_dir, params, batch_stats)
            if restored is None:
                # serving a randomly-initialized decoder is never what a
                # caller passing expr_dir wants — fail loudly instead of
                # emitting garbage captions with zero diagnostics
                raise FileNotFoundError(
                    f"no model-best checkpoint found under {expr_dir!r} — "
                    "train first, or pass expr_dir=None for an untrained "
                    "Captioner"
                )
            params, batch_stats = restored
        return cls(cfg, model, params, frozen, vocab, batch_stats, **kw)

    # ------------------------------------------------------------------

    def _bucket(self, n: int) -> int:
        for b in self.bucket_sizes:
            if n <= b:
                return b
        return self.bucket_sizes[-1]

    def _fn(self, batch: int, mode: str):
        # temperature/top_k/top_p are baked into the traced program (the
        # filters need static shapes), so they are part of the cache key —
        # changing the attributes after a first "sample" call recompiles
        # rather than silently reusing stale values.
        key = (
            (batch, mode, self.temperature, self.top_k, self.top_p)
            if mode == "sample" else (batch, mode)
        )
        if key in self._fns:
            return self._fns[key]
        model, cfg = self.model, self.cfg
        temperature, top_k, top_p = self.temperature, self.top_k, self.top_p

        @jax.jit
        def fn(params, batch_stats, frozen, images_u8, rng):
            feats = model.backbone_features(
                frozen, eval_transform(images_u8, cfg.crop_size)
            )
            return decode_ids(
                model, cfg, params, batch_stats, feats, mode,
                rng=rng, temperature=temperature, top_k=top_k, top_p=top_p,
            )

        self._fns[key] = fn
        return fn

    # ------------------------------------------------------------------

    def warmup(
        self,
        modes: Sequence[str] = ("beam",),
        buckets: Optional[Sequence[int]] = None,
        calib_images: Optional[np.ndarray] = None,
    ) -> float:
        """Pre-compile + pre-calibrate the serving programs so the first
        real request pays none of it (a TPU compile is 20-60 s — far above
        any sane request timeout). Runs one dummy batch per
        (bucket, mode); default buckets = ALL serving buckets — under a
        DynamicBatcher a coalesced batch can hit any of them, and a
        mid-size cold compile would stall every ticket behind it (review
        fix: smallest+largest left 8/32/128 cold). Besides the decode
        modes ("beam"/"greedy"/"sample"), ``modes`` accepts the
        interactive surfaces ``"nbest"`` and ``"attention"`` — otherwise
        their first request cold-compiles while HOLDING the Captioner
        lock, stalling every batched request behind it (review fix).
        Returns seconds spent.

        int8 (``quantize_backbone``): calibration statistics must come
        from REAL images — calibrating on warmup's zero dummies would clip
        every real activation (review fix). So warmup calibrates only when
        it has a trustworthy source: ``calib_images`` ([N,256,256,3] uint8
        sample of production traffic), or a persisted calibration at
        ``cfg.quantized_backbone_path``. Otherwise it warns, warms the f32
        programs, and defers calibration (and the quantized recompile) to
        the first real batch."""
        t0 = time.perf_counter()
        buckets = sorted(set(buckets)) if buckets else list(self.bucket_sizes)
        from show_and_tell_tpu.models import quantize as quantize_mod

        with self._lock:  # warmup mutates frozen/_fns/_quant_deferred too
            quant_pending = (
                getattr(self.cfg, "quantize_backbone", False)
                and self.model.encoder_name in quantize_mod.QUANTIZABLE_ENCODERS
                and not quantize_mod.is_quantized(self.frozen)
            )
            if quant_pending:
                path = getattr(self.cfg, "quantized_backbone_path", None)
                if calib_images is not None:
                    self._ensure_quantized(calib_images)
                elif not (path and os.path.exists(path)):
                    log.warning(
                        "warmup without calib_images and no persisted "
                        "calibration at quantized_backbone_path: int8 "
                        "calibration is deferred to the first real batch "
                        "(which will pay the quantized recompile) — pass "
                        "calib_images=<sample of real traffic> to move "
                        "that cost here. Warming the f32 programs only."
                    )
                    self._quant_deferred = True
            dummy = np.zeros((buckets[-1], 256, 256, 3), np.uint8)
            count_before = self._sample_count
            try:
                for mode in modes:
                    for b in buckets:
                        if mode == "nbest":
                            self.caption_nbest(dummy[:b])
                        elif mode == "attention":
                            self.caption_with_attention(dummy[:b])
                        else:
                            self.caption_images(dummy[:b], mode=mode)
            finally:
                self._quant_deferred = False
                # dummy sample calls must not shift the live rng sequence
                self._sample_count = count_before
        return time.perf_counter() - t0

    def _ensure_quantized(self, images_u8) -> None:
        """int8 PTQ (models/quantize.py): calibrate activation scales on
        the given batch (or load a persisted tree), quantize once, and let
        backbone_features dispatch to the int8 trunk from then on. During
        warmup's dummy batches ``_quant_deferred`` defers this to real
        traffic — the guard lives HERE so every serving surface
        (caption_images / caption_nbest) honors it."""
        from show_and_tell_tpu.models import quantize as quantize_mod

        if self._quant_deferred:
            return
        if not (
            getattr(self.cfg, "quantize_backbone", False)
            and self.model.encoder_name in quantize_mod.QUANTIZABLE_ENCODERS
            and not quantize_mod.is_quantized(self.frozen)
        ):
            return
        calib = eval_transform(
            jnp.asarray(images_u8[: min(32, images_u8.shape[0])]),
            self.cfg.crop_size,
        )
        frozen_q = quantize_mod.obtain_quantized(
            self.model.encoder_name, self.frozen, calib,
            path=getattr(self.cfg, "quantized_backbone_path", None),
        )
        if self.mesh is not None:
            from show_and_tell_tpu.parallel import mesh as mesh_lib

            frozen_q = mesh_lib.replicate(self.mesh, frozen_q)
        self.frozen = frozen_q
        self._fns.clear()  # cached programs closed over the f32 tree type

    def caption_images(
        self, images_u8: np.ndarray, mode: str = "beam", rng_offset: int = 0
    ) -> List[str]:
        """images_u8 [N, 256, 256, 3] uint8 -> N caption strings.

        ``mode``: "beam" (default), "greedy", or "sample" (knobs via the
        ``temperature`` / ``top_k`` / ``top_p`` attributes).

        Sample-mode rng: one key per CHUNK, derived as
        ``fold_in(seed_key, images_sampled_so_far + rng_offset + chunk_start)``
        where ``chunk_start`` is the chunk's offset within this call. Rows
        within a chunk draw independent noise from that one key (the
        batched ``jax.random.categorical`` generates per-row Gumbel noise),
        so duplicate images in a chunk still sample different captions.
        The running counter advances per sampled image, so repeated
        requests draw DIFFERENT keys (review fix: a 'sample' endpoint that
        returns the identical caption forever defeats the point), while a
        fresh Captioner with the same ``random_seed`` replays the same
        sequence — bit-identically only when the calls' chunk boundaries
        also match, since keys are per-chunk. ``rng_offset`` is for a
        caller that REBUILT the Captioner (counter reset to zero) and
        wants to continue a global sequence; on a live Captioner the
        counter already advances, so passing an offset on top would
        double-count."""
        with self._lock:
            return self._caption_images(images_u8, mode, rng_offset)

    def _caption_images(
        self, images_u8: np.ndarray, mode: str, rng_offset: int
    ) -> List[str]:
        n = images_u8.shape[0]
        self._ensure_quantized(images_u8)
        out: List[str] = []
        # One-batch-lag pipeline: dispatch chunk i, then fetch + id->string
        # decode chunk i-1 while the device works on i (the double-buffered
        # loop bench.py measures; a per-chunk sync serializes a host round
        # trip into every batch).
        pending = None  # (device ids, live row count)
        base = self._sample_count
        if mode == "sample":
            self._sample_count += n
        i = 0
        while i < n:
            b = self._bucket(n - i)
            chunk = images_u8[i : i + b]
            if chunk.shape[0] < b:  # pad to the bucket's static shape
                pad = np.repeat(chunk[-1:], b - chunk.shape[0], axis=0)
                chunk = np.concatenate([chunk, pad], axis=0)
            rng = jax.random.fold_in(self._sample_key, base + rng_offset + i)
            if self.mesh is not None:
                from show_and_tell_tpu.parallel import mesh as mesh_lib

                chunk = mesh_lib.shard_batch(self.mesh, {"images": chunk})["images"]
            ids_d = self._fn(b, mode)(
                self.params, self.batch_stats, self.frozen, chunk, rng
            )
            if pending is not None:
                # slice to live rows BEFORE the id->string decode: a tail
                # chunk of 1 live row padded to a 256 bucket must not
                # string-decode 255 dead rows (review fix)
                out.extend(
                    self.vocab.decode_batch(np.asarray(pending[0])[: pending[1]])
                )
            pending = (ids_d, min(b, n - i))
            i += b
        if pending is not None:
            out.extend(
                self.vocab.decode_batch(np.asarray(pending[0])[: pending[1]])
            )
        return out

    def caption_nbest(
        self, images_u8: np.ndarray
    ) -> List[List[Tuple[str, float]]]:
        """Beam n-best: per image, ``beam_size`` (caption, score) pairs
        sorted best-first (score = length-normalized log-prob, the beam
        ranking key). The decode stack always computes the full beam set
        (decode/beam.py ``return_all``); this surfaces it — rerankers and
        "show alternatives" UIs need more than the argmax caption."""
        with self._lock:
            return self._caption_nbest(images_u8)

    def _caption_nbest(self, images_u8: np.ndarray):
        self._ensure_quantized(images_u8)
        model, cfg = self.model, self.cfg
        n = images_u8.shape[0]

        def get_fn(batch: int):
            key = (batch, "nbest")
            if key not in self._fns:
                from show_and_tell_tpu.decode.beam import beam_search

                @jax.jit
                def fn(params, batch_stats, frozen, images_u8):
                    feats = model.backbone_features(
                        frozen, eval_transform(images_u8, cfg.crop_size)
                    )
                    step_fn, carry, first, tile = model.decode_state(
                        params, batch_stats, feats, beam_size=cfg.beam_size
                    )
                    return beam_search(
                        step_fn, carry, feats.shape[0],
                        beam_size=cfg.beam_size, max_len=cfg.max_decode_len,
                        first_logits=first, tile=tile,
                        length_penalty=cfg.length_penalty, return_all=True,
                    )

                self._fns[key] = fn
            return self._fns[key]

        out: List[List[Tuple[str, float]]] = []
        i = 0
        while i < n:
            b = self._bucket(n - i)
            chunk = images_u8[i : i + b]
            live = chunk.shape[0]
            if live < b:
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], b - live, axis=0)], axis=0
                )
            if self.mesh is not None:  # SPMD serving: shard the data axis
                from show_and_tell_tpu.parallel import mesh as mesh_lib

                chunk = mesh_lib.shard_batch(self.mesh, {"images": chunk})["images"]
            ids_d, scores_d = get_fn(b)(
                self.params, self.batch_stats, self.frozen, chunk
            )
            ids = np.asarray(ids_d)[:live]  # [live, k, T]
            scores = np.asarray(scores_d, np.float32)[:live]  # [live, k]
            for r in range(live):
                caps = self.vocab.decode_batch(ids[r])
                out.append(
                    [(c, float(s)) for c, s in zip(caps, scores[r])]
                )
            i += b
        return out

    def caption_with_attention(
        self, images_u8: np.ndarray
    ) -> Tuple[List[str], np.ndarray]:
        """Greedy captions + per-step attention maps — the
        Show-Attend-Tell hallmark figure (``utils/visualize`` renders the
        overlay contact sheets).

        images_u8 [N, 256, 256, 3] -> (captions, alphas [N, T, L]) with
        T = ``max_decode_len`` and L the patch-grid size (196 for 224px
        crops). Greedy by definition (the paper's figure); raises for
        models without attention (ShowTell)."""
        with self._lock:
            return self._caption_with_attention(images_u8)

    def _caption_with_attention(
        self, images_u8: np.ndarray
    ) -> Tuple[List[str], np.ndarray]:
        if not hasattr(self.model, "greedy_with_attention"):
            raise ValueError(
                f"model {self.cfg.model!r} exposes no attention maps "
                "(only show_attend_tell does)"
            )
        model, cfg = self.model, self.cfg
        n = images_u8.shape[0]
        if n == 0:  # mirror caption_images([]) -> [] (review fix: the
            # chunk loop never ran and np.concatenate([]) raised)
            grid = (cfg.crop_size // 16) ** 2  # VGG conv5 stride-16 grid
            return [], np.zeros((0, cfg.max_decode_len, grid), np.float32)
        # int8 trunk swap BEFORE tracing, like every other serving surface
        # (review fix: attention-only traffic had run — and compiled — the
        # f32 trunk, then paid a mid-flight recompile once caption_images
        # quantized and cleared the fn cache)
        self._ensure_quantized(images_u8)

        def get_fn(batch: int):
            key = (batch, "attention")
            if key not in self._fns:

                @jax.jit
                def fn(params, frozen, images_u8):
                    feats = model.backbone_features(
                        frozen, eval_transform(images_u8, cfg.crop_size)
                    )
                    return model.greedy_with_attention(
                        params, feats, max_len=cfg.max_decode_len
                    )

                self._fns[key] = fn
            return self._fns[key]

        caps: List[str] = []
        alphas: List[np.ndarray] = []
        i = 0
        while i < n:
            b = self._bucket(n - i)
            chunk = images_u8[i : i + b]
            live = chunk.shape[0]
            if live < b:
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], b - live, axis=0)], axis=0
                )
            if self.mesh is not None:  # SPMD serving: shard the data axis
                from show_and_tell_tpu.parallel import mesh as mesh_lib

                chunk = mesh_lib.shard_batch(self.mesh, {"images": chunk})["images"]
            ids_d, alphas_d = get_fn(b)(self.params, self.frozen, chunk)
            caps.extend(self.vocab.decode_batch(np.asarray(ids_d)[:live]))
            alphas.append(np.asarray(alphas_d, np.float32)[:live])
            i += b
        return caps, np.concatenate(alphas, axis=0)

    def caption_paths(self, paths: Sequence[str], mode: str = "beam") -> List[str]:
        """Caption image files. A corrupt/unreadable file never kills the
        batch: its slot decodes as zeros, its caption comes back as
        :data:`ERROR_CAPTION`, and ``(index, path)`` is recorded in
        ``last_errors`` (reset per call) for caller-side reporting."""
        # Load + caption in bucket-sized chunks: materializing every image
        # up front costs ~200KB each (a 100k-image directory would need
        # ~20GB host RAM before the first batch even dispatches), while the
        # Captioner only ever consumes one bucket at a time.
        chunk = max(self.bucket_sizes)
        out: List[str] = []
        self.last_errors = []
        for i in range(0, len(paths), chunk):
            loaded = [_load_image_checked(p) for p in paths[i : i + chunk]]
            images = np.stack([im for im, _ in loaded])
            # sample-mode keys stay unique and whole-call-equivalent across
            # chunks via the _sample_count counter (no explicit offset: the
            # counter already advanced by exactly i after the prior chunks)
            caps = self.caption_images(images, mode)
            for j, (_, ok) in enumerate(loaded):
                if not ok:
                    caps[j] = ERROR_CAPTION
                    self.last_errors.append((i + j, paths[i + j]))
            out.extend(caps)
        return out


# ----------------------------------------------------------------------
# Dynamic batching: coalesce concurrent single-image requests into one
# device batch. The reference has no serving story at all; a naive HTTP
# front end runs one device program per request (batch=1), wasting the
# chip. The batcher is the standard production fix: requests queue, a
# single consumer thread drains up to ``max_batch`` same-mode requests
# (waiting at most ``max_delay_ms`` after the first), and one bucketed
# Captioner call serves them all. One consumer thread also makes the
# (non-thread-safe) Captioner safe under a threaded server.


class QueueFull(RuntimeError):
    """DynamicBatcher queue is at max_queue: shed load (HTTP 429)."""


class _Ticket:
    """One in-flight request: filled in by the batcher worker."""

    __slots__ = (
        "image", "mode", "event", "caption", "error", "t_submit", "abandoned"
    )

    def __init__(self, image, mode: str):
        self.image = image
        self.mode = mode
        self.event = threading.Event()
        self.caption: Optional[str] = None
        self.error: Optional[BaseException] = None
        self.t_submit = time.perf_counter()
        self.abandoned = False  # client gave up (result() timed out)

    def result(self, timeout: Optional[float] = None) -> str:
        if not self.event.wait(timeout):
            # mark so the worker skips this ticket instead of burning a
            # device slot on a caption nobody will read (review fix)
            self.abandoned = True
            raise TimeoutError("caption request timed out")
        if self.error is not None:
            raise RuntimeError(f"caption request failed: {self.error}") from self.error
        return self.caption


class DynamicBatcher:
    """Thread-safe request coalescer over a :class:`Captioner`.

    - ``submit(image_u8, mode)`` -> ticket (non-blocking); ``caption(...)``
      is submit + wait.
    - Batches are FIFO runs of same-mode requests: the worker pops the
      head, then keeps appending queued same-mode requests until
      ``max_batch`` or ``max_delay_ms`` after the pop; a different mode at
      the head closes the batch (dispatched next round — order preserved).
    - ``stats()`` reports requests/batches/mean batch size/queue wait,
      plus end-to-end request latency percentiles (p50/p95/p99 over a
      sliding window of recent requests) — the numbers a capacity
      planner needs.
    - All device work happens on the one worker thread, so any number of
      front-end threads may call ``submit``/``caption`` concurrently.
    """

    def __init__(
        self,
        captioner: Captioner,
        max_batch: Optional[int] = None,
        max_delay_ms: float = 10.0,
        autostart: bool = True,
        max_queue: Optional[int] = None,
    ):
        self.captioner = captioner
        self.max_batch = max_batch or max(captioner.bucket_sizes)
        self.max_delay_s = max_delay_ms / 1e3
        # backpressure: past this depth submit() raises QueueFull (the HTTP
        # layer maps it to 429) instead of queueing requests whose clients
        # will have timed out long before the device reaches them
        self.max_queue = self.max_batch * 8 if max_queue is None else max_queue
        self._q: deque = deque()
        self._cv = threading.Condition()
        self._running = False
        self._closed = False
        self._worker: Optional[threading.Thread] = None
        self._stats = {
            "requests": 0, "batches": 0, "batch_size_sum": 0,
            "queue_wait_s_sum": 0.0, "errors": 0, "rejected": 0,
            "abandoned": 0,
        }
        # submit->completion seconds for the most recent successfully
        # served requests; sized so p99 is stable yet the window tracks
        # load shifts (2048 requests ≈ a few seconds at headline rates)
        self._latencies: deque = deque(maxlen=2048)
        self._mode_counts = {"beam": 0, "greedy": 0, "sample": 0}
        if autostart:
            self.start()

    def start(self) -> None:
        with self._cv:
            if self._closed:
                raise RuntimeError("batcher is closed")
            if self._running:
                return
            self._running = True
        self._worker = threading.Thread(
            target=self._run, name="caption-batcher", daemon=True
        )
        self._worker.start()

    def close(self, timeout: float = 30.0) -> None:
        """Stop the worker; pending tickets fail with a closed error."""
        with self._cv:
            self._running = False
            self._closed = True
            self._cv.notify_all()
        if self._worker is not None:
            self._worker.join(timeout)
        with self._cv:
            while self._q:
                t = self._q.popleft()
                t.error = RuntimeError("batcher closed")
                t.event.set()

    def submit(self, image_u8, mode: str = "beam") -> _Ticket:
        if mode not in ("beam", "greedy", "sample"):
            raise ValueError(f"unknown mode {mode!r}")
        # reject malformed images HERE: tickets are np.stack'ed into one
        # coalesced batch, so a wrong-shape/dtype submission accepted now
        # could error the whole batch and 500 every innocent concurrent
        # request in it (review fix). The stacking invariant is
        # queue-local: a ticket must match the tickets it can be
        # coalesced with (the queue tail), not some global shape — a
        # lone odd-shaped request still reaches the model and fails
        # alone, without collateral damage.
        image_u8 = np.asarray(image_u8)
        if image_u8.ndim != 3 or image_u8.shape[-1] != 3 or (
            image_u8.dtype != np.uint8
        ):
            raise ValueError(
                "submit() expects one [H, W, 3] uint8 image, got "
                f"shape {image_u8.shape} dtype {image_u8.dtype}"
            )
        ticket = _Ticket(image_u8, mode)
        with self._cv:
            if self._closed:
                raise RuntimeError("batcher is closed")
            if len(self._q) >= self.max_queue:
                # a burst of client timeouts leaves dead tickets in the
                # queue; they cost no device work, so purge them before
                # shedding load (review fix: spurious 429s)
                dead = [t for t in self._q if t.abandoned]
                if dead:
                    self._stats["abandoned"] += len(dead)
                    for t in dead:
                        t.error = TimeoutError(
                            "abandoned: client result() timed out before "
                            "dispatch"
                        )
                        t.event.set()
                    self._q = deque(
                        t for t in self._q if not t.abandoned
                    )
            if len(self._q) >= self.max_queue:
                self._stats["rejected"] += 1
                raise QueueFull(
                    f"caption queue full ({self.max_queue} pending)"
                )
            if self._q and self._q[-1].image.shape != image_u8.shape:
                raise ValueError(
                    f"submit() image shape {image_u8.shape} does not "
                    f"match the queued requests' {self._q[-1].image.shape}"
                    " — mixed shapes cannot be coalesced into one batch"
                )
            self._q.append(ticket)
            self._stats["requests"] += 1
            self._mode_counts[mode] += 1
            self._cv.notify()
        return ticket

    def caption(
        self, image_u8, mode: str = "beam", timeout: Optional[float] = 120.0
    ) -> str:
        return self.submit(image_u8, mode).result(timeout)

    def stats(self) -> dict:
        with self._cv:
            s = dict(self._stats)
            s["requests_by_mode"] = dict(self._mode_counts)
        s["mean_batch_size"] = round(
            s["batch_size_sum"] / max(s["batches"], 1), 2
        )
        # per-REQUEST mean: the wait sum is accumulated per ticket, so the
        # divisor is tickets dispatched, not batches (review fix — dividing
        # by batches overstated the wait by a factor of the batch size)
        s["mean_queue_wait_ms"] = round(
            s["queue_wait_s_sum"] / max(s["batch_size_sum"], 1) * 1e3, 2
        )
        s["latency_ms"] = self._latency_percentiles()
        return s

    def _latency_percentiles(self) -> dict:
        """p50/p95/p99 end-to-end (submit -> caption ready) over the
        sliding window — computed on demand so the hot path only appends."""
        with self._cv:
            window = list(self._latencies)
        if not window:
            return {"n": 0, "p50": None, "p95": None, "p99": None}
        q = np.percentile(np.asarray(window, np.float64), [50, 95, 99])
        return {
            "n": len(window),
            "p50": round(float(q[0]) * 1e3, 2),
            "p95": round(float(q[1]) * 1e3, 2),
            "p99": round(float(q[2]) * 1e3, 2),
        }

    # -- worker ---------------------------------------------------------

    def _collect(self) -> List[_Ticket]:
        """Block for the first request, then gather its same-mode run."""
        def pop_live(mode: Optional[str] = None) -> Optional[_Ticket]:
            # drop tickets whose client already timed out: dispatching them
            # would spend device time on output nobody reads. With ``mode``
            # set, a live ticket of ANOTHER mode is pushed back and None
            # returned — the mode check must come AFTER the abandoned-skip,
            # or skipping an abandoned head can pull a different-mode
            # ticket into the batch (review fix: a greedy client would
            # silently receive a beam caption)
            while self._q:
                t = self._q.popleft()
                if t.abandoned:
                    self._stats["abandoned"] += 1
                    t.error = TimeoutError(
                        "abandoned: client result() timed out before dispatch"
                    )
                    t.event.set()
                    continue
                if mode is not None and t.mode != mode:
                    self._q.appendleft(t)
                    return None
                return t
            return None

        with self._cv:
            batch: List[_Ticket] = []
            while self._running and not batch:
                head = pop_live()
                if head is not None:
                    batch.append(head)
                    break
                if not self._q:
                    self._cv.wait()
            if not self._running:
                return []
            deadline = time.perf_counter() + self.max_delay_s
            while len(batch) < self.max_batch and self._running:
                if self._q:
                    t = pop_live(batch[0].mode)
                    if t is not None:
                        batch.append(t)
                        continue
                    if self._q:
                        break  # live different-mode head: next round
                    continue  # drained abandoned tickets: re-check/wait
                remaining = deadline - time.perf_counter()
                if remaining <= 0 or not self._cv.wait(remaining):
                    break
            return batch

    def _run(self) -> None:
        while True:
            batch = self._collect()
            if not batch:
                return  # closed
            live = [t for t in batch if not t.abandoned]
            if len(live) < len(batch):  # abandoned while the batch formed
                with self._cv:
                    self._stats["abandoned"] += len(batch) - len(live)
                for t in batch:
                    if t.abandoned:
                        # a retry of result() on this ticket must raise,
                        # not return a None caption (review fix)
                        t.error = TimeoutError(
                            "abandoned: client result() timed out before dispatch"
                        )
                        t.event.set()
                if not live:
                    continue
                batch = live
            t_dispatch = time.perf_counter()
            try:
                images = np.stack([t.image for t in batch])
                caps = self.captioner.caption_images(images, mode=batch[0].mode)
                for t, c in zip(batch, caps):
                    t.caption = c
            except Exception as e:  # one bad batch must not kill the worker
                log.exception("batcher dispatch failed (%d requests)", len(batch))
                for t in batch:
                    t.error = e
                with self._cv:
                    self._stats["errors"] += len(batch)
            finally:
                t_done = time.perf_counter()
                with self._cv:
                    self._stats["batches"] += 1
                    self._stats["batch_size_sum"] += len(batch)
                    self._stats["queue_wait_s_sum"] += sum(
                        t_dispatch - t.t_submit for t in batch
                    )
                    for t in batch:
                        if t.error is None:
                            self._latencies.append(t_done - t.t_submit)
                for t in batch:
                    t.event.set()
