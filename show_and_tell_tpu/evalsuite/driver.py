"""Evaluation driver — the ``eval.py`` layer of the reference, rebuilt.

``evaluation`` (reference eval.py:58-122): loop over the validation loader,
accumulate teacher-forced loss, decode captions (greedy like the reference's
``model.sample``, or batched beam search — the capability the reference stubs
at model2.py:113-114), convert ids to words truncating at ``<end>``
(eval.py:101-111), de-duplicate per image (eval.py:112-118), then run
``language_eval``.

``language_eval`` (reference eval.py:17-56): filter predictions to ids in
the annotation set, build a result index, and run the COCOEvalCap-equivalent
orchestrator. The annotation path comes from config (``cfg.ann_file``) rather
than a hardcoded home-directory path (eval.py:20). Predictions are keyed by
**cocoid**, so the filter genuinely matches the COCO annotation ids (the
reference keys by Karpathy imgid and silently drops most predictions at the
filter — a bug documented in SURVEY.md §7 rather than reproduced).

Decoding is fully jitted: one compiled program per (model, decode-mode,
batch-shape), reused across batches and eval calls.
"""

from __future__ import annotations

import logging
from typing import Callable, Dict, List, Optional, Tuple

import jax
import numpy as np

from show_and_tell_tpu.config import Config
from show_and_tell_tpu.data.transforms import eval_transform
from show_and_tell_tpu.decode import decode_ids
from show_and_tell_tpu.metrics.coco import COCO
from show_and_tell_tpu.metrics.orchestrator import COCOEvalCap
from show_and_tell_tpu.train.step import make_eval_loss_step
from show_and_tell_tpu.utils.vocab import Vocabulary

log = logging.getLogger(__name__)


_warned_no_ann = False  # one warning per process, not per periodic eval


def language_eval(
    predictions: List[Dict], ann_file: str
) -> Dict[str, float]:
    """predictions: [{'image_id': cocoid, 'caption': str}, ...]."""
    coco = COCO(ann_file)
    valids = set(coco.getImgIds())
    preds_filt = [p for p in predictions if p["image_id"] in valids]
    log.info("using %d/%d predictions", len(preds_filt), len(predictions))
    if not preds_filt:
        return {}
    coco_res = coco.loadRes(preds_filt)
    coco_eval = COCOEvalCap(coco, coco_res)
    coco_eval.params["image_id"] = coco_res.getImgIds()
    return coco_eval.evaluate()


def make_caption_fn(
    model,
    cfg: Config,
    mode: str = "greedy",
) -> Callable:
    """Returns jitted ``fn(params, batch_stats, features) -> ids [B, L]``
    (``mode='sample'`` adds a required trailing ``rng`` argument — the
    evaluation loop folds a per-batch key; review fix: the rng was
    silently dropped and sample-mode eval crashed at trace time)."""

    if mode == "sample":

        @jax.jit
        def fn(params, batch_stats, features, rng):
            return decode_ids(
                model, cfg, params, batch_stats, features, mode, rng=rng
            )

        return fn

    @jax.jit
    def fn(params, batch_stats, features):
        return decode_ids(model, cfg, params, batch_stats, features, mode)

    return fn


def evaluation(
    model,
    cfg: Config,
    params,
    batch_stats,
    frozen,
    validloader,
    vocab: Vocabulary,
    mode: str = "greedy",
    ann_file: Optional[str] = None,
    run_language_eval: Optional[bool] = None,
    _fns=None,  # (loss_step, caption_fn, encode_images) reused across calls
) -> Tuple[float, List[Dict], Dict]:
    """Returns ``(val_loss, predictions, lang_stats)`` (eval.py:58-122).

    ``_fns`` lets periodic callers (the Trainer's checkpoint eval) reuse the
    jitted programs — a fresh closure per call would miss jax.jit's cache
    and recompile at every checkpoint. Use :func:`make_eval_fns` /
    :func:`make_trainer_eval_fn`.
    """
    loss_step, caption_fn, encode_images = _fns or make_eval_fns(model, cfg, mode)

    if run_language_eval is None:
        run_language_eval = cfg.language_eval == 1

    loss_sum, loss_evals = 0.0, 0
    predictions: List[Dict] = []
    seen = set()

    def collect(loss_d, ids_d, imgids, cocoids):
        nonlocal loss_sum, loss_evals
        loss_sum += float(loss_d)
        loss_evals += 1
        sentences = vocab.decode_batch(np.asarray(ids_d))
        for i, sentence in enumerate(sentences):
            imgid = imgids[i]
            if imgid in seen:  # dedup (eval.py:112-118)
                continue
            seen.add(imgid)
            predictions.append({"image_id": cocoids[i], "caption": sentence})

    # One-batch-lag pipeline (the serving loop's pattern): dispatch batch
    # i's encode/loss/decode, then fetch + host-process batch i-1 while the
    # device works — the id->string decode and the result transfers overlap
    # compute instead of serializing a host round-trip into every batch.
    sample_key = (
        jax.random.PRNGKey(cfg.random_seed) if mode == "sample" else None
    )
    inflight = None
    for bi, batch in enumerate(validloader):
        dbatch = {
            "captions": batch["captions"],
            "lengths": batch["lengths"],
        }
        if "features" in batch:
            dbatch["features"] = batch["features"]
        else:
            dbatch["features"] = encode_images(frozen, batch["images"])
        loss_d, _ = loss_step(params, batch_stats, frozen, dbatch)
        if sample_key is not None:
            ids_d = caption_fn(
                params, batch_stats, dbatch["features"],
                jax.random.fold_in(sample_key, bi),
            )
        else:
            ids_d = caption_fn(params, batch_stats, dbatch["features"])
        if inflight is not None:
            collect(*inflight)
        inflight = (loss_d, ids_d, batch["imgids"], batch["cocoids"])
    if inflight is not None:
        collect(*inflight)

    lang_stats: Dict = {}
    if run_language_eval and ann_file:
        lang_stats = language_eval(predictions, ann_file)
    elif run_language_eval:
        # language_eval==1 with no annotation file would otherwise SILENTLY
        # switch the best-checkpoint gate from CIDEr to -val_loss (review
        # fix): say so once, loudly.
        global _warned_no_ann
        if not _warned_no_ann:
            _warned_no_ann = True
            log.warning(
                "language_eval=1 but ann_file is unset: language metrics "
                "are skipped and the best-checkpoint gate falls back to "
                "-val_loss. Pass Config.ann_file (a COCO-format annotation "
                "JSON) to gate on CIDEr as configured."
            )
    return loss_sum / max(loss_evals, 1), predictions, lang_stats


def make_eval_fns(model, cfg: Config, mode: str = "greedy"):
    """Build the three jitted eval programs once (loss, captioning, image
    encode) so repeated evaluations hit the compilation cache."""
    loss_step = make_eval_loss_step(model, cfg)
    caption_fn = make_caption_fn(model, cfg, mode)

    @jax.jit
    def encode_images(frozen, images_u8):
        # CenterCrop + Normalize on device (main.py:32-36), then backbone.
        return model.backbone_features(
            frozen, eval_transform(images_u8, cfg.crop_size)
        )

    return loss_step, caption_fn, encode_images


def make_trainer_eval_fn(
    model, cfg: Config, validloader, vocab: Vocabulary, mode: str = "greedy"
) -> Callable:
    """Adapter producing the ``eval_fn`` the Trainer consumes
    (train.py:157-159 call shape). Jitted programs are built once here and
    reused for every checkpoint evaluation."""
    fns = make_eval_fns(model, cfg, mode)

    def eval_fn(params, batch_stats, frozen):
        return evaluation(
            model, cfg, params, batch_stats, frozen, validloader, vocab,
            mode=mode, ann_file=cfg.ann_file, _fns=fns,
        )

    return eval_fn
