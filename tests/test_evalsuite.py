"""End-to-end eval driver: loss + decode + dedup + language metrics."""

import json

import jax
import jax.numpy as jnp
import numpy as np

from show_and_tell_tpu.config import Config
from show_and_tell_tpu.evalsuite.driver import evaluation, language_eval, make_trainer_eval_fn
from show_and_tell_tpu.models.registry import build_model
from show_and_tell_tpu.utils.vocab import Vocabulary

V_WORDS = ["a", "man", "rides", "horse", "dog", "runs"]


def _vocab():
    return Vocabulary.from_words(V_WORDS)


def _ann_file(tmp_path, ids):
    anns = {
        "images": [{"id": i} for i in ids],
        "annotations": [
            {"image_id": i, "caption": "a man rides a horse", "id": 10 * i + 1}
            for i in ids
        ]
        + [
            {"image_id": i, "caption": "a dog runs", "id": 10 * i + 2} for i in ids
        ],
    }
    p = tmp_path / "captions_val.json"
    with open(p, "w") as f:
        json.dump(anns, f)
    return str(p)


def _val_loader(n_batches=2, B=4, T=6, L=4):
    vocab = _vocab()
    batches = []
    for bi in range(n_batches):
        caps = [["a", "man", "rides"] for _ in range(B)]
        captions, lengths = vocab.encode_batch(caps, T)
        batches.append(
            {
                "captions": captions,
                "lengths": lengths,
                "imgids": [bi * B + i for i in range(B)],
                "cocoids": [100 + bi * B + i for i in range(B)],
                "features": np.random.default_rng(bi).random((B, L, 512)).astype(np.float32),
            }
        )
    return batches


def test_language_eval_filters_and_scores(tmp_path):
    ann = _ann_file(tmp_path, ids=[100, 101])
    preds = [
        {"image_id": 100, "caption": "a man rides a horse"},
        {"image_id": 101, "caption": "a dog runs"},
        {"image_id": 999, "caption": "not in set"},  # filtered out
    ]
    stats = language_eval(preds, ann)
    for key in ["Bleu_1", "Bleu_4", "METEOR", "ROUGE_L", "CIDEr", "SPICE"]:
        assert key in stats  # full suite incl. SPICE (builtin backend)
    assert stats["Bleu_1"] > 0.9  # exact matches
    assert 0.0 < stats["SPICE"] <= 1.0


def test_evaluation_end_to_end(tmp_path):
    cfg = Config(
        embed_size=16, hidden_size=32, num_layers=1, crop_size=32,
        max_decode_len=5, beam_size=2,
    )
    vocab = _vocab()
    model = build_model(cfg, len(vocab))
    params, frozen = model.init(jax.random.PRNGKey(0))
    loader = _val_loader()
    ann = _ann_file(tmp_path, ids=[100 + i for i in range(8)])

    for mode in ("greedy", "beam"):
        val_loss, preds, stats = evaluation(
            model, cfg, params, None, frozen, loader, vocab,
            mode=mode, ann_file=ann,
        )
        assert np.isfinite(val_loss)
        assert len(preds) == 8  # 2 batches x 4, all unique imgids
        assert len({p["image_id"] for p in preds}) == 8
        for key in ["Bleu_1", "CIDEr"]:
            assert key in stats


def test_evaluation_dedup():
    cfg = Config(embed_size=16, hidden_size=32, crop_size=32, max_decode_len=4)
    vocab = _vocab()
    model = build_model(cfg, len(vocab))
    params, frozen = model.init(jax.random.PRNGKey(0))
    loader = _val_loader(n_batches=1)
    # duplicate the batch's imgids -> only unique survive
    loader[0]["imgids"] = [0, 0, 1, 1]
    _, preds, _ = evaluation(
        model, cfg, params, None, frozen, loader, vocab, run_language_eval=False
    )
    assert len(preds) == 2


def test_trainer_eval_fn_adapter(tmp_path):
    cfg = Config(
        embed_size=16, hidden_size=32, crop_size=32, max_decode_len=4,
        ann_file=_ann_file(tmp_path, ids=[100 + i for i in range(8)]),
    )
    vocab = _vocab()
    model = build_model(cfg, len(vocab))
    params, frozen = model.init(jax.random.PRNGKey(0))
    fn = make_trainer_eval_fn(model, cfg, _val_loader(), vocab)
    val_loss, preds, stats = fn(params, None, frozen)
    assert "CIDEr" in stats
