"""One end-to-end integration run (VERDICT round-1 gap #5 / reference
train.py:156-196 + eval.py:17-56 as a single loop):

synthetic-but-learnable dataset -> cli.main (preprocess'd records, loaders,
Trainer) -> periodic eval_fn -> language_eval against a real annotation JSON
-> CIDEr-gated best checkpoint -> reload via Captioner -> beam decode.

The dataset is learnable: each image is a solid color (+noise) and its
caption names that color ("a red ball"), so the frozen random backbone
separates the classes and CIDEr genuinely improves across checkpoints.
"""

import json
import os

import numpy as np
import pytest

COLORS = {
    "red": (200, 30, 30),
    "green": (30, 200, 30),
    "blue": (30, 30, 200),
    "yellow": (220, 220, 30),
    "purple": (160, 30, 200),
    "white": (230, 230, 230),
}


def _build_dataset(workdir):
    from PIL import Image

    os.makedirs(f"{workdir}/imgs", exist_ok=True)
    rng = np.random.default_rng(0)
    names = list(COLORS)
    images = []
    n_train_per_color, n_val_per_color = 6, 2
    i = 0
    for split, per_color in (("train", n_train_per_color), ("val", n_val_per_color)):
        for color in names:
            for _ in range(per_color):
                fname = f"img{i}.png"
                base = np.array(COLORS[color], np.float32)
                arr = base[None, None, :] + rng.normal(0, 12, (64, 64, 3))
                Image.fromarray(
                    np.clip(arr, 0, 255).astype(np.uint8)
                ).resize((256, 256)).save(f"{workdir}/imgs/{fname}")
                caption = ["a", color, "ball"]
                images.append(
                    {
                        "split": split,
                        "imgid": i,
                        "cocoid": 1000 + i,
                        "filepath": "",
                        "filename": fname,
                        "sentences": [{"tokens": caption}, {"tokens": caption}],
                        "sentids": [2 * i, 2 * i + 1],
                    }
                )
                i += 1
    with open(f"{workdir}/captions.json", "w") as f:
        json.dump({"images": images}, f)
    val = [im for im in images if im["split"] == "val"]
    with open(f"{workdir}/ann_val.json", "w") as f:
        json.dump(
            {
                "images": [{"id": im["cocoid"]} for im in val],
                "annotations": [
                    {
                        "image_id": im["cocoid"],
                        "caption": " ".join(s["tokens"]),
                        "id": 100 * im["imgid"] + j,
                    }
                    for im in val
                    for j, s in enumerate(im["sentences"])
                ],
            },
            f,
        )
    return images


def test_full_training_loop_cider_gate_and_serving(tmp_path):
    workdir = str(tmp_path)
    _build_dataset(workdir)

    from show_and_tell_tpu.config import Config
    from show_and_tell_tpu.data.preprocess import preprocess
    from show_and_tell_tpu.cli.main import main as train_main
    from show_and_tell_tpu.serve import Captioner
    from show_and_tell_tpu.utils.vocab import Vocabulary
    from show_and_tell_tpu import ckpt

    cfg = Config(
        caption_json=f"{workdir}/captions.json",
        images_root=f"{workdir}/imgs",
        vocab_path=f"{workdir}/vocab.json",
        output_json=f"{workdir}/data.json",
        word_count_threshold=1,
        print_stats=False,
    )
    preprocess(cfg, resize_images=True, data_root=f"{workdir}/resized")

    cfg = cfg.replace(
        data_json=f"{workdir}/data.json",
        ann_file=f"{workdir}/ann_val.json",
        expr_dir=f"{workdir}/exp",
        batch_size=6,
        num_devices=2,  # data-parallel over 2 of the venv's virtual devices
        max_epochs=16,
        save_checkpoint_every=12,  # eval/checkpoint twice per 6-step epoch... every 2 epochs
        learning_rate=5e-3,
        embed_size=24,
        hidden_size=48,
        crop_size=32,
        num_buckets=1,
        num_workers=2,
        beam_size=3,
        max_decode_len=5,
        language_eval=1,
        log_step=50,
    )
    train_main(cfg)

    expr = f"{workdir}/exp/default/showattendtell"
    infos = ckpt.load_infos(expr)
    assert infos, "training must have produced infos"
    hist = infos["val_result_history"]
    iters = sorted(hist, key=int)
    assert len(iters) >= 3, iters
    ciders = [hist[k]["lang_stats"].get("CIDEr") for k in iters]
    assert all(c is not None for c in ciders), ciders
    # CIDEr improves across checkpoints and the gate tracked the max
    assert ciders[-1] > ciders[0], ciders
    assert max(ciders) > 1.0, ciders  # near-memorised color captions
    assert infos["best_val_score"] == pytest.approx(max(ciders))
    # the CIDEr gate flipped model-best at least once
    assert os.path.exists(os.path.join(expr, "model-best.msgpack"))

    # reload the gated best checkpoint and beam-decode val images
    vocab = Vocabulary.load(cfg.vocab_path)
    cap = Captioner.from_checkpoint(cfg, expr, vocab, bucket_sizes=(12,))
    val_paths = [f"{workdir}/imgs/img{i}.png" for i in range(36, 48)]
    captions = cap.caption_paths(val_paths)
    expected = [
        f"a {color} ball" for color in list(COLORS) for _ in range(2)
    ]
    correct = sum(c == e for c, e in zip(captions, expected))
    assert correct >= 9, list(zip(captions, expected))

    # argv-level evaluate CLI on the same artifacts (the standalone eval
    # workflow a user runs on a finished experiment) — the one CLI surface
    # the rest of the suite exercised only through its error path
    from show_and_tell_tpu.cli.evaluate import main as evaluate_main

    val_loss, preds, stats = evaluate_main(
        [
            "--data_json", cfg.data_json,
            "--vocab_path", cfg.vocab_path,
            "--ann_file", cfg.ann_file,
            "--load_model_path", expr,
            "--batch_size", "6",
            "--embed_size", "24", "--hidden_size", "48", "--crop_size", "32",
            "--num_buckets", "1", "--num_workers", "2",
            "--beam_size", "3", "--max_decode_len", "5",
            "--language_eval", "1", "--log_step", "50",
        ]
    )
    assert np.isfinite(val_loss)
    assert len(preds) == 12, len(preds)
    # same gated-best checkpoint the Captioner just decoded with: the CLI
    # must reproduce the near-memorised val CIDEr, not a random-weights one
    assert stats.get("CIDEr", 0.0) > 1.0, stats
