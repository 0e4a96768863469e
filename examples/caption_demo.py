"""End-to-end demo: synthetic dataset -> preprocess -> train -> beam-search
captions + attention maps + full caption metrics.

Runs on CPU or a TPU chip with no external data (images and captions are
generated). With real COCO data, swap in the Karpathy-split JSON and image
root — every step is identical.

    python examples/caption_demo.py [workdir]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

# runnable from anywhere: put the repo root on sys.path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(workdir: str = "/tmp/sat_demo") -> None:
    from PIL import Image

    from show_and_tell_tpu.config import Config
    from show_and_tell_tpu.data.preprocess import preprocess
    from show_and_tell_tpu.cli.main import main as train_main
    from show_and_tell_tpu.serve import Captioner
    from show_and_tell_tpu.utils.vocab import Vocabulary

    os.makedirs(f"{workdir}/imgs", exist_ok=True)
    rng = np.random.default_rng(0)

    # --- 1. synthetic Karpathy-format dataset ------------------------------
    # LEARNABLE: each image is a solid color + noise and its caption names
    # the color, so the demo model genuinely learns to caption (val output
    # below should read "a red ball" etc., not babble).
    colors = {
        "red": (200, 30, 30), "green": (30, 200, 30), "blue": (30, 30, 200),
        "yellow": (220, 220, 30), "purple": (160, 30, 200),
        "white": (230, 230, 230),
    }
    names = list(colors)
    images = []
    for i in range(48):
        fname = f"img{i}.png"
        color = names[i % len(names)]
        base = np.array(colors[color], np.float32)
        arr = np.clip(base[None, None, :] + rng.normal(0, 12, (256, 256, 3)), 0, 255)
        Image.fromarray(arr.astype(np.uint8)).save(f"{workdir}/imgs/{fname}")
        sents = [{"tokens": ["a", color, "ball"]} for _ in range(2)]
        images.append(
            {"split": "train" if i < 40 else "val", "imgid": i,
             "cocoid": 1000 + i, "filepath": "", "filename": fname,
             "sentences": sents, "sentids": [2 * i, 2 * i + 1]}
        )
    with open(f"{workdir}/captions.json", "w") as f:
        json.dump({"images": images}, f)
    with open(f"{workdir}/ann_val.json", "w") as f:
        json.dump(
            {
                "images": [{"id": 1000 + i} for i in range(40, 48)],
                "annotations": [
                    {"image_id": 1000 + i, "caption": " ".join(s["tokens"]),
                     "id": 10 * i + j}
                    for i in range(40, 48)
                    for j, s in enumerate(images[i]["sentences"])
                ],
            },
            f,
        )

    # --- 2. preprocess -----------------------------------------------------
    cfg = Config(
        caption_json=f"{workdir}/captions.json",
        images_root=f"{workdir}/imgs",
        vocab_path=f"{workdir}/vocab.json",
        output_json=f"{workdir}/data.json",
        word_count_threshold=1,
        print_stats=False,
    )
    preprocess(cfg, resize_images=True, data_root=f"{workdir}/resized")

    # --- 3. train ----------------------------------------------------------
    cfg = cfg.replace(
        data_json=f"{workdir}/data.json",
        ann_file=f"{workdir}/ann_val.json",
        expr_dir=f"{workdir}/exp",
        batch_size=8,
        max_epochs=12,
        save_checkpoint_every=20,
        learning_rate=5e-3,
        embed_size=32,
        hidden_size=64,
        crop_size=64,  # small crop: fast CPU demo, color still dominant
        max_decode_len=5,
        num_buckets=1,
        beam_size=3,
        language_eval=1,
    )
    train_main(cfg)

    # --- 4. serve: beam captions + attention maps --------------------------
    vocab = Vocabulary.load(cfg.vocab_path)
    cap = Captioner.from_checkpoint(
        cfg, f"{workdir}/exp/default/showattendtell", vocab, bucket_sizes=(8,)
    )
    paths = [f"{workdir}/imgs/img{i}.png" for i in range(40, 44)]
    for p, c in zip(paths, cap.caption_paths(paths)):
        print(f"{os.path.basename(p)}: {c!r}")

    import jax.numpy as jnp

    from show_and_tell_tpu.data.transforms import eval_transform

    # Same input path the Captioner (and training) uses: 256px uint8 ->
    # center-crop + ImageNet normalize on device. Feeding raw 0..1 pixels
    # here would give the model out-of-distribution inputs, so the attention
    # maps would not correspond to the captions printed above.
    imgs = np.stack(
        [
            np.asarray(Image.open(p).convert("RGB").resize((256, 256)), np.uint8)
            for p in paths
        ]
    )
    feats = cap.model.backbone_features(
        cap.frozen, eval_transform(jnp.asarray(imgs), cfg.crop_size)
    )
    ids, alphas = cap.model.greedy_with_attention(cap.params, feats, max_len=8)
    print("attention grid per step:", np.asarray(alphas).shape)  # [B, T, 196]

    # Hallmark visualisation: per-word attention overlays, saved as contact
    # sheets (the overlays correspond to the center-cropped input the model
    # actually attended over).
    from show_and_tell_tpu.utils.visualize import save_attention_sheets

    off = (256 - cfg.crop_size) // 2
    cropped = imgs[:, off : off + cfg.crop_size, off : off + cfg.crop_size]
    outs = save_attention_sheets(
        cropped, np.asarray(ids), np.asarray(alphas), vocab,
        [f"{workdir}/attention_{os.path.basename(p)}" for p in paths],
    )
    print("attention sheets:", outs)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sat_demo")
