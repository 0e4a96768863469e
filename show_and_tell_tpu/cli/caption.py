"""Caption images from a trained checkpoint — the serving CLI.

The reference has no inference entry point at all (eval.py is
validation-only and its beam search is a stub, model2.py:113-114); this is
the "give me captions for these files" workflow a framework user actually
wants. Wraps :class:`show_and_tell_tpu.serve.Captioner` (bucketed batches,
device-side transforms, one-batch-lag pipelining).

Usage::

    python -m show_and_tell_tpu.cli.caption \
        --vocab_path data/vocab.json --load_model_path experiment/u/e \
        --encoder_weights vgg16.pth --beam_size 3 \
        img1.jpg img2.jpg some/dir/

Positional arguments are image files and/or directories (searched for
jpg/jpeg/png, non-recursive). Output: one JSON line per image on stdout —
``{"image": path, "caption": text}`` — so it pipes cleanly into jq etc.
Decode mode follows ``--beam_size`` (1 = greedy, >1 = beam); for sampling
use the :class:`Captioner` API directly (``temperature`` / ``top_k`` /
``top_p``). ``--attention_dir DIR`` additionally writes one
attention-overlay contact sheet per image (greedy decode — the
Show-Attend-Tell hallmark figure) and adds its path to the JSON line.
"""

from __future__ import annotations

import json
import logging
import os
import sys
from typing import List

from show_and_tell_tpu.config import parse_config
from show_and_tell_tpu.serve import Captioner
from show_and_tell_tpu.utils.compile_cache import enable as enable_compile_cache
from show_and_tell_tpu.utils.logging import setup_logging
from show_and_tell_tpu.utils.vocab import Vocabulary

log = logging.getLogger(__name__)

_EXTS = (".jpg", ".jpeg", ".png")


def _expand(paths: List[str]) -> List[str]:
    out: List[str] = []
    for p in paths:
        if os.path.isdir(p):
            out.extend(
                os.path.join(p, f)
                for f in sorted(os.listdir(p))
                if f.lower().endswith(_EXTS)
            )
        else:
            out.append(p)
    return out


def _split_args(argv: List[str]) -> tuple:
    """Separate positional image paths from ``--flag [value]`` pairs.

    Deterministic because every generated config flag takes exactly one
    value (config._add_field_arg: no store_true flags). Zero-value flags
    (``--help``) and a following ``--flag`` are never consumed as values,
    and swallowed image paths can't go unnoticed: ``main`` errors on any
    positional that doesn't exist on disk."""
    image_args: List[str] = []
    flag_args: List[str] = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a in ("-h", "--help"):
            flag_args.append(a)
        elif a.startswith("--"):
            flag_args.append(a)
            if "=" not in a and i + 1 < len(argv) and not argv[i + 1].startswith("--"):
                flag_args.append(argv[i + 1])
                i += 1
        else:
            image_args.append(a)
        i += 1
    return image_args, flag_args


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    image_args, flag_args = _split_args(argv)
    cfg = parse_config(flag_args)
    setup_logging("caption_log.txt")
    enable_compile_cache()
    missing = [p for p in image_args if not os.path.exists(p)]
    if missing:
        raise SystemExit(f"no such file or directory: {missing}")
    paths = _expand(image_args)
    if not paths:
        raise SystemExit("no images given (files or directories)")
    vocab = Vocabulary.load(cfg.vocab_path)
    # (Captioner.from_checkpoint warns if load_model_path is set without
    # encoder_weights — the random-frozen-encoder footgun.)
    cap = Captioner.from_checkpoint(cfg, cfg.load_model_path, vocab)
    if cfg.attention_dir and not hasattr(cap.model, "greedy_with_attention"):
        # fail BEFORE any device work: discovering this after captioning
        # every image threw the whole run away (review fix)
        raise SystemExit(
            f"--attention_dir requires an attention model; {cfg.model!r} "
            "exposes no attention maps (only show_attend_tell does)"
        )
    mode = "greedy" if cfg.beam_size <= 1 else "beam"
    results = []
    captions = cap.caption_paths(paths, mode=mode)
    failed = {i for i, _ in cap.last_errors}
    sheet_paths = {}
    if cfg.attention_dir:
        # the Show-Attend-Tell hallmark figure: greedy decode + one
        # attention-overlay contact sheet per image (utils/visualize).
        # Chunked like caption_paths: never materialize the whole input
        # set (or all [N, T, L] alpha maps) in host RAM (review fix). The
        # files are decoded a second time here — a bounded CPU cost,
        # unlike the unbounded memory of one up-front pass.
        import numpy as np

        from show_and_tell_tpu.data.pipeline import _load_image_checked
        from show_and_tell_tpu.utils.visualize import attention_sheet, model_view

        os.makedirs(cfg.attention_dir, exist_ok=True)
        used_names = set()
        chunk = max(cap.bucket_sizes)
        for s in range(0, len(paths), chunk):
            loaded = [_load_image_checked(p) for p in paths[s : s + chunk]]
            ok_idx = [i for i, (_, ok) in enumerate(loaded) if ok]
            if not ok_idx:
                continue
            imgs = np.stack([loaded[i][0] for i in ok_idx])
            caps_attn, alphas = cap.caption_with_attention(imgs)
            for j, i in enumerate(ok_idx):
                gi = s + i
                base = os.path.splitext(os.path.basename(paths[gi]))[0]
                # same-basename inputs (dirA/img.jpg + dirB/img.jpg) must
                # not overwrite each other's sheets, and the fallback must
                # itself be re-checked — an input literally named
                # img_1.jpg can occupy the first fallback slot (review fix)
                name = base + "_attention.png"
                j = 0
                while name in used_names:
                    j += 1
                    name = f"{base}_{j}_attention.png"
                used_names.add(name)
                out = os.path.join(cfg.attention_dir, name)
                words = caps_attn[j].split() or ["<no caption>"]
                # render on the center crop the model attended over
                view = model_view(imgs[j], cfg.crop_size)
                attention_sheet(view, alphas[j], words).save(out)
                sheet_paths[gi] = out
    for i, (path, caption) in enumerate(zip(paths, captions)):
        rec = {"image": path, "caption": caption}
        if i in failed:
            rec["error"] = "image failed to decode"
        if i in sheet_paths:
            rec["attention_sheet"] = sheet_paths[i]
        print(json.dumps(rec))
        results.append(rec)
    if failed:
        # per-item markers already emitted above; the summary + non-zero
        # exit makes the failure visible to scripts that only check $?
        raise SystemExit(
            f"{len(failed)} of {len(paths)} image(s) failed to decode: "
            + ", ".join(p for _, p in cap.last_errors[:5])
            + ("…" if len(failed) > 5 else "")
        )
    return results


if __name__ == "__main__":
    main()
