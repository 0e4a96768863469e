"""Compositional trained-model benchmark at reference scale.

The in-bench trained model (bench.py) and the compositional unit test
(tests/test_compositional.py) each prove one half of the story — full-dims
throughput on 1-object scenes, and small-dims composition on 2-object
scenes. This benchmark runs the whole story at once, as close to the real
workload as a zero-egress image allows:

- **Scenes**: two drawn objects (filled circle / square / triangle, 6
  colors, position-jittered, noise background) — 306 ordered scene types
  (18 x 17 distinct (color, shape) pairs; same-type-twice scenes are
  excluded so every caption names two distinguishable objects); 24 types
  are HELD OUT of training so the eval measures composition (binding
  each color/shape word to the right region), not caption memorization.
- **Captions**: 5 reference templates per scene ("a red circle above a
  blue square", "there is ...", "a blue square below a red circle", ...);
  each TRAINING record carries ONE randomly-drawn template (one record
  per caption, like the real pipeline/preprocess.py), while eval scores
  against all 5 — so BLEU/CIDEr behave like they do on real data instead
  of saturating at 1.0.
- **Model**: the flagship config — Show-Attend-Tell, embed 512 / hidden
  1024, frozen VGG16 trunk (random weights: no pretrained backbones
  exist in this image), bf16 compute, crop 224.
- **Protocol**: teacher-forced training on precomputed features (the
  decoder-only workflow, --features_path equivalent); beam-3 decode with
  early exit on held-out scenes; the FULL metric suite (BLEU-1..4,
  METEOR, ROUGE-L, CIDEr, SPICE) via the COCOEvalCap-equivalent
  orchestrator; plus exact composition accuracy (all four content words
  correct, both regions).

Run: python benchmarks/compositional_scale.py  -> one JSON line.
Reference anchor: eval.py:58-122 (the loop the reference ran on trained
models) + model2.py:73-78 (the attention this benchmark validates at
scale).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COLORS = {
    "red": (200, 30, 30),
    "green": (30, 200, 30),
    "blue": (30, 30, 200),
    "yellow": (220, 220, 30),
    "purple": (160, 30, 200),
    "white": (230, 230, 230),
}
SHAPES = ("circle", "square", "triangle")
NAMES = list(COLORS)

EMBED, HIDDEN = 512, 1024
CROP, SIZE = 224, 256
T = 14  # <start> + up to 12 tokens + <end>
BATCH = 256
TRAIN_STEPS = 2400
LR = 2e-3
LR_DECAY_AT, LR_DECAY = 1600, 0.25  # step LR schedule (trainer-style)
N_TRAIN_INST = 10  # instances (noise/jitter draws) per training scene type
N_HELD_INST = 4  # instances per held-out type at eval
N_HELD_TYPES = 24
SEED = 0


def scene_types():
    return [(c, s) for c in NAMES for s in SHAPES]


def draw_shape(img, shape, color, cy, cx, r):
    """Filled shape of half-extent r at (cy, cx), in-place."""
    y, x = np.ogrid[: img.shape[0], : img.shape[1]]
    if shape == "circle":
        mask = (y - cy) ** 2 + (x - cx) ** 2 <= r * r
    elif shape == "square":
        mask = (np.abs(y - cy) <= r) & (np.abs(x - cx) <= r)
    else:  # triangle (upward): |dx| <= (dy + r) / 2 within the vertical band
        dy, dx = y - cy, x - cx
        mask = (dy >= -r) & (dy <= r) & (np.abs(dx) <= (dy + r) / 2)
    img[mask] = np.array(COLORS[color], np.float32)


def make_scene(top, bottom, rng):
    """[SIZE, SIZE, 3] uint8: top object above bottom object, jittered."""
    img = rng.normal(118, 12, (SIZE, SIZE, 3)).astype(np.float32)
    (tc, ts), (bc, bs) = top, bottom
    r_lo, r_hi = max(SIZE // 8, 4), max(SIZE * 11 // 64, 6)  # 32..44 at 256
    pad = max(SIZE // 32, 2)
    r = int(rng.integers(r_lo, r_hi))
    cy = int(rng.integers(r + pad, SIZE // 2 - r - pad + 1))
    cx = int(rng.integers(r + pad, SIZE - r - pad + 1))
    draw_shape(img, ts, tc, cy, cx, r)
    r = int(rng.integers(r_lo, r_hi))
    cy = int(rng.integers(SIZE // 2 + r + pad, SIZE - r - pad + 1))
    cx = int(rng.integers(r + pad, SIZE - r - pad + 1))
    draw_shape(img, bs, bc, cy, cx, r)
    return np.clip(img, 0, 255).astype(np.uint8)


def templates(top, bottom):
    (tc, ts), (bc, bs) = top, bottom
    return [
        f"a {tc} {ts} above a {bc} {bs}",
        f"there is a {tc} {ts} above a {bc} {bs}",
        f"a {bc} {bs} below a {tc} {ts}",
        f"a {tc} {ts} sitting on top of a {bc} {bs}",
        f"the {tc} {ts} is above the {bc} {bs}",
    ]


def composition_correct(caption: str, top, bottom) -> bool:
    """All four content words present and bound to the right regions under
    ANY of the reference phrasings (above-order or below-order)."""
    (tc, ts), (bc, bs) = top, bottom
    w = caption.split()

    def pos(a, b):  # first index where "a b" occurs adjacently
        for i in range(len(w) - 1):
            if w[i] == a and w[i + 1] == b:
                return i
        return None

    t_pos, b_pos = pos(tc, ts), pos(bc, bs)
    if t_pos is None or b_pos is None:
        return False
    if "below" in w:
        return b_pos < t_pos
    return t_pos < b_pos


def main(quick: bool = False) -> dict:
    train_steps, n_train_inst, n_held_inst = TRAIN_STEPS, N_TRAIN_INST, N_HELD_INST
    if quick:  # tiny smoke (CI/CPU): exercises every stage, proves nothing
        train_steps, n_train_inst, n_held_inst = 30, 1, 1

    import jax
    import jax.numpy as jnp

    from show_and_tell_tpu.config import Config
    from show_and_tell_tpu.data.transforms import eval_transform
    from show_and_tell_tpu.decode import decode_ids
    from show_and_tell_tpu.metrics.orchestrator import COCOEvalCap
    from show_and_tell_tpu.metrics.coco import COCO
    from show_and_tell_tpu.models.registry import build_model
    from show_and_tell_tpu.train.step import make_train_state, make_train_step
    from show_and_tell_tpu.utils.vocab import Vocabulary

    rng = np.random.default_rng(SEED)
    types = scene_types()
    # held-out ordered pairs: every (color, shape) appears in BOTH slots
    # during training (a derangement over the 18 types)
    pairs = [(a, b) for a in types for b in types if a != b]
    rng.shuffle(pairs)
    # two distinct circular shifts -> 36 derangement pairs; take 24
    s1, s2 = 5, 11  # coprime-ish with 18, distinct
    held = (
        [(types[i], types[(i + s1) % len(types)]) for i in range(len(types))]
        + [(types[i], types[(i + s2) % len(types)]) for i in range(len(types))]
    )[:N_HELD_TYPES]
    held_set = set((tuple(a), tuple(b)) for a, b in held)
    train_pairs = [p for p in pairs if (tuple(p[0]), tuple(p[1])) not in held_set]

    words = sorted(
        set(NAMES)
        | set(SHAPES)
        | {"a", "the", "is", "there", "above", "below", "sitting", "on", "top", "of"}
    )
    vocab = Vocabulary.from_words(words)
    cfg = Config(
        embed_size=EMBED, hidden_size=HIDDEN, crop_size=CROP,
        max_decode_len=T, beam_size=3, dtype="bfloat16",
    )
    model = build_model(cfg, len(vocab))
    params, frozen = model.init(jax.random.PRNGKey(SEED))

    @jax.jit
    def feats_fn(frozen, images_u8):
        return model.backbone_features(
            frozen, eval_transform(images_u8, cfg.crop_size)
        )

    # ---- training set: one record per caption, one template per record --
    t0 = time.perf_counter()
    recs = []  # (scene index, token list)
    scenes = []
    for top, bottom in train_pairs:
        for _ in range(n_train_inst):
            tpl = templates(top, bottom)[rng.integers(0, 5)]
            scenes.append(make_scene(top, bottom, rng))
            recs.append(tpl.split())
    caps, lens = vocab.encode_batch(recs, T)
    caps, lens = np.asarray(caps), np.asarray(lens)
    n = len(scenes)

    # precompute features in chunks (the decoder-only workflow). They STAY
    # on device: round-tripping [N, 196, 512] through the host would cost
    # a ~50 MB relay transfer per training batch on this image's tunnel.
    feats_chunks = []
    for i in range(0, n, BATCH):
        chunk = np.stack(scenes[i : i + BATCH])
        if len(chunk) < BATCH:  # static shape for the jitted program
            chunk = np.concatenate(
                [chunk, np.zeros((BATCH - len(chunk), SIZE, SIZE, 3), np.uint8)]
            )
        feats_chunks.append(feats_fn(frozen, jnp.asarray(chunk)))
    feats = jnp.concatenate(feats_chunks)[:n]  # device-resident
    del feats_chunks
    feat_time = time.perf_counter() - t0

    # ---- train ----------------------------------------------------------
    t0 = time.perf_counter()
    state = make_train_state(cfg, params)
    step = make_train_step(model, cfg, donate=False)
    key = jax.random.PRNGKey(1)
    order = rng.permutation(n)
    pos = 0
    loss = float("nan")
    for s in range(train_steps):
        if pos + BATCH > n:
            order = rng.permutation(n)
            pos = 0
        idx = order[pos : pos + BATCH]
        pos += BATCH
        batch = {
            # device-side gather: only the tiny index array crosses the wire
            "features": jnp.take(feats, jnp.asarray(idx), axis=0),
            "captions": jnp.asarray(caps[idx]),
            "lengths": jnp.asarray(lens[idx]),
        }
        key, k = jax.random.split(key)
        lr = LR * (LR_DECAY if s >= LR_DECAY_AT else 1.0)
        state, metrics = step(state, frozen, batch, lr, 0.0, k)
        if s % 100 == 0 or s == train_steps - 1:
            loss = float(metrics["loss"])
            print(f"# step {s}: loss {loss:.4f}", file=sys.stderr)
    train_time = time.perf_counter() - t0

    # ---- held-out eval --------------------------------------------------
    t0 = time.perf_counter()
    held_imgs, held_meta = [], []
    for top, bottom in held:
        for _ in range(n_held_inst):
            held_imgs.append(make_scene(top, bottom, rng))
            held_meta.append((top, bottom))
    m = len(held_imgs)
    pad_to = -(-m // BATCH) * BATCH
    held_arr = np.stack(held_imgs)
    if pad_to > m:
        held_arr = np.concatenate(
            [held_arr, np.zeros((pad_to - m, SIZE, SIZE, 3), np.uint8)]
        )
    beam_fn = jax.jit(
        lambda p, f: decode_ids(model, cfg, p, None, f, "beam")
    )
    greedy_fn = jax.jit(
        lambda p, f: decode_ids(model, cfg, p, None, f, "greedy")
    )
    beam_caps, greedy_caps = [], []
    for i in range(0, pad_to, BATCH):
        hf = feats_fn(frozen, jnp.asarray(held_arr[i : i + BATCH]))
        beam_caps.extend(vocab.decode_batch(np.asarray(beam_fn(state.params, hf))))
        greedy_caps.extend(
            vocab.decode_batch(np.asarray(greedy_fn(state.params, hf)))
        )
    beam_caps, greedy_caps = beam_caps[:m], greedy_caps[:m]
    decode_time = time.perf_counter() - t0

    comp_beam = [
        composition_correct(c, top, bottom)
        for c, (top, bottom) in zip(beam_caps, held_meta)
    ]
    comp_greedy = [
        composition_correct(c, top, bottom)
        for c, (top, bottom) in zip(greedy_caps, held_meta)
    ]

    def slot_accuracy(caps_list):
        """Per-attribute diagnosis: is the failure colors or shapes?
        Reads the emitted (color, shape) pair per region by template
        orientation."""
        cc = sc = tot = 0
        for c, (top, bottom) in zip(caps_list, held_meta):
            w = c.split()
            first, second = (bottom, top) if "below" in w else (top, bottom)
            slots = [
                (i, i + 1) for i in range(len(w) - 1)
                if w[i] in COLORS and w[i + 1] in SHAPES
            ]
            for k, truth in zip(slots[:2], (first, second)):
                tot += 1
                cc += w[k[0]] == truth[0]
                sc += w[k[1]] == truth[1]
        return (
            round(cc / max(tot, 1), 4),
            round(sc / max(tot, 1), 4),
            round(tot / (2 * len(caps_list)), 4),  # slot-emission rate
        )

    color_acc, shape_acc, slot_rate = slot_accuracy(beam_caps)

    # ---- full metric suite on the beam output ---------------------------
    anns = {"images": [], "annotations": []}
    aid = 0
    for i, (top, bottom) in enumerate(held_meta):
        anns["images"].append({"id": i})
        for ref in templates(top, bottom):
            anns["annotations"].append(
                {"image_id": i, "id": aid, "caption": ref}
            )
            aid += 1
    coco = COCO(anns)
    res = coco.loadRes(
        [{"image_id": i, "caption": c} for i, c in enumerate(beam_caps)]
    )
    ev = COCOEvalCap(coco, res)
    ev.evaluate()
    scores = {k: round(float(v), 4) for k, v in ev.eval.items()}

    out = {
        "metric": "compositional_scale",
        "value": round(float(np.mean(comp_beam)), 4),
        "unit": "held-out composition accuracy (beam-3)",
        "greedy_accuracy": round(float(np.mean(comp_greedy)), 4),
        "beam_color_acc": color_acc,
        "beam_shape_acc": shape_acc,
        "beam_slot_rate": slot_rate,
        "eval": scores,
        "held_out_types": len(held),
        "held_out_images": m,
        "train": {
            "pairs": len(train_pairs),
            "records": n,
            "steps": train_steps,
            "batch": BATCH,
            "final_loss": round(loss, 4),
            "feat_s": round(feat_time, 1),
            "train_s": round(train_time, 1),
            "decode_s": round(decode_time, 1),
        },
        "config": {
            "model": "show_attend_tell", "encoder": "vgg16 (random frozen)",
            "embed": EMBED, "hidden": HIDDEN, "dtype": "bfloat16",
        },
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main(quick="--quick" in sys.argv)
