"""Invariants of the COCO-scale synthetic dataset generator.

benchmarks/coco_scale_data.py feeds the dress rehearsal (VERDICT r3
item 1); these tests pin the shape of what it emits at a smoke size so
the full-scale run's guarantees (split structure, caption counts,
Karpathy-format fields, deterministic pixels) can't silently drift.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks import coco_scale_data as gen  # noqa: E402


def test_generate_smoke(tmp_path):
    stats = gen.generate(str(tmp_path), n_images=60, images=True)
    assert stats["n_images"] == 60
    assert stats["n_captions"] == 300  # 5 per image below full scale

    with open(tmp_path / "karpathy_synth.json") as f:
        data = json.load(f)
    imgs = data["images"]
    assert len(imgs) == 60
    splits = [i["split"] for i in imgs]
    # scaled split sizes, train first, all four present
    assert splits[0] == "train" and "restval" in splits
    assert "val" in splits and "test" in splits
    for img in imgs:
        assert img["filepath"] == (
            "train2014" if img["split"] == "train" else "val2014"
        )
        assert len(img["sentences"]) == 5
        assert img["sentids"] == [s["sentid"] for s in img["sentences"]]
        for s in img["sentences"]:
            assert 8 <= len(s["tokens"]) <= 18
            assert s["raw"] == " ".join(s["tokens"])
        # the image file exists where the record points
        p = tmp_path / "images" / img["filepath"] / img["filename"]
        assert p.exists() and p.stat().st_size > 1000

    # val annotation file is COCO-format and covers exactly the val split
    with open(tmp_path / "captions_val_synth.json") as f:
        ann = json.load(f)
    val_ids = {i["imgid"] for i in imgs if i["split"] == "val"}
    assert {im["id"] for im in ann["images"]} == val_ids
    assert {a["image_id"] for a in ann["annotations"]} == val_ids


def test_render_deterministic():
    a = gen.render(7, gen.scene_for(7))
    b = gen.render(7, gen.scene_for(7))
    assert a.shape == (gen.SRC_H, gen.SRC_W, 3) and a.dtype == np.uint8
    assert (a == b).all()
    c = gen.render(8, gen.scene_for(8))
    assert (a != c).any()


def test_zipf_tail_threshold():
    """K is chosen so rank 10,000 sits exactly at count 5: ~10k tail
    words clear the vocab threshold, ~25k stay bad words (COCO's
    head/tail split)."""
    rng = np.random.default_rng(7)
    multiset = gen.build_filler_multiset(rng)
    words, counts = np.unique(multiset, return_counts=True)
    n_vocab = int((counts >= 5).sum())
    assert 10_500 <= n_vocab <= 11_500  # round() puts the count-5 edge at rank ~11.1k; full-scale vocab measured 11,147
    assert len(words) == gen.ZIPF_RANKS
    # pseudo-words never collide with core caption words
    core = {w for c, s in [(c, s) for c in gen.COLORS for s in gen.SHAPES]
            for t in gen.captions_for(
                {"c1": c, "c2": c, "s1": s, "s2": s, "z1": "large",
                 "z2": "small", "layout": "above"}, 5, [])
            for w in t}
    assert not core & set(words.tolist())
