"""benchmarks/compositional_scale.py mechanics (quick mode, tiny dims).

The full-scale result (reference dims, on-chip) is recorded in
docs/STATUS.md; this pins the pipeline itself — scene synthesis, held-out
split hygiene, one-template-per-record training, beam/greedy decode, the
full metric-suite hookup, and the composition-accuracy checker."""

import numpy as np

import benchmarks.compositional_scale as cs


def test_composition_correct_checker():
    top, bottom = ("red", "circle"), ("blue", "square")
    ok = cs.composition_correct
    assert ok("a red circle above a blue square", top, bottom)
    assert ok("the red circle is above the blue square", top, bottom)
    assert ok("a blue square below a red circle", top, bottom)
    # wrong binding: colors swapped across regions
    assert not ok("a blue circle above a red square", top, bottom)
    # wrong order for the phrasing used
    assert not ok("a blue square above a red circle", top, bottom)
    assert not ok("a red circle below a blue square", top, bottom)
    # missing an object
    assert not ok("a red circle", top, bottom)


def test_held_out_split_hygiene():
    types = cs.scene_types()
    s1, s2 = 5, 11
    held = (
        [(types[i], types[(i + s1) % len(types)]) for i in range(len(types))]
        + [(types[i], types[(i + s2) % len(types)]) for i in range(len(types))]
    )[: cs.N_HELD_TYPES]
    assert len(held) == cs.N_HELD_TYPES
    assert len(set(held)) == cs.N_HELD_TYPES  # distinct ordered pairs
    # every (color, shape) type still trains in BOTH slots: the held-out
    # set removes at most 2 of each type's 17 top-slot (and bottom-slot)
    # pairings
    from collections import Counter

    tops = Counter(t for t, _ in held)
    bottoms = Counter(b for _, b in held)
    assert max(tops.values()) <= 2 and max(bottoms.values()) <= 2


def test_scene_shapes_distinct():
    rng = np.random.default_rng(0)
    img = cs.make_scene(("red", "circle"), ("blue", "square"), rng)
    assert img.shape == (cs.SIZE, cs.SIZE, 3) and img.dtype == np.uint8
    # top half contains red mass, bottom half blue mass
    top, bottom = img[: cs.SIZE // 2], img[cs.SIZE // 2 :]
    assert (top[..., 0] > 180).sum() > 100  # red pixels up top
    assert (bottom[..., 2] > 180).sum() > 100  # blue pixels below


def test_quick_pipeline_end_to_end(monkeypatch):
    monkeypatch.setattr(cs, "EMBED", 24)
    monkeypatch.setattr(cs, "HIDDEN", 48)
    monkeypatch.setattr(cs, "CROP", 64)
    monkeypatch.setattr(cs, "SIZE", 96)
    monkeypatch.setattr(cs, "BATCH", 32)
    out = cs.main(quick=True)
    assert out["metric"] == "compositional_scale"
    assert 0.0 <= out["value"] <= 1.0
    assert set(out["eval"]) == {
        "Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4",
        "METEOR", "ROUGE_L", "CIDEr", "SPICE",
    }
    assert out["held_out_images"] == out["held_out_types"]  # 1 inst in quick
    assert out["train"]["records"] == out["train"]["pairs"]
