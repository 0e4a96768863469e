"""CLI entry-point argument handling (no device work)."""

import pytest

from show_and_tell_tpu.cli.preprocess import main as preprocess_main


def test_preprocess_requires_caption_json():
    with pytest.raises(SystemExit):
        preprocess_main([])


def test_evaluate_requires_existing_checkpoint(tmp_path):
    import json

    from show_and_tell_tpu.cli.evaluate import main as evaluate_main
    from show_and_tell_tpu.utils.vocab import Vocabulary

    v = Vocabulary.from_words(["w"])
    vp = str(tmp_path / "vocab.json")
    v.save(vp)
    dj = str(tmp_path / "data.json")
    with open(dj, "w") as f:
        json.dump(
            [{"split": "val", "imgid": 0, "cocoid": 0, "file_path": "x",
              "final_caption": ["w"], "sentids": 0}],
            f,
        )
    with pytest.raises(SystemExit):
        evaluate_main(
            [
                "--data_json", dj, "--vocab_path", vp,
                "--load_model_path", str(tmp_path / "nope"),
                "--embed_size", "8", "--hidden_size", "16", "--crop_size", "32",
            ]
        )


def test_caption_cli_arg_split():
    from show_and_tell_tpu.cli.caption import _split_args

    imgs, flags = _split_args(
        ["a.jpg", "--beam_size", "3", "dir/", "--vocab_path=v.json", "b.png"]
    )
    assert imgs == ["a.jpg", "dir/", "b.png"]
    assert flags == ["--beam_size", "3", "--vocab_path=v.json"]


def test_caption_cli_end_to_end(tmp_path):
    """Caption two PNGs with a random-weight tiny model through the real CLI
    path (no checkpoint: from_checkpoint with load_model_path=None)."""
    import json

    import numpy as np
    from PIL import Image

    from show_and_tell_tpu.cli.caption import main as caption_main
    from show_and_tell_tpu.utils.vocab import Vocabulary

    v = Vocabulary.from_words(["a", "dog", "runs"])
    vp = str(tmp_path / "vocab.json")
    v.save(vp)
    imgdir = tmp_path / "imgs"
    imgdir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        Image.fromarray(
            rng.integers(0, 255, (40, 50, 3), dtype=np.uint8)
        ).save(imgdir / f"im{i}.png")
    results = caption_main(
        [
            str(imgdir),
            "--vocab_path", vp,
            "--embed_size", "8", "--hidden_size", "16", "--crop_size", "32",
            "--max_decode_len", "4", "--beam_size", "2",
        ]
    )
    assert len(results) == 2
    assert all(set(r) == {"image", "caption"} for r in results)


def test_caption_cli_no_images():
    import pytest as _pytest

    from show_and_tell_tpu.cli.caption import main as caption_main

    with _pytest.raises(SystemExit):
        caption_main(["--beam_size", "2"])


def test_caption_cli_attention_dir(tmp_path):
    """--attention_dir writes one contact sheet per image and reports its
    path in the JSON record."""
    import numpy as np
    from PIL import Image

    from show_and_tell_tpu.cli.caption import main as caption_main
    from show_and_tell_tpu.utils.vocab import Vocabulary

    v = Vocabulary.from_words(["a", "dog", "runs"])
    vp = str(tmp_path / "vocab.json")
    v.save(vp)
    img = tmp_path / "im.png"
    Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (40, 50, 3), dtype=np.uint8)
    ).save(img)
    outdir = tmp_path / "sheets"
    results = caption_main(
        [
            str(img),
            "--vocab_path", vp, "--attention_dir", str(outdir),
            "--embed_size", "8", "--hidden_size", "16", "--crop_size", "32",
            "--max_decode_len", "4", "--beam_size", "2",
        ]
    )
    assert len(results) == 1
    sheet = results[0]["attention_sheet"]
    assert sheet.endswith("im_attention.png")
    from PIL import Image as PILImage

    rendered = PILImage.open(sheet)
    # panels are crop_size (32) squares: the sheet renders the model's
    # center-cropped view, not the full frame (geometry review fix)
    assert rendered.width % 32 == 0 and rendered.width >= 64
    assert rendered.height % (32 + 14) == 0  # rows of crop + label strip


def test_caption_cli_attention_fail_fast_and_collisions(tmp_path):
    """--attention_dir (a) fails BEFORE captioning when the model has no
    attention maps, and (b) never lets same-basename inputs overwrite each
    other's sheets."""
    import os

    import numpy as np
    from PIL import Image

    from show_and_tell_tpu.cli.caption import main as caption_main
    from show_and_tell_tpu.utils.vocab import Vocabulary

    v = Vocabulary.from_words(["a", "dog", "runs"])
    vp = str(tmp_path / "vocab.json")
    v.save(vp)
    rng = np.random.default_rng(0)
    d1, d2, d3 = tmp_path / "d1", tmp_path / "d2", tmp_path / "d3"
    d1.mkdir(), d2.mkdir(), d3.mkdir()
    for d in (d1, d2, d3):
        Image.fromarray(
            rng.integers(0, 255, (40, 50, 3), dtype=np.uint8)
        ).save(d / "im.png")
    # occupies the first fallback slot (im_1): the de-collision loop must
    # re-check its candidates, not assume the fallback name is free
    Image.fromarray(
        rng.integers(0, 255, (40, 50, 3), dtype=np.uint8)
    ).save(d1 / "im_1.png")
    outdir = tmp_path / "sheets"
    tiny = [
        "--vocab_path", vp, "--attention_dir", str(outdir),
        "--embed_size", "8", "--hidden_size", "16", "--crop_size", "32",
        "--max_decode_len", "4", "--beam_size", "2",
    ]
    with pytest.raises(SystemExit, match="attention"):
        caption_main(
            [str(d1 / "im.png")] + tiny + ["--model", "show_tell",
                                           "--encoder", "resnet152"]
        )
    assert not outdir.exists() or not list(outdir.iterdir())  # no device work

    results = caption_main(
        [str(d1 / "im.png"), str(d1 / "im_1.png"), str(d2 / "im.png"),
         str(d3 / "im.png")] + tiny
    )
    sheets = {r["attention_sheet"] for r in results}
    assert len(sheets) == 4  # distinct files despite identical basenames
    for s in sheets:
        assert os.path.getsize(s) > 0


def test_score_cli_end_to_end(tmp_path, capsys):
    """The standalone scoring CLI (the pycocoevalcap no-model workflow):
    corpus scores on stdout as JSON, per-image scores (SPICE subcategory
    dicts, NaN -> null) written to --per_image_out, unmatched image ids
    filtered, and a nonzero exit when nothing matches."""
    import json

    from show_and_tell_tpu.cli.score import main as score_main

    ann = {
        "images": [{"id": 1}, {"id": 2}],
        "annotations": [
            {"image_id": 1, "id": 1, "caption": "a man riding a horse"},
            {"image_id": 1, "id": 2, "caption": "a person rides a horse"},
            {"image_id": 2, "id": 3, "caption": "two dogs playing in a park"},
            {"image_id": 2, "id": 4, "caption": "dogs play on the grass"},
        ],
    }
    ann_p = tmp_path / "ann.json"
    ann_p.write_text(json.dumps(ann))
    res_p = tmp_path / "res.json"
    res_p.write_text(json.dumps([
        {"image_id": 1, "caption": "a man riding a horse"},
        {"image_id": 2, "caption": "two dogs playing in a park"},
        {"image_id": 99, "caption": "unmatched"},
    ]))
    per_p = tmp_path / "per.json"
    rc = score_main([
        "--ann_file", str(ann_p), "--res_file", str(res_p),
        "--per_image_out", str(per_p),
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_scored"] == 2
    assert out["Bleu_4"] == pytest.approx(1.0)
    assert 0.0 < out["SPICE"] <= 1.0
    per = json.loads(per_p.read_text())
    assert sorted(per) == ["1", "2"]
    assert set(per["1"]["SPICE"]) >= {"All", "Object", "Size"}
    assert per["1"]["SPICE"]["Size"]["f"] is None  # NaN -> null
    # nothing matches -> exit 1
    res_p.write_text(json.dumps([{"image_id": 7, "caption": "x"}]))
    assert score_main([
        "--ann_file", str(ann_p), "--res_file", str(res_p),
    ]) == 1
