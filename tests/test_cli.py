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
