import json
import os

from show_and_tell_tpu.config import Config, load_config, parse_config, save_config


def test_defaults_match_reference():
    # Reference defaults: config.py:16-66 of incredible-vision/show-and-tell.
    c = Config()
    assert c.batch_size == 128
    assert c.embed_size == 512
    assert c.hidden_size == 1024
    assert c.num_layers == 1
    assert c.learning_rate == 1e-3
    assert c.max_epochs == 20
    assert c.grad_clip == 0.1
    assert c.learning_rate_decay_start == 1
    assert c.learning_rate_decay_every == 3
    assert c.learning_rate_decay_rate == 0.8
    assert c.scheduled_sampling_max_prob == 0.25
    assert c.language_eval == 1
    assert c.crop_size == 224
    assert c.random_seed == 123
    assert c.max_decode_len == 20
    assert c.word_count_threshold == 5


def test_cli_roundtrip():
    c = parse_config(["--batch_size", "32", "--model", "show_tell", "--load_pretrained", "true"])
    assert c.batch_size == 32
    assert c.model == "show_tell"
    assert c.load_pretrained is True  # reference bug (config.py:36) fixed


def test_save_load(tmp_path):
    c = Config(exp_id="t1", expr_dir=str(tmp_path))
    p = save_config(c)
    assert os.path.exists(p)
    c2 = load_config(p)
    assert c2 == c
    with open(p) as f:
        d = json.load(f)
    assert d["exp_id"] == "t1"


def test_from_dict_ignores_unknown():
    c = Config.from_dict({"batch_size": 4, "not_a_field": 1})
    assert c.batch_size == 4
