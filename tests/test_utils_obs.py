"""Small-module coverage: meters, experiment dirs, config CLI edge cases."""

import os
import time

from show_and_tell_tpu.config import Config, parse_config
from show_and_tell_tpu.obs.meters import StepTimer, ThroughputMeter
from show_and_tell_tpu.utils.experiment import make_experiment_dir


def test_step_timer_ema():
    t = StepTimer(ema=0.5)
    t.start()
    time.sleep(0.01)
    d1 = t.stop()
    assert d1 >= 0.01
    assert t.avg_s == d1
    t.start()
    time.sleep(0.01)
    d2 = t.stop()
    assert t.last_s == d2
    assert abs(t.avg_s - (0.5 * d1 + 0.5 * d2)) < 1e-9


def test_throughput_meter():
    m = ThroughputMeter()
    assert m.items_per_sec == 0.0
    m.update(100, 2.0)
    m.update(50, 1.0)
    assert m.items_per_sec == 50.0
    m.reset()
    assert m.items == 0 and m.seconds == 0.0


def test_make_experiment_dir(tmp_path):
    cfg = Config(expr_dir=str(tmp_path), user_id="u1", exp_id="e1")
    cfg = make_experiment_dir(cfg)
    assert cfg.expr_dir == os.path.join(str(tmp_path), "u1", "e1")
    assert os.path.isdir(cfg.expr_dir)
    assert os.path.exists(os.path.join(cfg.expr_dir, "config_expr_e1.json"))


def test_config_optional_bool_flag():
    c = parse_config(["--use_pallas", "true"])
    assert c.use_pallas is True
    c = parse_config(["--use_pallas", "false"])
    assert c.use_pallas is False
    assert parse_config([]).use_pallas is None


def test_config_optional_str_none_default():
    c = parse_config([])
    assert c.start_from is None and c.ann_file is None
    c = parse_config(["--start_from", "/x"])
    assert c.start_from == "/x"


def test_profile_trace_disabled_and_enabled(tmp_path):
    import jax.numpy as jnp

    from show_and_tell_tpu.obs.profiler import profile_trace

    with profile_trace(str(tmp_path / "t"), enabled=False):
        x = jnp.ones((4,)).sum()
    assert float(x) == 4.0
    with profile_trace(str(tmp_path / "t"), enabled=True):
        y = jnp.ones((4,)).sum()
    assert float(y) == 4.0
    assert os.path.isdir(tmp_path / "t")  # trace directory written


def test_setup_logging_append_mode_preserves_previous_log(tmp_path):
    """An epoch-chain respawn (cli.main with --start_from) must append to
    the shared run log, not truncate the previous links' epochs out of it
    (utils/logging.py mode param). The handler machinery is process-global
    (_CONFIGURED), so the file-mode semantics are pinned directly."""
    import logging as _logging

    from show_and_tell_tpu.utils import logging as log_mod

    path = tmp_path / "log.txt"
    path.write_text("epoch-1 process wrote this\n")

    # fresh module state: setup_logging is once-per-process
    old_configured = log_mod._CONFIGURED
    root = _logging.getLogger()
    old_handlers = root.handlers[:]
    try:
        log_mod._CONFIGURED = False
        for h in root.handlers[:]:
            root.removeHandler(h)
        log_mod.setup_logging(str(path), mode="a")
        _logging.getLogger("show_and_tell_tpu.test").info("epoch-2 line")
        for h in root.handlers:
            h.flush()
        text = path.read_text()
        assert "epoch-1 process wrote this" in text  # not truncated
        assert "epoch-2 line" in text
    finally:
        for h in root.handlers[:]:
            root.removeHandler(h)
            try:
                h.close()
            except Exception:
                pass
        for h in old_handlers:
            root.addHandler(h)
        log_mod._CONFIGURED = old_configured
