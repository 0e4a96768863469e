"""Epoch-chain supervisor + RSS watchdog (VERDICT r4 item 2).

Covers: the watchdog converts memory pressure into the clean preemption
path; the chain advances one epoch per child, resumes a preempted child
bit-continuously, bounds no-progress respawns, and survives a supervisor
restart; and one REAL subprocess chain drives cli.main end-to-end on the
tiny learnable dataset (the same harness as tests/test_integration.py).
"""

import json
import os
import subprocess
import sys
import time

import pytest

from show_and_tell_tpu import ckpt
from show_and_tell_tpu.config import Config
from show_and_tell_tpu.train.preempt import (
    PreemptionGuard,
    RssWatchdog,
    current_rss_gb,
)


# --- RSS watchdog ---------------------------------------------------------


def test_current_rss_is_sane():
    rss = current_rss_gb()
    # a live CPython + jax process sits between ~50 MB and this host's RAM
    assert 0.01 < rss < 200, rss


def test_watchdog_triggers_guard_above_threshold():
    guard = PreemptionGuard()
    with RssWatchdog(guard, threshold_gb=0.001, interval_s=0.05) as wd:
        for _ in range(100):
            if guard.triggered:
                break
            time.sleep(0.05)
    assert guard.triggered
    assert wd.fired


def test_watchdog_quiet_below_threshold():
    guard = PreemptionGuard()
    with RssWatchdog(guard, threshold_gb=10_000.0, interval_s=0.05) as wd:
        time.sleep(0.3)
    assert not guard.triggered
    assert not wd.fired


def test_watchdog_rejects_nonpositive_threshold():
    with pytest.raises(ValueError):
        RssWatchdog(PreemptionGuard(), threshold_gb=0.0)


def test_trainer_rss_preempt_saves_and_exits(tmp_path):
    """cfg.rss_preempt_gb wires the watchdog into Trainer.train: with an
    impossibly low threshold the first poll preempts, the full train state
    lands on disk, and the run exits early with the preempted flag."""
    from tests.test_train import _loader, small_cfg

    from show_and_tell_tpu.models.registry import build_model
    from show_and_tell_tpu.train.trainer import Trainer

    cfg = small_cfg(
        tmp_path, rss_preempt_gb=0.001, max_epochs=50, save_checkpoint_every=10**9
    )
    model = build_model(cfg, 30)
    tr = Trainer(cfg, model, _loader(n_batches=400))
    infos = tr.train()
    assert infos.get("preempted") is True
    assert infos["epoch"] < 50  # preempted long before the nominal end
    assert ckpt.load_train_state(cfg.expr_dir, tr.state) is not None


# --- chain orchestration (injected spawner, no subprocesses) --------------


def _chain_cfg(tmp_path, **kw):
    base = dict(
        expr_dir=str(tmp_path / "exp"),
        user_id="u",
        exp_id="e",
        max_epochs=3,
    )
    base.update(kw)
    return Config(**base)


class _FakeTrainer:
    """Stands in for a cli.main child: each call persists infos as the real
    Trainer would (optionally preempting mid-epoch or crashing first)."""

    def __init__(self, expr, steps_per_epoch=10):
        self.expr = expr
        self.steps = steps_per_epoch
        self.calls = []
        # behaviors consumed in order; default = complete the epoch
        self.script = []

    def __call__(self, argv, log_path, timeout_s, grace_s):
        # argv carries --max_epochs <k> — the epoch this link targets
        upto = int(argv[argv.index("--max_epochs") + 1])
        behavior = self.script.pop(0) if self.script else "ok"
        self.calls.append((upto, behavior))
        infos = ckpt.load_infos(self.expr) or {}
        total = int(infos.get("total_iter", 0))
        if behavior == "crash_no_progress":
            return 1
        if behavior == "preempt_mid":
            half = self.steps // 2
            infos.update(
                epoch=upto, iter=half, total_iter=(upto - 1) * self.steps + half,
                preempted=True,
            )
            ckpt.save_infos(self.expr, infos)
            return 0
        # complete through epoch `upto` (resuming any mid-epoch state)
        infos.pop("preempted", None)
        infos.update(epoch=upto, iter=self.steps, total_iter=upto * self.steps)
        ckpt.save_infos(self.expr, infos)
        return 0


def test_chain_happy_path_one_child_per_epoch(tmp_path):
    from show_and_tell_tpu.cli.train_chain import resolved_expr_dir, run_chain

    cfg = _chain_cfg(tmp_path)
    expr = resolved_expr_dir(cfg)
    os.makedirs(expr, exist_ok=True)
    fake = _FakeTrainer(expr)
    record = run_chain(cfg, spawn=fake)
    assert [c[0] for c in fake.calls] == [1, 2, 3]
    assert record["completed_epochs"] == 3
    chain = json.load(open(os.path.join(expr, "chain.json")))
    assert chain["completed_epochs"] == 3
    assert all(s["returncode"] == 0 for s in chain["spawns"])


def test_chain_respawns_after_preemption(tmp_path):
    from show_and_tell_tpu.cli.train_chain import resolved_expr_dir, run_chain

    cfg = _chain_cfg(tmp_path, max_epochs=2)
    expr = resolved_expr_dir(cfg)
    os.makedirs(expr, exist_ok=True)
    fake = _FakeTrainer(expr)
    fake.script = ["ok", "preempt_mid", "ok"]  # epoch 2 preempts once
    record = run_chain(cfg, spawn=fake)
    assert [c[0] for c in fake.calls] == [1, 2, 2]
    assert record["completed_epochs"] == 2
    # the preempted spawn is recorded as such, and counted as progress
    preempted = [s for s in record["spawns"] if s["preempted"]]
    assert len(preempted) == 1 and preempted[0]["progressed"]


def test_chain_bounds_no_progress_respawns(tmp_path):
    from show_and_tell_tpu.cli.train_chain import resolved_expr_dir, run_chain

    cfg = _chain_cfg(tmp_path, max_epochs=1)
    expr = resolved_expr_dir(cfg)
    os.makedirs(expr, exist_ok=True)
    fake = _FakeTrainer(expr)
    fake.script = ["crash_no_progress"] * 10
    with pytest.raises(RuntimeError, match="no progress"):
        run_chain(cfg, max_retries=2, spawn=fake)
    assert len(fake.calls) == 3  # initial + 2 retries


def test_chain_supervisor_restart_skips_completed_epochs(tmp_path):
    from show_and_tell_tpu.cli.train_chain import resolved_expr_dir, run_chain

    cfg = _chain_cfg(tmp_path, max_epochs=3)
    expr = resolved_expr_dir(cfg)
    os.makedirs(expr, exist_ok=True)
    fake = _FakeTrainer(expr)
    fake.script = ["ok", "ok"]
    # first supervisor dies after epoch 2 (simulated by a crash behavior
    # that raises out of run_chain via no-progress exhaustion)
    fake.script += ["crash_no_progress"] * 3
    with pytest.raises(RuntimeError):
        run_chain(cfg, max_retries=2, spawn=fake)
    # restarted supervisor resumes at epoch 3, not epoch 1
    fake2 = _FakeTrainer(expr)
    record = run_chain(cfg, spawn=fake2)
    assert [c[0] for c in fake2.calls] == [3]
    assert record["completed_epochs"] == 3


def test_child_argv_roundtrips_config(tmp_path):
    from show_and_tell_tpu.cli.train_chain import child_argv, resolved_expr_dir
    from show_and_tell_tpu.config import parse_config

    cfg = _chain_cfg(
        tmp_path, batch_size=7, dtype="bfloat16", rss_preempt_gb=99.5,
        scheduled_sampling_start=0,
    )
    argv = child_argv(cfg, upto_epoch=2)
    assert argv[:3] == [sys.executable, "-m", "show_and_tell_tpu.cli.main"]
    child = parse_config(argv[3:])
    assert child.max_epochs == 2
    assert child.start_from == resolved_expr_dir(cfg)
    assert child.preempt_save is True
    assert child.batch_size == 7
    assert child.dtype == "bfloat16"
    assert child.rss_preempt_gb == 99.5
    assert child.scheduled_sampling_start == 0
    # the original expr_dir (not the resolved one) round-trips, so the
    # child's make_experiment_dir resolves to the same place
    assert child.expr_dir == cfg.expr_dir


# --- one REAL subprocess chain over the tiny learnable dataset ------------


def test_chain_end_to_end_subprocess(tmp_path):
    """Two epochs through real cli.main children: the chain record shows
    one child per epoch, infos carries both epochs' schedule, and the
    second child resumed (not restarted) the first's state."""
    from tests.test_integration import _build_dataset

    from show_and_tell_tpu.cli.train_chain import resolved_expr_dir, run_chain
    from show_and_tell_tpu.data.preprocess import preprocess

    workdir = str(tmp_path)
    _build_dataset(workdir)
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
        batch_size=12,
        num_devices=2,  # the inherited XLA_FLAGS expose 8 virtual devices
        max_epochs=2,
        save_checkpoint_every=3,  # gate fires mid-epoch (6 steps/epoch)
        embed_size=16,
        hidden_size=32,
        crop_size=32,
        num_buckets=1,
        num_workers=2,
        max_decode_len=5,
        language_eval=0,
        log_step=50,
        scheduled_sampling_start=0,
        scheduled_sampling_increase_every=1,
    )

    def spawn(argv, log_path, timeout_s, grace_s):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        with open(log_path, "ab") as out:
            return subprocess.run(
                argv, stdout=out, stderr=subprocess.STDOUT, env=env,
                timeout=600,
            ).returncode

    record = run_chain(cfg, spawn=spawn)
    assert record["completed_epochs"] == 2
    assert [s["epoch"] for s in record["spawns"]] == [1, 2]

    expr = resolved_expr_dir(cfg)
    infos = ckpt.load_infos(expr)
    assert infos["epoch"] == 2
    assert infos["total_iter"] == 12  # 6 steps/epoch x 2, resumed not redone
    assert "preempted" not in infos
    # per-epoch schedule recorded (learning-curve artifact source)
    sched = infos["epoch_schedule"]
    assert set(sched) == {"1", "2"}
    assert sched["2"]["ss_prob"] == pytest.approx(0.1)
    # both children trained: loss history spans both epochs' gates and the
    # end-of-run persist covered the non-aligned epoch ends
    assert len(infos["loss_history"]) >= 3
    # the chain log files exist, one per child
    logs = [f for f in os.listdir(expr) if f.startswith("chain_epoch")]
    assert len(logs) == 2


def test_resume_with_zero_steps_clears_stale_preempt_flag(tmp_path):
    """A preemption on an epoch's FINAL iteration leaves preempted=True in
    infos; the respawned link replays zero steps — it must still rewrite
    infos (clearing the flag on disk), or the supervisor would retry the
    finished epoch forever and abort as 'no progress' (review fix)."""
    from tests.test_train import _loader, small_cfg

    from show_and_tell_tpu.models.registry import build_model
    from show_and_tell_tpu.train.preempt import PreemptionGuard
    from show_and_tell_tpu.train.trainer import Trainer

    cfg = small_cfg(tmp_path, max_epochs=1, save_checkpoint_every=10**9)
    batches = _loader(n_batches=4)

    class TriggerOnLast:
        """Trips the guard when the epoch's iterator EXHAUSTS — the
        trainer's one-batch transfer lookahead drains it while the final
        step runs, so the guard check after that step sees the latch ->
        emergency save lands exactly on the epoch's final iteration."""

        def __init__(self, guard):
            self.guard = guard

        def __len__(self):
            return len(batches)

        def __iter__(self):
            yield from batches
            self.guard.trigger()

    guard = PreemptionGuard()
    model = build_model(cfg, 30)
    tr = Trainer(cfg, model, TriggerOnLast(guard))
    infos = tr.train(preempt_guard=guard)
    assert infos["preempted"] is True and infos["iter"] == 4

    on_disk = ckpt.load_infos(cfg.expr_dir)
    assert on_disk.get("preempted") is True

    # the respawned link: same epoch target, zero remaining iterations
    cfg2 = cfg.replace(start_from=str(cfg.expr_dir))
    tr2 = Trainer(cfg2, build_model(cfg2, 30), batches)
    tr2.train()
    on_disk = ckpt.load_infos(cfg.expr_dir)
    assert "preempted" not in on_disk, "stale flag must be cleared on disk"
    assert on_disk["epoch"] == 1 and on_disk["iter"] == 4


def test_chain_restart_merges_provenance_and_trusts_chain_progress(tmp_path):
    from show_and_tell_tpu.cli.train_chain import resolved_expr_dir, run_chain

    cfg = _chain_cfg(tmp_path, max_epochs=3)
    expr = resolved_expr_dir(cfg)
    os.makedirs(expr, exist_ok=True)
    fake = _FakeTrainer(expr)
    fake.script = ["ok", "ok"] + ["crash_no_progress"] * 3
    with pytest.raises(RuntimeError):
        run_chain(cfg, max_retries=2, spawn=fake)
    n_prior = len(json.load(open(os.path.join(expr, "chain.json")))["spawns"])
    assert n_prior == 5  # 2 ok + 3 crashes

    # simulate a mid-epoch-3 periodic checkpoint (no preempted flag) that a
    # hard crash left behind: the infos heuristic alone would call epoch 3
    # complete; chain.json's completed_epochs=2 must win (review fix)
    infos = ckpt.load_infos(expr)
    infos.update(epoch=3, iter=4, total_iter=24)
    ckpt.save_infos(expr, infos)

    fake2 = _FakeTrainer(expr)
    record = run_chain(cfg, spawn=fake2)
    assert [c[0] for c in fake2.calls] == [3]  # re-targets epoch 3, not 4
    assert record["completed_epochs"] == 3
    # prior spawns preserved in the merged provenance trail
    chain = json.load(open(os.path.join(expr, "chain.json")))
    assert len(chain["spawns"]) == n_prior + 1
    assert [s["epoch"] for s in chain["spawns"][:2]] == [1, 2]
