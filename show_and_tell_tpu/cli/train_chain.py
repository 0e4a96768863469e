"""Epoch-chain supervisor: run an N-epoch training as a chain of
one-epoch-per-process children, resuming between them.

Why a process chain exists as a framework feature: long runs die for
reasons outside the training loop's control — host memory leaks (this
rig's device-transport client leaks ~1 byte of host RSS per byte
transferred, ~91 GB per COCO-scale epoch at b256; docs/STATUS.md),
scheduler preemptions, transport wedges. The Trainer already converts
SIGTERM (train/preempt.py PreemptionGuard) and host-memory pressure
(RssWatchdog, ``--rss_preempt_gb``) into a clean full-train-state save;
this supervisor composes that into an unattended multi-epoch run:

    spawn ``cli.main --start_from <expr> --max_epochs k``  (one epoch)
      -> clean exit            : epoch k complete, advance to k+1
      -> preempted (watchdog / SIGTERM / ``--child_timeout_s``)
                               : respawn, resume mid-epoch bit-continuously
      -> crash                 : respawn from the last persisted state;
                                 a respawn that makes NO forward progress
                                 counts against ``--max_retries``

Each child is a fresh process, so any per-process leak is bounded to at
most one epoch plus the watchdog threshold. The reference's analogue is
its manual resume flow (``/root/reference/train.py:70-99``: restart the
script by hand with the same save dir); here the operator is one command:

    python -m show_and_tell_tpu.cli.train_chain --max_epochs 5 \
        --rss_preempt_gb 100 --data_json ... --vocab_path ...

Artifacts: ``chain.json`` in the experiment dir records every spawn
(epoch target, exit code, wall, preempted flag, total_iter reached) —
the provenance trail for the learning-curve artifact a multi-epoch
training-of-record commits.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import logging
import os
import signal
import subprocess
import sys
import time
from typing import Callable, List, Optional

from show_and_tell_tpu import ckpt
from show_and_tell_tpu.config import Config, parse_config

log = logging.getLogger(__name__)

# chain-level knobs (not Config fields: they govern the supervisor, and the
# child argv is generated from Config's fields — a knob there would leak
# into every child's parser)
_CHAIN_FLAGS = ("--max_retries", "--child_timeout_s", "--term_grace_s")


def resolved_expr_dir(cfg: Config) -> str:
    """The directory cli.main's ``make_experiment_dir`` will resolve to."""
    return os.path.join(cfg.expr_dir, cfg.user_id, cfg.exp_id)


def child_argv(cfg: Config, upto_epoch: int) -> List[str]:
    """argv for one chain link: train *through* epoch ``upto_epoch`` then
    exit. ``start_from`` points at the (shared) experiment dir so every
    link resumes whatever the previous one persisted; on the very first
    link the dir has no infos yet and resume is a no-op."""
    overrides = {
        "max_epochs": upto_epoch,
        "start_from": resolved_expr_dir(cfg),
        "preempt_save": True,  # the chain's handoff depends on it
    }
    argv = [sys.executable, "-m", "show_and_tell_tpu.cli.main"]
    for f in dataclasses.fields(Config):
        if f.name in ("current_lr", "ss_prob"):  # derived per-epoch
            continue
        value = overrides.get(f.name, getattr(cfg, f.name))
        if value is None:
            continue
        if isinstance(value, bool):
            value = "true" if value else "false"
        argv += [f"--{f.name}", str(value)]
    return argv


def _default_spawn(
    argv: List[str], log_path: str, timeout_s: float, grace_s: float
) -> int:
    """Run one child, teeing its output to ``log_path``. On timeout (or a
    supervisor SIGTERM/SIGINT) the child gets SIGTERM first — its
    PreemptionGuard finishes the in-flight step and saves — then SIGKILL
    after ``grace_s``. Returns the child's exit code (-signal if killed)."""
    with open(log_path, "ab") as out:
        proc = subprocess.Popen(argv, stdout=out, stderr=subprocess.STDOUT)
        try:
            proc.wait(timeout=timeout_s if timeout_s > 0 else None)
        except subprocess.TimeoutExpired:
            log.warning(
                "child exceeded %.0f s: sending SIGTERM for a clean "
                "preempt-save (%.0f s grace)", timeout_s, grace_s,
            )
            _terminate(proc, grace_s)
        except BaseException:  # KeyboardInterrupt / supervisor SIGTERM
            _terminate(proc, grace_s)
            raise
        return proc.returncode


def _terminate(proc: subprocess.Popen, grace_s: float) -> None:
    try:
        proc.send_signal(signal.SIGTERM)
        proc.wait(timeout=grace_s)
    except subprocess.TimeoutExpired:
        proc.kill()
        proc.wait()
    except ProcessLookupError:
        pass


def run_chain(
    cfg: Config,
    max_retries: int = 3,
    child_timeout_s: float = 0.0,
    term_grace_s: float = 180.0,
    spawn: Optional[Callable[[List[str], str, float, float], int]] = None,
) -> dict:
    """Drive ``cfg.max_epochs`` epochs as a chain of child processes.

    ``spawn(argv, log_path, timeout_s, grace_s) -> returncode`` is
    injectable for tests. Returns the chain record (also written to
    ``<expr>/chain.json`` after every spawn, so a killed supervisor leaves
    a complete provenance trail).
    """
    spawn = spawn or _default_spawn
    expr = resolved_expr_dir(cfg)
    os.makedirs(expr, exist_ok=True)
    # resume the CHAIN itself across supervisor restarts: keep the prior
    # run's spawn provenance (the trail must stay complete, review fix)
    # and trust ITS completed_epochs over the infos heuristic — after a
    # hard crash the infos blob can show a mid-epoch gate's epoch number
    # with no preempted flag, which is NOT a completed epoch.
    record: dict = {
        "target_epochs": cfg.max_epochs,
        "completed_epochs": 0,
        "spawns": [],
    }
    chain_path = os.path.join(expr, "chain.json")
    if os.path.exists(chain_path):
        try:
            with open(chain_path) as f:
                prior = json.load(f)
            record["spawns"] = list(prior.get("spawns", []))
            record["completed_epochs"] = int(prior.get("completed_epochs", 0))
        except (json.JSONDecodeError, OSError, ValueError):
            pass  # torn/old chain.json: fall back to the infos heuristic
    infos = ckpt.load_infos(expr) or {}
    if record["completed_epochs"]:
        start_epoch = record["completed_epochs"] + 1
    elif infos and not infos.get("preempted"):
        start_epoch = int(infos.get("epoch", 0)) + 1
        record["completed_epochs"] = start_epoch - 1
    elif infos:
        start_epoch = int(infos.get("epoch", 1))
    else:
        start_epoch = 1
    last_total_iter = int(infos.get("total_iter", 0))

    def _write_record() -> None:
        tmp = os.path.join(expr, "chain.json.tmp")
        with open(tmp, "w") as f:
            json.dump(record, f, indent=1)
        os.replace(tmp, os.path.join(expr, "chain.json"))

    for epoch in range(start_epoch, cfg.max_epochs + 1):
        retries = 0
        attempt = 0
        while True:
            attempt += 1
            argv = child_argv(cfg, epoch)
            log_path = os.path.join(expr, f"chain_epoch{epoch}_try{attempt}.log")
            log.info("chain: epoch %d attempt %d -> %s", epoch, attempt, log_path)
            t0 = time.perf_counter()
            rc = spawn(argv, log_path, child_timeout_s, term_grace_s)
            wall = time.perf_counter() - t0
            infos = ckpt.load_infos(expr) or {}
            total_iter = int(infos.get("total_iter", 0))
            preempted = bool(infos.get("preempted"))
            progressed = total_iter > last_total_iter
            last_total_iter = max(last_total_iter, total_iter)
            record["spawns"].append({
                "epoch": epoch,
                "attempt": attempt,
                "returncode": rc,
                "wall_s": round(wall, 1),
                "preempted": preempted,
                "total_iter": total_iter,
                "progressed": progressed,
            })
            _write_record()

            if rc == 0 and not preempted:
                record["completed_epochs"] = epoch
                _write_record()
                log.info(
                    "chain: epoch %d complete (%.0f s, total_iter %d)",
                    epoch, wall, total_iter,
                )
                break
            # preempted-or-crashed: respawn. Forward progress (watchdog
            # handoffs on a leaking host make steady progress) resets the
            # retry budget; a spin with no new iterations burns it.
            if progressed:
                retries = 0
            else:
                retries += 1
                if retries > max_retries:
                    raise RuntimeError(
                        f"chain: epoch {epoch} made no progress over "
                        f"{max_retries} consecutive respawns (last rc {rc}); "
                        f"see {log_path}"
                    )
            log.warning(
                "chain: respawning epoch %d (rc %s, preempted=%s, "
                "progressed=%s, retries %d/%d)",
                epoch, rc, preempted, progressed, retries, max_retries,
            )
    return record


def cli_entry() -> None:
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(message)s")
    ap = argparse.ArgumentParser(
        description="epoch-chain training supervisor", add_help=False
    )
    ap.add_argument("--max_retries", type=int, default=3)
    ap.add_argument("--child_timeout_s", type=float, default=0.0)
    ap.add_argument("--term_grace_s", type=float, default=180.0)
    if "-h" in sys.argv or "--help" in sys.argv:
        # -h falls through to the Config parser below; surface the
        # supervisor's own knobs first so they aren't invisible
        print("supervisor flags: --max_retries N (default 3), "
              "--child_timeout_s S (0 = none), --term_grace_s S "
              "(default 180)\nall other flags pass through to cli.main "
              "(one child per epoch):\n")
    chain_ns, rest = ap.parse_known_args(sys.argv[1:])
    cfg = parse_config(rest)
    run_chain(
        cfg,
        max_retries=chain_ns.max_retries,
        child_timeout_s=chain_ns.child_timeout_s,
        term_grace_s=chain_ns.term_grace_s,
    )


if __name__ == "__main__":
    cli_entry()
