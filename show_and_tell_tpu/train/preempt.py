"""Preemption-safe training: convert SIGTERM/SIGINT into a clean save.

TPU pods (and most cluster schedulers) preempt with a SIGTERM and a short
grace window before SIGKILL. The reference has no story for this — an
interrupted train.py loses everything since its last periodic checkpoint.
Here a :class:`PreemptionGuard` turns the signal into a flag; the Trainer
checks it after every step, finishes the in-flight device work, persists
the FULL train state (params + Adam moments + step — the same artifact the
periodic checkpoint writes, ckpt/checkpoint.py) plus the resume infos, and
returns. Restarting with ``--start_from`` then continues bit-continuously
(pinned by tests/test_train.py::test_preemption_resume_bit_continuous).

The guard is a context manager so the previous handlers are always
restored; outside the main thread (where CPython forbids ``signal.signal``)
it degrades to the programmatic ``trigger()`` path, which external
schedulers or tests can call directly.
"""

from __future__ import annotations

import logging
import signal
import threading
from typing import Optional

log = logging.getLogger(__name__)


class PreemptionGuard:
    """Latches termination signals; query with ``triggered``."""

    SIGNALS = (signal.SIGTERM, signal.SIGINT)

    def __init__(self):
        self._event = threading.Event()
        self._prev: dict = {}
        self._installed = False

    # -- signal plumbing ------------------------------------------------

    def __enter__(self) -> "PreemptionGuard":
        if threading.current_thread() is threading.main_thread():
            for s in self.SIGNALS:
                self._prev[s] = signal.signal(s, self._handler)
            self._installed = True
        else:  # signal.signal is main-thread-only; trigger() still works
            log.debug("PreemptionGuard outside main thread: signals not hooked")
        return self

    def __exit__(self, *exc) -> None:
        if self._installed:
            for s, prev in self._prev.items():
                signal.signal(s, prev)
            self._prev.clear()
            self._installed = False

    def _handler(self, signum, frame) -> None:
        # Latch FIRST: logging from a signal handler can raise a reentrant-
        # call RuntimeError if the signal lands while the main thread is
        # mid-write in a (locked, buffered) logging stream — the event must
        # already be set when that happens or the clean save never runs
        # (review fix). The log call itself is best-effort for the same
        # reason.
        self._event.set()
        try:
            log.warning(
                "received %s: finishing the in-flight step, then saving "
                "train state for resume", signal.Signals(signum).name,
            )
        except RuntimeError:
            pass  # reentrant stream write: the latch is what matters
        # One latch only: restore the previous handlers so a SECOND signal
        # behaves normally (KeyboardInterrupt / default termination). The
        # flag is polled between steps — if the process is hung anywhere
        # else (data loader, wedged device call), a repeat Ctrl+C must
        # still be able to kill it rather than requiring SIGKILL.
        if self._installed:
            for s, prev in self._prev.items():
                signal.signal(s, prev)
            self._prev.clear()
            self._installed = False

    # -- API ------------------------------------------------------------

    def trigger(self) -> None:
        """Programmatic preemption (tests, cluster-notice watchers)."""
        self._event.set()

    @property
    def triggered(self) -> bool:
        return self._event.is_set()
