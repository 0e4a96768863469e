"""Relay-leak reproducer harness (benchmarks/relay_leak_repro.py).

The committed finding (device backend leaks ~1.07 bytes/byte, CPU flat)
can only be reproduced with the device attached; what the suite can pin
is the harness itself: on the CPU backend the measured slope must be
~zero (a flat-RSS loop must not be misreported as a leak), and the
output schema the STATUS/upstream report cites must be stable.
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.relay_leak_repro import measure  # noqa: E402


def test_cpu_backend_measures_flat():
    # big enough that one-time allocator-arena growth (~tens of MB) can't
    # masquerade as a per-byte slope; the real leak measures ~1.07
    out = measure(n_iters=12, mb=32)
    assert out["backend"] == "cpu"
    assert out["iters"] == 12 and out["chunk_mb"] == 32
    assert len(out["rss_curve_gb"]) == 12
    # flat loop: an order of magnitude under the leaking backend's slope
    assert abs(out["leaked_bytes_per_transferred_byte"]) < 0.15, out
    # schema the committed JSON / STATUS cite
    assert {"transferred_gb", "rss_growth_gb",
            "leaked_bytes_per_transferred_byte"} <= set(out)
