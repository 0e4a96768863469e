"""int8 quality-acceptance gate (VERDICT r4 item 4, bench.py).

The graded bench may only advertise the int8 speedup while held-out
quality stays within the stated bounds of bf16 (exact rate >= 0.9x,
CIDEr >= 0.95x). VERDICT's done-criterion: the gate must be RED at 2x
the allowed drop.
"""

import sys
import os

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import (  # noqa: E402
    INT8_CIDER_MIN_RATIO,
    INT8_EXACT_MIN_RATIO,
    int8_quality_gate,
)


def test_gate_passes_at_pin_time_measurements():
    # round-4 measured values: exact 0.3359 int8 vs 0.3555 bf16 (-5.5%)
    rec = int8_quality_gate(0.3555, 3.86, 0.3359, 3.80)
    assert rec["pass"]
    assert rec["exact_ratio_int8_vs_bf16"] == pytest.approx(0.9449, abs=1e-3)
    assert rec["bounds"] == {
        "exact_min_ratio": INT8_EXACT_MIN_RATIO,
        "cider_min_ratio": INT8_CIDER_MIN_RATIO,
    }


def test_gate_red_at_twice_the_allowed_exact_drop():
    # allowed exact drop = 10%; 2x = 20% -> must raise
    with pytest.raises(AssertionError, match="int8 quality gate FAILED"):
        int8_quality_gate(0.40, 4.0, 0.40 * (1 - 2 * (1 - INT8_EXACT_MIN_RATIO)), 4.0)


def test_gate_red_at_twice_the_allowed_cider_drop():
    # allowed CIDEr drop = 5%; 2x = 10% -> must raise
    with pytest.raises(AssertionError, match="int8 quality gate FAILED"):
        int8_quality_gate(0.40, 4.0, 0.40, 4.0 * (1 - 2 * (1 - INT8_CIDER_MIN_RATIO)))


def test_gate_boundary_inclusive():
    # exactly at the bound passes (>=, not >) — a hairline measurement
    # should not flap the graded bench
    rec = int8_quality_gate(
        0.40, 4.0, 0.40 * INT8_EXACT_MIN_RATIO, 4.0 * INT8_CIDER_MIN_RATIO
    )
    assert rec["pass"]


def test_gate_degenerate_zero_bf16_is_neutral():
    # a zero bf16 score cannot produce a meaningful ratio; the gate must
    # not divide by zero or fail spuriously
    assert int8_quality_gate(0.0, 0.0, 0.0, 0.0)["pass"]
