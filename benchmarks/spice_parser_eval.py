"""Measure the built-in SPICE parser against the hand-labeled golden set.

VERDICT r2 item 2b: "SPICE computes" is only meaningful with a number on
how faithful the parser is. This evaluates `metrics/scene_graph.parse`
against `tests/data/spice_parser_golden.json` (100 captions hand-labeled
with the semantically correct SPICE tuples, independent of the parser) and
reports micro precision/recall/F1 per difficulty tier and overall.

Comparison is Porter-stem element equality with EXACT tuple match (no
synonym credit): this measures the parser, not the matcher.

Run: python benchmarks/spice_parser_eval.py
The measured numbers are pinned in tests/test_deviation_bounds.py and
published in docs/PARITY.md ("Quantified deviations").
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from show_and_tell_tpu.metrics.scene_graph import parse, _norm  # noqa: E402

GOLDEN = os.path.join(
    os.path.dirname(__file__), "..", "tests", "data", "spice_parser_golden.json"
)


def _stem_tuples(tuples):
    """Stem GOLD tuples into parse()'s element space. parse() output is
    already Porter-normalized — stemming it again would double-stem
    ('horse' -> 'hors' -> 'hor') and miss every match."""
    return {tuple(_norm(e) for e in t) for t in tuples}


def evaluate(golden_path: str = GOLDEN) -> dict:
    with open(golden_path) as f:
        entries = json.load(f)["entries"]
    tiers: dict = {}
    for e in entries:
        gold = _stem_tuples(e["gold"])
        pred = set(parse(e["caption"]))
        hit = len(gold & pred)
        t = tiers.setdefault(
            e["difficulty"], {"tp": 0, "pred": 0, "gold": 0, "n": 0}
        )
        t["tp"] += hit
        t["pred"] += len(pred)
        t["gold"] += len(gold)
        t["n"] += 1

    def prf(t):
        p = t["tp"] / t["pred"] if t["pred"] else 0.0
        r = t["tp"] / t["gold"] if t["gold"] else 0.0
        f = 2 * p * r / (p + r) if p + r else 0.0
        return {"n": t["n"], "precision": round(p, 4), "recall": round(r, 4),
                "f1": round(f, 4), "tp": t["tp"], "pred": t["pred"],
                "gold": t["gold"]}

    overall = {"tp": 0, "pred": 0, "gold": 0, "n": 0}
    for t in tiers.values():
        for k in overall:
            overall[k] += t[k]
    report = {tier: prf(t) for tier, t in sorted(tiers.items())}
    report["overall"] = prf(overall)
    return report


def worst_cases(golden_path: str = GOLDEN, k: int = 10):
    """The k captions with the lowest per-caption F1 — the error catalogue."""
    with open(golden_path) as f:
        entries = json.load(f)["entries"]
    rows = []
    for e in entries:
        gold = _stem_tuples(e["gold"])
        pred = set(parse(e["caption"]))
        hit = len(gold & pred)
        p = hit / len(pred) if pred else 0.0
        r = hit / len(gold) if gold else 0.0
        f = 2 * p * r / (p + r) if p + r else 0.0
        rows.append((f, e["caption"], sorted(gold - pred), sorted(pred - gold)))
    rows.sort(key=lambda x: x[0])
    return rows[:k]


if __name__ == "__main__":
    if "--all" in sys.argv:
        # the docs/PARITY.md table source: golden + every blind batch
        data_dir = os.path.join(os.path.dirname(GOLDEN))
        names = ["spice_parser_golden.json"] + sorted(
            f for f in os.listdir(data_dir)
            if f.startswith("spice_parser_blind40")
        )
        for name in names:
            r = evaluate(os.path.join(data_dir, name))
            print(
                f"{name:38} n={r['overall']['n']:3d} "
                f"F1={r['overall']['f1']:.4f} "
                f"(easy {r['easy']['f1']:.3f} / med {r['medium']['f1']:.3f}"
                f" / hard {r['hard']['f1']:.3f})"
            )
    else:
        print(json.dumps(evaluate(), indent=2))
    if "--worst" in sys.argv:
        for f, cap, missed, spurious in worst_cases():
            print(f"\nF1={f:.2f}  {cap}\n  missed:   {missed}\n  spurious: {spurious}")
