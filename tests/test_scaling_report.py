"""tools/scaling_bench.py report generation: the --report-only path must
tolerate legacy raw_*.json files written before per-pass data (all_passes)
was persisted (round-6 ADVICE) instead of crashing on KeyError/ValueError."""

from __future__ import annotations

import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_mod():
    spec = importlib.util.spec_from_file_location(
        "scaling_bench", os.path.join(REPO, "tools", "scaling_bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["scaling_bench"] = mod
    spec.loader.exec_module(mod)
    return mod


def _rec(rps, total, queries, rows=1000000):
    return {
        "rows_per_sec": rps,
        "value": total,
        "queries": queries,
        "rows": rows,
        "sf": 0.1,
    }


def test_write_report_without_all_passes(tmp_path, monkeypatch):
    """Legacy records (no all_passes) degrade to best-per-level paired
    stats instead of raising."""
    mod = _load_mod()
    monkeypatch.setattr(mod, "REPO", str(tmp_path))
    lo = _rec(100.0, 40.0, {"q1": 30.0, "q2": 10.0})
    hi = _rec(320.0, 12.5, {"q1": 9.5, "q2": 3.0})
    mod.write_report(
        lo, hi, 2, 8, runs=3, rest=120, pin=True,
        cap={2: 1.0, 8: 3.9}, cap_ratio=3.9, sus=None, sus_ratio=None,
        sustained=0.0, mult="32",
    )
    md = open(tmp_path / "BENCH" / "BASELINE.md").read()
    assert "SAME-PASS paired efficiency" in md
    # paired degenerates to the single best-per-level quotient
    assert "0.800" in md  # 320 / (4 * 100)


def test_write_report_with_passes_median_and_paired(tmp_path, monkeypatch):
    mod = _load_mod()
    monkeypatch.setattr(mod, "REPO", str(tmp_path))
    lo = _rec(100.0, 40.0, {"q1": 30.0, "q2": 10.0})
    hi = _rec(350.0, 12.0, {"q1": 9.0, "q2": 3.0})
    lo["all_passes"] = [_rec(r, 40.0, {"q1": 30.0, "q2": 10.0}) for r in (100, 95, 90)]
    hi["all_passes"] = [_rec(r, 12.0, {"q1": 9.0, "q2": 3.0}) for r in (200, 300, 350)]
    mod.write_report(
        lo, hi, 2, 8, runs=3, rest=120, pin=True,
        cap={2: 1.0, 8: 3.9}, cap_ratio=3.9, sus={2: 1.0, 8: 3.8},
        sus_ratio=3.8, sustained=75.0, mult="32",
    )
    md = open(tmp_path / "BENCH" / "BASELINE.md").read()
    # per-pass paired quotients 0.5, 0.789, 0.972 -> best 0.972 at pass 2
    assert "0.972" in md and "pass 2" in md
    # every query's input scales now: no mult-fixed exclusion text
    assert "mult-FIXED" not in md
