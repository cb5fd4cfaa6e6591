"""Unit tests for the round-over-round bench tooling (no Spark session):
tools/bench_diff.py tier pairing (ADVICE r12) and tools/rebench_flagged.py
flag parsing (VERDICT r12 item 3)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.bench_diff import canon_tiers  # noqa: E402
from tools.rebench_flagged import parse_flags  # noqa: E402


def test_canon_tiers_pairs_demo_rename_across_rounds():
    """A query demoted to the demo: tier in round N must still pair with
    its bare-named round N-1 line (the r11->r12 grouped_zscore rename
    dropped it from the common set for one round)."""
    old = {"grouped_zscore": 1.0, "q01": 2.0}
    new = {"demo:grouped_zscore": 1.1, "q01": 2.1}
    o, n = canon_tiers(old), canon_tiers(new)
    assert set(o) & set(n) == {"grouped_zscore", "q01"}
    assert n["grouped_zscore"] == 1.1


def test_canon_tiers_keeps_collisions_and_staging_untouched():
    # a bare twin on the SAME side means two genuinely different lines
    both = {"demo:x": 1.0, "x": 2.0, "staging:y": 3.0}
    got = canon_tiers(both)
    assert got == both  # collision: demo:x NOT renamed; staging: never stripped


def test_parse_flags_extracts_fail_list(tmp_path):
    p = tmp_path / "diff.txt"
    p.write_text(
        "common set: 10 queries\n"
        "FAIL: 3 per-query regressions > 1.25x: a_query, b_query, c_query\n"
        "FAIL: common-set total 1.2x > 1.15x\n"
    )
    assert parse_flags(str(p)) == ["a_query", "b_query", "c_query"]


def test_parse_flags_empty_when_pass(tmp_path):
    p = tmp_path / "diff.txt"
    p.write_text("common set: 10 queries\nPASS\n")
    assert parse_flags(str(p)) == []
