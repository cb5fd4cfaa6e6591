"""stats_correlation_matrix: the exact-moment Pearson r must reproduce
numpy's corrcoef on the same cent-quantized data (the independent
reference — same precedent as test_normal_equations_solve_matches_numpy),
and the matrix must satisfy the structural invariants |r| <= 1 and
symmetry-by-construction (each unordered pair reported once)."""

from __future__ import annotations

import numpy as np

from realtime_twitter_trends_analytics_spark.operators.analytics_ext import (
    CORR_COLS,
    stats_correlation_matrix,
)
from realtime_twitter_trends_analytics_spark.sources.loaders import load_table


def test_corr_matches_numpy(spark, sf_dir):
    got = {
        (r["col_a"], r["col_b"]): r["corr"]
        for r in stats_correlation_matrix(spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem").select(*CORR_COLS).collect()
    cents = np.array(
        [[round(row[c] * 100) for c in CORR_COLS] for row in li], dtype=np.float64
    )
    ref = np.corrcoef(cents, rowvar=False)
    assert len(got) == len(CORR_COLS) * (len(CORR_COLS) - 1) // 2
    for (a, b), r in got.items():
        i, j = CORR_COLS.index(a), CORR_COLS.index(b)
        assert i < j, "each unordered pair reported exactly once, a before b"
        assert abs(r) <= 1.0 + 1e-9
        assert abs(r - ref[i, j]) < 1e-6, (a, b, r, ref[i, j])
