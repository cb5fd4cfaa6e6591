"""Bloom-prefiltered decontamination: exactness + plan shape.

The sketch must be invisible in the RESULT (no false negatives + exact
confirm join => identical output to the exact operator) and visible in the
PLAN (the bitmap rides as a broadcast; the train side is filtered before
its only shuffle).
"""

from __future__ import annotations

from realtime_twitter_trends_analytics_spark.operators.dedup import (
    decontaminate_bloom,
    decontaminate_ngram_overlap,
)


def test_bloom_equals_exact(spark, sf_dir):
    exact = {
        r["doc_id"]: (r["n_shingles"], r["n_overlap"], r["contamination"])
        for r in decontaminate_ngram_overlap(spark, sf_dir).collect()
    }
    bloom = {
        r["doc_id"]: (r["n_shingles"], r["n_overlap"], r["contamination"])
        for r in decontaminate_bloom(spark, sf_dir).collect()
    }
    assert exact and bloom == exact


def test_bloom_bitmap_is_broadcast(spark, sf_dir):
    plan = (
        decontaminate_bloom(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # both word-index probes join broadcast-side (plus the tiny hit join
    # Catalyst may also broadcast); never a shuffle of the bitmap
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan
