"""Semantics tests for the data-layout operators (z-order locality,
histogram totals, SCD2 range chaining)."""

from __future__ import annotations

import datetime

from realtime_twitter_trends_analytics_spark.operators.layout import (
    SCD_OPEN_END,
    events_value_histogram,
    layout_zorder_key,
    orders_scd_ranges,
)
from realtime_twitter_trends_analytics_spark.sources.loaders import load_table


def test_zorder_blocks_are_local(spark, sf_dir):
    blocks = layout_zorder_key(spark, sf_dir).collect()
    assert len(blocks) > 1
    global_area = (
        (max(b["max_user"] for b in blocks) - min(b["min_user"] for b in blocks) + 1)
        * (max(b["max_hour"] for b in blocks) - min(b["min_hour"] for b in blocks) + 1)
    )
    # the point of z-ordering: each block's (user, hour) bounding box is a
    # small fraction of the global box, so min/max footers prune most blocks
    mean_area = sum(b["bbox_area"] for b in blocks) / len(blocks)
    assert mean_area < 0.5 * global_area


def test_histogram_partitions_all_events(spark, sf_dir):
    hist = events_value_histogram(spark, sf_dir).collect()
    n_events = load_table(spark, sf_dir, "events").count()
    assert sum(r["n_events"] for r in hist) == n_events
    for r in hist:
        assert r["bucket_hi"] - r["bucket_lo"] == 25


def test_scd_ranges_chain_per_customer(spark, sf_dir):
    rows = orders_scd_ranges(spark, sf_dir).collect()
    open_end = datetime.date.fromisoformat(SCD_OPEN_END)
    by_cust: dict[int, list] = {}
    for r in rows:
        by_cust.setdefault(r["o_custkey"], []).append(r)
    for hist in by_cust.values():
        hist.sort(key=lambda r: (r["effective_from"], r["o_orderkey"]))
        # exactly one open-ended current row per customer, and it is the last
        assert sum(r["is_current"] for r in hist) == 1
        assert hist[-1]["is_current"] == 1
        assert hist[-1]["effective_to"] == open_end
        for prev, nxt in zip(hist, hist[1:]):
            assert prev["effective_to"] == nxt["effective_from"] - datetime.timedelta(
                days=1
            )
