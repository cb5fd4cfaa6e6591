"""applyInPandasWithState: cumulative per-key state across micro-batches."""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F

from realtime_twitter_trends_analytics_spark.streaming.pipeline import (
    read_raw_stream,
    transform_tweets,
)
from realtime_twitter_trends_analytics_spark.streaming.stateful import (
    lifetime_hashtag_counts,
    lifetime_hashtag_counts_tws,
)

BASE_TS = 1_700_000_000


@pytest.fixture()
def three_batch_dir(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    batches = [
        [(BASE_TS + 0, "a, b /TLOC/ #tag one"), (BASE_TS + 1, "a, b /TLOC/ #tag two")],
        [(BASE_TS + 20, "a, b /TLOC/ #tag three"), (BASE_TS + 21, "a, b /TLOC/ #other x")],
        [(BASE_TS + 40, "a, b /TLOC/ #tag four")],
    ]
    for i, chunk in enumerate(batches):
        with open(src / f"b{i}.json", "w") as f:
            for ts, value in chunk:
                f.write(json.dumps({"key": str(ts), "value": value}) + "\n")
    return str(src)


def _tws_available() -> bool:
    # transformWithStateInPandas drives its state protocol over protobuf;
    # the container has no google.protobuf (and no network to fetch it) —
    # the API itself is present, the wire dependency is not.
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.parametrize(
    "op",
    [
        lifetime_hashtag_counts,
        pytest.param(
            lifetime_hashtag_counts_tws,
            marks=pytest.mark.skipif(
                not _tws_available(),
                reason="google.protobuf missing in container (tws state protocol)",
            ),
        ),
    ],
)
def test_lifetime_counts_accumulate_across_batches(spark, three_batch_dir, tmp_path, op):
    raw = read_raw_stream(spark, source_dir=three_batch_dir)
    scored = transform_tweets(raw, ts_col=F.timestamp_seconds(F.col("key").cast("long")))
    counts = op(scored)
    q = (
        counts.writeStream.format("memory")
        .queryName("t_lifetime")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table("t_lifetime").collect()
    # one row per active key per trigger; file-source batch ORDER is not
    # deterministic, so assert order-free invariants: final lifetime total,
    # per-trigger delta multiset, and totals == cumulative sums of deltas.
    tag_rows = sorted(
        [r for r in rows if r["hashtag"] == "#tag"], key=lambda r: r["lifetime_count"]
    )
    assert len(tag_rows) == 3  # three micro-batches touched #tag
    assert tag_rows[-1]["lifetime_count"] == 4
    assert sorted(r["batch_delta"] for r in tag_rows) == [1, 1, 2]
    running = 0
    deltas_in_order = []
    for r in tag_rows:
        deltas_in_order.append(r["lifetime_count"] - running)
        running = r["lifetime_count"]
    assert deltas_in_order == [r["batch_delta"] for r in tag_rows]
    other = [r for r in rows if r["hashtag"] == "#other"]
    assert len(other) == 1 and other[0]["lifetime_count"] == 1
