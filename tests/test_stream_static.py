"""Stream-static join (dimension enrichment inside a streaming query) and
dropDuplicatesWithinWatermark (state-bounded streaming dedup by key).

The stream-static join is the streaming form of the broadcast dim join:
the static side is re-planned per micro-batch, never shuffled as state.
dropDuplicatesWithinWatermark is the scale-correct cross-batch dedup —
unlike plain dropDuplicates on a streaming DF, its state is evicted once
the watermark passes, so key-cardinality does not grow without bound."""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import functions as F

from realtime_twitter_trends_analytics_spark.streaming.pipeline import (
    read_raw_stream,
    transform_tweets,
)

BASE_TS = 1_700_000_000


@pytest.fixture()
def dup_src_dir(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    batches = [
        # b0: two tweets, '#a' twice at the same second (in-batch dup)
        [
            (BASE_TS, "u1 /TLOC/ #a hello"),
            (BASE_TS, "u2 /TLOC/ #a hello"),
            (BASE_TS + 1, "u3 /TLOC/ #b other"),
        ],
        # b1: '#a' again at the same event second (cross-batch dup, within
        # the watermark) + a later anchor that advances the watermark
        [
            (BASE_TS, "u4 /TLOC/ #a hello"),
            (BASE_TS + 3600, "u5 /TLOC/ #anchor later"),
        ],
    ]
    for i, chunk in enumerate(batches):
        with open(src / f"b{i}.json", "w") as f:
            for ts, value in chunk:
                f.write(json.dumps({"key": str(ts), "value": value}) + "\n")
        os.utime(src / f"b{i}.json", (1_000_000_000 + i * 100,) * 2)
    return str(src)


def test_stream_static_join_enriches_from_dim(spark, dup_src_dir, tmp_path):
    """Streaming hashtags joined to a static category dim: every output
    row carries the dim attribute; rows with no dim match drop (inner)."""
    raw = read_raw_stream(spark, source_dir=dup_src_dir)
    tweets = transform_tweets(
        raw, ts_col=F.timestamp_seconds(F.col("key").cast("long"))
    )
    dim = spark.createDataFrame(
        [("#a", "alpha"), ("#b", "beta")], ["hashtag", "category"]
    )
    joined = tweets.join(F.broadcast(dim), "hashtag")
    q = (
        joined.writeStream.format("memory")
        .queryName("t_ss_join")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table("t_ss_join").collect()
    got = {(r["hashtag"], r["category"]) for r in rows}
    assert got == {("#a", "alpha"), ("#b", "beta")}
    # the '#anchor' row had no dim entry -> inner join dropped it
    assert len(rows) == 4  # 3x '#a' + 1x '#b'


def test_drop_duplicates_within_watermark(spark, dup_src_dir, tmp_path):
    """(hashtag, ts) dups collapse across micro-batches while inside the
    watermark; state for expired keys is evicted (bounded, unlike plain
    streaming dropDuplicates)."""
    raw = read_raw_stream(spark, source_dir=dup_src_dir)
    tweets = transform_tweets(
        raw, ts_col=F.timestamp_seconds(F.col("key").cast("long"))
    )
    deduped = (
        tweets.select("hashtag", "ts")
        .withWatermark("ts", "30 minutes")
        .dropDuplicatesWithinWatermark(["hashtag", "ts"])
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName("t_ddww")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["hashtag"], r["ts"].timestamp()) for r in spark.table("t_ddww").collect()
    )
    # '#a'@BASE_TS appeared 3 times (twice in b0, once in b1) -> exactly one
    assert got == sorted(
        [("#a", float(BASE_TS)), ("#b", float(BASE_TS + 1)), ("#anchor", float(BASE_TS + 3600))]
    )
