"""Stream-stream join (A5's true streaming form): the reference planned to
join its counts stream with its sentiment stream (proc:92-93, dormant).
Structured Streaming joins two watermarked streams directly, with a
time-range condition bounding the buffered state on both sides."""

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
def two_stream_dirs(tmp_path):
    """Two sources: 'tweets' and a 'promo' side-channel keyed by hashtag."""
    tweets = tmp_path / "tweets"
    promos = tmp_path / "promos"
    tweets.mkdir()
    promos.mkdir()
    with open(tweets / "b0.json", "w") as f:
        for off, value in [
            (0, "a, b /TLOC/ fast game #Celtics"),
            (10, "a, b /TLOC/ slow day #NBA"),
            (20, "a, b /TLOC/ whatever #untracked"),
        ]:
            f.write(json.dumps({"key": str(BASE_TS + off), "value": value}) + "\n")
    with open(promos / "b0.json", "w") as f:
        for off, tag, campaign in [(5, "#Celtics", "c1"), (15, "#NBA", "c2"), (4000, "#Celtics", "late")]:
            f.write(json.dumps({"key": str(BASE_TS + off), "value": f"{tag}|{campaign}"}) + "\n")
    return str(tweets), str(promos)


def test_stream_stream_join_with_time_bound(spark, two_stream_dirs, tmp_path):
    tweets_dir, promos_dir = two_stream_dirs
    scored = transform_tweets(
        read_raw_stream(spark, source_dir=tweets_dir),
        ts_col=F.timestamp_seconds(F.col("key").cast("long")),
    ).withWatermark("ts", "1 minute")

    promo_raw = read_raw_stream(spark, source_dir=promos_dir)
    promos = (
        promo_raw.select(
            F.timestamp_seconds(F.col("key").cast("long")).alias("promo_ts"),
            F.split(F.col("value"), r"\|").getItem(0).alias("promo_tag"),
            F.split(F.col("value"), r"\|").getItem(1).alias("campaign"),
        )
        .withWatermark("promo_ts", "1 minute")
    )

    joined = scored.join(
        promos,
        (F.col("hashtag") == F.col("promo_tag"))
        & (F.col("promo_ts") >= F.col("ts") - F.expr("INTERVAL 30 SECONDS"))
        & (F.col("promo_ts") <= F.col("ts") + F.expr("INTERVAL 30 SECONDS")),
        "inner",
    )

    q = (
        joined.writeStream.format("memory")
        .queryName("t_ssj")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table("t_ssj").collect()
    got = {(r["hashtag"], r["campaign"]) for r in rows}
    # in-window promo matches join; the 'late' promo (>30s away) must not;
    # '#untracked' has no promo side
    assert got == {("#Celtics", "c1"), ("#NBA", "c2")}


@pytest.fixture()
def tweets_with_anchor(tmp_path):
    """Window data in b0, then an anchor 1h ahead in b1 so the watermark
    passes the early windows and append mode finalizes them."""
    src = tmp_path / "tweets2"
    src.mkdir()
    chunks = [
        [
            (0, "a, b /TLOC/ great fast #Celtics win"),
            (5, "a, b /TLOC/ bad slow #Celtics loss"),
            (12, "a, b /TLOC/ fine game #NBA tonight"),
        ],
        [(3600, "a, b /TLOC/ #anchor closes the early windows")],
    ]
    for i, chunk in enumerate(chunks):
        with open(src / f"b{i}.json", "w") as f:
            for off, value in chunk:
                f.write(json.dumps({"key": str(BASE_TS + off), "value": value}) + "\n")
        os.utime(src / f"b{i}.json", (1_000_000_000 + i * 100,) * 2)
    return str(src)


def _drain_append(df, name, ckpt):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_trend_sentiment_joined_matches_single_agg(spark, tweets_with_anchor, tmp_path):
    """A5 equivalence: the two-aggregation stream-stream join emits exactly
    the rows the fused single-agg trend_counts emits (same windows, same
    cnt, same mean) — three chained stateful operators, one watermark."""
    from realtime_twitter_trends_analytics_spark.streaming.pipeline import (
        trend_counts,
        trend_sentiment_joined,
    )

    def scored():
        return transform_tweets(
            read_raw_stream(spark, source_dir=tweets_with_anchor, max_files_per_trigger=1),
            ts_col=F.timestamp_seconds(F.col("key").cast("long")),
        )

    _drain_append(trend_sentiment_joined(scored()), "t_a5_joined", str(tmp_path / "c1"))
    _drain_append(trend_counts(scored()), "t_a5_fused", str(tmp_path / "c2"))

    key = lambda r: (r["window_start"], r["hashtag"])  # noqa: E731
    joined = {key(r): (r["cnt"], r["mean_sentiment"]) for r in spark.table("t_a5_joined").collect()}
    fused = {key(r): (r["cnt"], r["mean_sentiment"]) for r in spark.table("t_a5_fused").collect()}
    assert joined and joined == fused
    # sliding 60s/15s: each closed tweet lands in 4 windows per hashtag
    tags = {k[1] for k in joined}
    assert {"#Celtics", "#NBA"} <= tags
