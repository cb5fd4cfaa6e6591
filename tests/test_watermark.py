"""Watermark / late-data semantics (SURVEY §2.4 'Streaming: watermark'):
the reference stamped rows with processing time (proc:109) so late data was
silently miscounted; here late rows have DEFINED behavior — rows older than
the in-effect watermark are dropped (numRowsDroppedByWatermark) and closed
windows emit exactly once in append mode.

Watermarks advance at batch boundaries: a row that is late relative to data
in the SAME batch that advanced the watermark still lands (documented Spark
semantics), so the late row arrives two batches after its window's data.
"""

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
def late_data_dir(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    batches = [
        # b0: '#early' window data + an anchor 1h ahead (advances watermark)
        [(BASE_TS, "a, b /TLOC/ #early one"), (BASE_TS + 3600, "a, b /TLOC/ #anchor two")],
        # b1: watermark (anchor - 60s) now in effect
        [(BASE_TS + 3610, "a, b /TLOC/ #anchor mid")],
        # b2: 1h-late row for '#early' -> MUST be dropped by the watermark
        [(BASE_TS + 1, "a, b /TLOC/ #early too-late")],
    ]
    for i, chunk in enumerate(batches):
        with open(src / f"b{i}.json", "w") as f:
            for ts, value in chunk:
                f.write(json.dumps({"key": str(ts), "value": value}) + "\n")
        # FileStreamSource orders batches by mtime: pin strict order
        os.utime(src / f"b{i}.json", (1_000_000_000 + i * 100,) * 2)
    return str(src)


def test_watermark_drops_too_late_rows(spark, late_data_dir, tmp_path):
    raw = read_raw_stream(spark, source_dir=late_data_dir)
    scored = transform_tweets(raw, ts_col=F.timestamp_seconds(F.col("key").cast("long")))
    agg = (
        scored.withWatermark("ts", "60 seconds")
        .groupBy(F.window("ts", "60 seconds").alias("w"), "hashtag")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("t_wm")
        .outputMode("append")  # append emits only finalized (closed) windows
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {r["hashtag"]: r["cnt"] for r in spark.table("t_wm").collect()}
    # the 1h-late '#early' row in b2 was dropped: the closed window holds 1
    assert got.get("#early") == 1
    # the state operator accounted for exactly one watermark-dropped row
    dropped = sum(
        p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        if p["stateOperators"]
    )
    assert dropped == 1
