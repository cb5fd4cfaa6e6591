"""S7 executed for real: ``df.write.jdbc`` against embedded Derby
(derby-10.16 ships in pyspark's jars — no external DB needed).

The reference's MySQL sink (proc:259-283) is: READ_COMMITTED connection,
first-batch DROP TABLE reset (proc:270-279), ``repartition(10)`` +
SaveMode.Append (proc:282). These tests run that exact shape end-to-end:
batch round-trip, and the streaming foreachBatch path with a pre-polluted
target table proving the batch-0 reset.

Derby quirk: Spark's DerbyDialect maps StringType to CLOB, and Derby cannot
compare CLOB columns with ``=`` — so assertions collect() and compare in
Python instead of pushing string predicates down.
"""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F

from realtime_twitter_trends_analytics_spark.sources.loaders import load_table
from realtime_twitter_trends_analytics_spark.streaming.pipeline import (
    jdbc_sink_writer,
    read_raw_stream,
    transform_tweets,
    write_with_first_batch_setup,
)
from test_streaming import FIXTURE_MESSAGES

DERBY_PROPS = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


def test_jdbc_batch_roundtrip(spark, sf_dir):
    url = "jdbc:derby:memory:batchdb;create=true"
    nation = load_table(spark, sf_dir, "nation")
    nation.write.jdbc(url, "nation_t", mode="overwrite", properties=DERBY_PROPS)
    back = spark.read.jdbc(url, "nation_t", properties=DERBY_PROPS)
    key = lambda rows: sorted((r["n_nationkey"], r["n_name"], r["n_regionkey"]) for r in rows)
    assert key(back.collect()) == key(nation.collect())


def test_jdbc_streaming_sink_with_first_batch_reset(spark, tmp_path):
    url = "jdbc:derby:memory:streamdb;create=true"
    table = "trends_t"

    # Pollute the target: rows that MUST disappear after the batch-0
    # overwrite (the proc:270-279 DROP TABLE reset).
    junk = spark.createDataFrame(
        [("1970-01-01 00:00:00", "#junk", -1.0, "notunderstood", "NULL")],
        "ts STRING, hashtag STRING, sentiment_score DOUBLE, sentiment_type STRING, country STRING",
    ).withColumn("ts", F.to_timestamp("ts"))
    junk.write.jdbc(url, table, mode="overwrite", properties=DERBY_PROPS)

    src = tmp_path / "stream_src"
    src.mkdir()
    for i, chunk in enumerate([FIXTURE_MESSAGES[:5], FIXTURE_MESSAGES[5:]]):
        with open(src / f"batch_{i}.json", "w") as f:
            for ts, value in chunk:
                f.write(json.dumps({"key": str(ts), "value": value}) + "\n")

    raw = read_raw_stream(spark, source_dir=str(src))
    scored = transform_tweets(raw, ts_col=F.timestamp_seconds(F.col("key").cast("long")))
    q = write_with_first_batch_setup(
        scored,
        str(tmp_path / "ckpt"),
        jdbc_sink_writer(url, table, DERBY_PROPS),
        output_mode="append",
    )
    q.awaitTermination(120)

    rows = spark.read.jdbc(url, table, properties=DERBY_PROPS).collect()
    tags = {r["hashtag"] for r in rows}
    assert "#junk" not in tags  # batch-0 reset wiped the pre-existing rows
    assert "#Celtics" in tags and "#a1" in tags
    # both micro-batches landed (file 1 has #Celtics/#batman, file 2 #a1)
    assert "#batman" in tags
    celtics = [r for r in rows if r["hashtag"] == "#Celtics"]
    assert {r["country"] for r in celtics} == {"USA"}
    # row count matches the batch analogue of the same transform
    batch_raw = spark.read.schema("key STRING, value STRING").json(str(src))
    want = transform_tweets(
        batch_raw, ts_col=F.timestamp_seconds(F.col("key").cast("long"))
    ).count()
    assert len(rows) == want
