"""S4/S5 Kafka path: the sandbox has no broker, no network, and no
spark-sql-kafka connector jar (COVERAGE.md documents the triple blocker),
so the wire itself cannot be exercised here. This file spends the blocker
down as far as the environment allows (VERDICT r6 item 6):

- an options-surface SNAPSHOT test that pins the exact reader contract
  read_raw_stream emits for Kafka (format, bootstrap servers, subscribe,
  startingOffsets, key/value casts) without needing the connector — a
  regression in the Kafka branch fails HERE, today;
- a skipif-gated END-TO-END test (produce via the batch Kafka sink, drain
  via readStream -> transform chain) that runs automatically the day the
  environment provides the jar + a broker, with zero code changes.

Reference parity: consumer subscribe/offsets proc:75-88, producer
prod:79-91. The offset-replay CONTRACT (resume from committed offsets,
no loss/dup) is proven engine-side by the custom Python streaming
DataSource (tests/test_python_datasource.py) — that is the semantics;
this file covers the connector surface.
"""

from __future__ import annotations

import glob
import os
import socket

import pytest

from realtime_twitter_trends_analytics_spark.streaming.pipeline import read_raw_stream


# ---------------------------------------------------------------- recorder
class _Rec:
    """Minimal stand-in for DataStreamReader/DataFrame that records the
    builder chain read_raw_stream drives, so the Kafka branch is testable
    without the connector jar resolving the 'kafka' format."""

    def __init__(self, log: dict):
        self.log = log

    def format(self, f):
        self.log["format"] = f
        return self

    def option(self, k, v):
        self.log.setdefault("options", {})[k] = v
        return self

    def load(self):
        return self

    def selectExpr(self, *exprs):
        self.log["selectExpr"] = list(exprs)
        return self


class _FakeSpark:
    def __init__(self, log: dict):
        self._log = log

    @property
    def readStream(self):
        return _Rec(self._log)


def test_kafka_reader_options_snapshot():
    log: dict = {}
    out = read_raw_stream(
        _FakeSpark(log), kafka_servers="broker1:9092,broker2:9092", topics="tweets"
    )
    assert out is not None
    assert log["format"] == "kafka"
    assert log["options"] == {
        "kafka.bootstrap.servers": "broker1:9092,broker2:9092",
        "subscribe": "tweets",
        # latest + checkpointed offsets == the reference's manual-commit
        # intent (proc:80-81): progress lives in the checkpoint, not in
        # Kafka's auto-commit
        "startingOffsets": "latest",
    }
    assert log["selectExpr"] == [
        "CAST(key AS STRING) AS key",
        "CAST(value AS STRING) AS value",
    ]


# ---------------------------------------------------------------- e2e gate
def _kafka_jar_present() -> bool:
    try:
        import pyspark

        jars = os.path.join(os.path.dirname(pyspark.__file__), "jars")
        return bool(glob.glob(os.path.join(jars, "spark-sql-kafka-0-10*.jar")))
    except Exception:
        return False


def _broker() -> str | None:
    cand = os.environ.get("KAFKA_BOOTSTRAP", "localhost:9092")
    host, _, port = cand.partition(":")
    try:
        with socket.create_connection((host, int(port or 9092)), timeout=2):
            return cand
    except OSError:
        return None


HAVE_KAFKA = _kafka_jar_present() and _broker() is not None


@pytest.mark.skipif(
    not HAVE_KAFKA,
    reason="needs spark-sql-kafka-0-10 jar + reachable broker "
    "(set KAFKA_BOOTSTRAP; sandbox has neither — COVERAGE.md)",
)
def test_kafka_roundtrip_end_to_end(spark, tmp_path):
    """Produce tweets through the batch Kafka sink, drain them through
    read_raw_stream -> transform_tweets into a memory sink: the full
    S4 (producer) + S5 (consumer) wire, self-verifying wherever the
    environment provides Kafka."""
    from pyspark.sql import functions as F

    from realtime_twitter_trends_analytics_spark.streaming.pipeline import (
        transform_tweets,
    )

    broker = _broker()
    topic = f"rtta_test_{os.getpid()}"
    spark.createDataFrame(
        [("1700000000", "alice, Austin /TLOC/ #spark streaming rocks")],
        "key string, value string",
    ).write.format("kafka").option("kafka.bootstrap.servers", broker).option(
        "topic", topic
    ).save()

    # earliest: the row above was produced before the stream started. This
    # drives the PRODUCTION read_raw_stream path (the reader under test),
    # not a hand-built copy of it.
    raw = read_raw_stream(
        spark, kafka_servers=broker, topics=topic, starting_offsets="earliest"
    )
    scored = transform_tweets(
        raw, ts_col=F.timestamp_seconds(F.col("key").cast("long"))
    )
    q = (
        scored.writeStream.format("memory")
        .queryName("kafka_e2e")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM kafka_e2e").collect()
    # expectation = the batch path on the same payload (unified API:
    # transform_tweets is the same plan batch or streaming)
    expect = transform_tweets(
        spark.createDataFrame(
            [("1700000000", "alice, Austin /TLOC/ #spark streaming rocks")],
            "key string, value string",
        ),
        ts_col=F.timestamp_seconds(F.col("key").cast("long")),
    ).collect()
    assert [r.asDict() for r in rows] == [r.asDict() for r in expect]
