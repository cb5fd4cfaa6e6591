"""Streaming infrastructure: RocksDB state store (scale-grade state
backend) and observe() inline metrics (A3 done without a second job)."""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F

from realtime_twitter_trends_analytics_spark.streaming.pipeline import (
    observed,
    read_raw_stream,
    transform_tweets,
    trend_counts,
    use_rocksdb_state_store,
)

BASE_TS = 1_700_000_000


@pytest.fixture()
def src_dir(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    with open(src / "b0.json", "w") as f:
        for i in range(12):
            f.write(
                json.dumps(
                    {"key": str(BASE_TS + i), "value": f"a, b /TLOC/ #t{i % 3} hello"}
                )
                + "\n"
            )
    return str(src)


def test_rocksdb_state_store_runs_windowed_agg(spark, src_dir, tmp_path):
    use_rocksdb_state_store(spark)
    try:
        raw = read_raw_stream(spark, source_dir=src_dir)
        scored = transform_tweets(
            raw, ts_col=F.timestamp_seconds(F.col("key").cast("long"))
        )
        counts = trend_counts(scored)
        q = (
            counts.writeStream.format("memory")
            .queryName("t_rocks")
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # RocksDB provider reports its own custom metrics — proof it ran
        metrics = q.lastProgress["stateOperators"][0].get("customMetrics", {})
        assert any("rocksdb" in k.lower() or "Snapshot" in k for k in metrics)
        assert spark.table("t_rocks").count() > 0
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_observe_metrics_per_batch(spark, src_dir, tmp_path):
    raw = read_raw_stream(spark, source_dir=src_dir)
    scored = observed(
        transform_tweets(raw, ts_col=F.timestamp_seconds(F.col("key").cast("long")))
    )
    q = (
        scored.writeStream.format("memory")
        .queryName("t_obs")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    obs = [
        p["observedMetrics"]["pipeline_metrics"]
        for p in q.recentProgress
        if "pipeline_metrics" in p.get("observedMetrics", {})
    ]
    assert obs, "observe() metrics missing from progress"
    total = sum(m["n_rows"] for m in obs)
    assert total == spark.table("t_obs").count() == 12
    assert all(m["n_hashtags"] >= 1 for m in obs)
