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


def _a5_source(tmp_path):
    """3 files of tweets, strictly increasing mtimes (FileStreamSource
    orders by modification time) -> 3 deterministic micro-batches."""
    import os
    import time as _time

    src = tmp_path / "a5src"
    src.mkdir()
    for f_idx in range(3):
        with open(src / f"b{f_idx}.json", "w") as f:
            for i in range(40):
                row = f_idx * 40 + i
                f.write(
                    json.dumps(
                        {
                            "key": str(BASE_TS + row * 30),
                            "value": f"u, City{row % 4} /TLOC/ #t{row % 3} msg {row}",
                        }
                    )
                    + "\n"
                )
    now = _time.time()
    for i in range(3):
        os.utime(src / f"b{i}.json", (now - 30 + i * 10, now - 30 + i * 10))
    return str(src)


def _run_a5(spark, src, work, stop_after_first_batch=False):
    """Drive the PRODUCTION A5 topology (two windowed aggs + stream-stream
    join) into the idempotent store; optionally kill after the first
    committed epoch and restart from the same checkpoint."""
    import os
    import time as _time

    from realtime_twitter_trends_analytics_spark.streaming.pipeline import (
        idempotent_store_writer,
        trend_sentiment_joined,
        write_with_first_batch_setup,
    )

    store = f"{work}/store"

    def start():
        raw = read_raw_stream(spark, source_dir=src, max_files_per_trigger=1)
        scored = transform_tweets(
            raw, ts_col=F.timestamp_seconds(F.col("key").cast("long")),
            sql_sentiment=True,
        )
        return write_with_first_batch_setup(
            trend_sentiment_joined(scored),
            checkpoint_dir=f"{work}/ckpt",
            sink_writer=idempotent_store_writer(store),
            output_mode="append",
        )

    q = start()
    if stop_after_first_batch:
        deadline = _time.time() + 120
        while _time.time() < deadline and not os.path.exists(f"{store}/batch=0/_SUCCESS"):
            _time.sleep(0.2)
        assert os.path.exists(f"{store}/batch=0/_SUCCESS"), "no epoch committed"
        q.stop()  # kill mid-corpus
        q.awaitTermination(60)
        q = start()  # restart from the SAME checkpoint
    assert q.awaitTermination(180), "stream did not drain"
    df = spark.read.parquet(store)
    return sorted(
        (str(r["window_start"]), r["hashtag"], r["cnt"], r["mean_sentiment"])
        for r in df.select("window_start", "hashtag", "cnt", "mean_sentiment").collect()
    )


def test_a5_store_restart_equals_uninterrupted(spark, tmp_path):
    """Exactly-once for the reference's own A5 production store (the S10
    claim): kill after >=1 committed epoch, restart from the checkpoint,
    and the idempotent (overwrite-by-batch-id) store must equal the
    uninterrupted run — the test fails if the epoch replay double-applies
    or the windowed/join state restores wrong."""
    src = _a5_source(tmp_path)
    ref = _run_a5(spark, src, str(tmp_path / "ref"))
    got = _run_a5(spark, src, str(tmp_path / "inj"), stop_after_first_batch=True)
    assert got == ref, f"restart diverged: {len(got)} vs {len(ref)} rows"
    assert ref, "fixture emitted no finalized windows — test is vacuous"
