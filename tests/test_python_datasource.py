"""Custom Python DataSource (Spark 4 API): registration, schema,
partition planning, parallel read, determinism, and composition with
downstream DataFrame operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_twitter_trends_analytics_spark.sources.pyds import (
    _doc_text,
    register_synthdocs,
)


def _load(spark, n_docs=64, partitions=4):
    register_synthdocs(spark)
    return (
        spark.read.format("synthdocs")
        .option("n_docs", n_docs)
        .option("partitions", partitions)
        .load()
    )


def test_synthdocs_schema_and_rowcount(spark):
    df = _load(spark)
    assert df.columns == ["doc_id", "text", "n_tokens"]
    assert df.count() == 64
    assert df.select("doc_id").distinct().count() == 64


def test_synthdocs_partition_planning(spark):
    assert _load(spark, 64, 8).rdd.getNumPartitions() == 8
    # non-divisible counts still honor the requested parallelism exactly
    df = _load(spark, 10, 4)
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 10
    df = _load(spark, 100, 3)
    assert df.rdd.getNumPartitions() == 3
    assert df.count() == 100


def test_synthdocs_rows_match_generator(spark):
    rows = {r.doc_id: r for r in _load(spark, 16, 3).collect()}
    for doc_id in (0, 7, 15):
        assert rows[doc_id].text == _doc_text(doc_id)
        assert rows[doc_id].n_tokens == len(_doc_text(doc_id).split(" "))


def test_synthdocs_streaming_offsets_survive_checkpoint(spark, tmp_path):
    """The streaming face: each run drains one rows_per_batch micro-batch;
    re-starting on the SAME checkpoint resumes from the persisted offset —
    the replayable-log recovery contract (what the reference relied on
    Kafka offsets for), demonstrated on the custom source."""
    register_synthdocs(spark)
    out = str(tmp_path / "out")
    for run in range(1, 4):
        stream = (
            spark.readStream.format("synthdocs")
            .option("n_docs", 30)
            .option("rows_per_batch", 10)
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.read.parquet(out).collect()
        # each run drained exactly one more micro-batch, no replay
        assert len(rows) == run * 10
        assert len({r.doc_id for r in rows}) == run * 10
    seen = {r.doc_id: r.text for r in spark.read.parquet(out).collect()}
    assert seen[13] == _doc_text(13)
    assert sorted(seen) == list(range(30))


def test_synthdocs_composes_with_operators(spark):
    """The source is a normal DataFrame: aggregation over it must agree
    with driver-side recomputation from the pure generator."""
    df = _load(spark, 100, 5)
    got = df.agg(F.sum("n_tokens").alias("s")).collect()[0]["s"]
    expected = sum(len(_doc_text(i).split(" ")) for i in range(100))
    assert got == expected


def test_cluster_conf_sizing_rules():
    """cluster_conf is the reviewable 100 TB sizing story: partitions
    scale with both fleet width and input bytes, and the safety knobs
    (AQE, Kryo, shuffle service) are always present."""
    from realtime_twitter_trends_analytics_spark.session import cluster_conf

    big = cluster_conf(executors=1000, input_tb=100.0)
    small = cluster_conf(executors=10, input_tb=0.1)
    assert int(big["spark.sql.shuffle.partitions"]) >= 2 * 1000 * 4
    assert int(big["spark.sql.shuffle.partitions"]) > int(
        small["spark.sql.shuffle.partitions"]
    )
    # input-bound when data dominates: 100 TB / 200 MB tasks
    assert int(big["spark.sql.shuffle.partitions"]) == 524288
    for k in (
        "spark.sql.adaptive.enabled",
        "spark.shuffle.service.enabled",
        "spark.dynamicAllocation.enabled",
    ):
        assert big[k] == "true"
    assert big["spark.serializer"].endswith("KryoSerializer")
