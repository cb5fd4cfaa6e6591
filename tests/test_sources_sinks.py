"""Source/sink surface (SURVEY §2.1): rate streaming source, partitioned
parquet writes with partition pruning, CSV/JSON round-trips, console-style
memory sink — the S1-S10 replacements that exist without external services."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from realtime_twitter_trends_analytics_spark.plans.explain import explain_str
from realtime_twitter_trends_analytics_spark.sources.loaders import load_table


def test_rate_source_produces_rows(spark, tmp_path):
    """S1-replacement smoke: the rate source (tests' stand-in for the
    Twitter/Kafka push stream) flows through the streaming machinery."""
    rate = spark.readStream.format("rate").option("rowsPerSecond", 100).load()
    q = (
        rate.withColumn("bucket", F.col("value") % 10)
        .writeStream.format("memory")
        .queryName("t_rate")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        import time

        deadline = time.time() + 30
        n = 0
        while time.time() < deadline:
            n = spark.table("t_rate").count()
            if n > 0:
                break
            time.sleep(0.5)
        assert n > 0
    finally:
        q.stop()


def test_partitioned_parquet_write_and_pruning(spark, sf_dir, tmp_path):
    """Hive-partitioned sink + partition pruning on read: a filter on the
    partition column must prune directories, not rows."""
    out = str(tmp_path / "events_by_type")
    e = load_table(spark, sf_dir, "events")
    e.write.partitionBy("event_type").mode("overwrite").parquet(out)

    back = spark.read.parquet(out).filter(F.col("event_type") == "error")
    plan = explain_str(back)
    assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters")[1][:200]
    want = e.filter(F.col("event_type") == "error").count()
    assert back.count() == want


def test_csv_json_round_trip(spark, sf_dir, tmp_path):
    n0 = load_table(spark, sf_dir, "nation")
    csv_dir, json_dir = str(tmp_path / "n_csv"), str(tmp_path / "n_json")
    n0.write.mode("overwrite").option("header", True).csv(csv_dir)
    n0.write.mode("overwrite").json(json_dir)
    from_csv = (
        spark.read.option("header", True).option("inferSchema", True).csv(csv_dir)
    )
    from_json = spark.read.json(json_dir)
    key = lambda rows: sorted((r["n_nationkey"], r["n_name"], r["n_regionkey"]) for r in rows)
    assert key(from_csv.collect()) == key(n0.collect())
    assert key(from_json.collect()) == key(n0.collect())


def test_orc_round_trip_with_pushdown(spark, sf_dir, tmp_path):
    """ORC is the other built-in columnar format a warehouse migration
    meets; round-trip the orders table and check a filter reaches the ORC
    scan as a push-down (ORC carries min/max stripes like parquet)."""
    o0 = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    orc_dir = str(tmp_path / "o_orc")
    o0.write.mode("overwrite").orc(orc_dir)
    back = spark.read.orc(orc_dir)
    assert back.count() == o0.count()
    filtered = back.filter(back.o_orderstatus == "F")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    # match each pushed filter independently — filter ordering / list
    # formatting inside PushedFilters varies across Spark minor versions
    assert "PushedFilters: [" in plan
    assert "IsNotNull(o_orderstatus)" in plan
    assert "EqualTo(o_orderstatus,F)" in plan
    assert filtered.count() == o0.filter(o0.o_orderstatus == "F").count()


def test_dynamic_partition_overwrite(spark, sf_dir, tmp_path):
    """partitionOverwriteMode=dynamic: rewriting ONE partition must leave
    sibling partitions untouched — the idempotent-backfill pattern (re-run
    one day of a 1000-day table without truncating the other 999)."""
    out = str(tmp_path / "events_dpo")
    e = load_table(spark, sf_dir, "events").select("event_id", "value", "event_type")
    e.write.partitionBy("event_type").mode("overwrite").parquet(out)
    before = spark.read.parquet(out).count()
    errors_fixed = (
        e.filter(F.col("event_type") == "error").withColumn("value", F.lit(0.0))
    )
    old_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        errors_fixed.write.partitionBy("event_type").mode("overwrite").parquet(out)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old_mode)
    back = spark.read.parquet(out)
    assert back.count() == before  # nothing truncated
    assert back.filter("event_type = 'error' AND value <> 0.0").count() == 0
    n_signup = e.filter("event_type = 'signup'").count()
    assert back.filter("event_type = 'signup'").count() == n_signup


def test_schema_evolution_merge_schema(spark, sf_dir, tmp_path):
    """mergeSchema=true unions per-file schemas (the appended-column
    evolution a long-lived table accumulates); files written before the
    column read back with NULLs."""
    out = str(tmp_path / "evolving")
    n = load_table(spark, sf_dir, "nation")
    n.select("n_nationkey", "n_name").write.mode("append").parquet(out)
    n.select("n_nationkey", "n_name", "n_regionkey").write.mode("append").parquet(out)
    merged = spark.read.option("mergeSchema", True).parquet(out)
    assert set(merged.columns) == {"n_nationkey", "n_name", "n_regionkey"}
    assert merged.count() == 2 * n.count()
    assert merged.filter(F.col("n_regionkey").isNull()).count() == n.count()


def test_repartition_controls_sink_parallelism(spark, sf_dir, tmp_path):
    """S6/A8 (proc:119 repartition(10) before write): sink file count
    follows the declared write parallelism."""
    import glob

    out = str(tmp_path / "part_controlled")
    load_table(spark, sf_dir, "orders").repartition(10).write.mode("overwrite").parquet(out)
    files = glob.glob(out + "/part-*.parquet")
    assert len(files) == 10


def test_corrupt_json_records_captured_not_dropped(spark, tmp_path):
    """Ingest robustness: malformed JSON lands in the corrupt-record
    column (PERMISSIVE) instead of silently vanishing, and FAILFAST
    raises — the two contracts a 100 TB ingest chooses between. At scale
    silent drops are unauditable data loss."""
    import pytest
    from pyspark.sql.types import StringType, StructField, StructType

    p = tmp_path / "mixed.json"
    p.write_text(
        '{"key": "1", "value": "ok one"}\n'
        "this is not json at all\n"
        '{"key": "2", "value": "ok two"}\n'
        '{"key": 3, "value": ["wrong", "type"]}\n'
    )
    schema = StructType(
        [
            StructField("key", StringType()),
            StructField("value", StringType()),
            StructField("_corrupt_record", StringType()),
        ]
    )
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(str(p))
        .cache()  # SPARK-21610: corrupt-record column needs materialization
    )
    try:
        assert df.count() == 4  # nothing dropped
        # unparseable line -> corrupt record; valid JSON with non-string
        # field values survives, the StringType column keeping the raw
        # JSON text of the mismatched value
        bad = [r["_corrupt_record"] for r in df.filter(df["_corrupt_record"].isNotNull()).collect()]
        assert bad == ["this is not json at all"]
        good = {r["key"]: r["value"] for r in df.filter(df["_corrupt_record"].isNull()).collect()}
        assert good == {"1": "ok one", "2": "ok two", "3": '["wrong", "type"]'}
    finally:
        df.unpersist()

    with pytest.raises(Exception):
        spark.read.schema(schema).option("mode", "FAILFAST").json(str(p)).collect()
