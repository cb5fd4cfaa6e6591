"""Streaming corpus ingestion: the cleaning operators run unchanged as a
Structured Streaming topology — file-source documents flow through the
C4/Gopher quality verdict and an exact-dedup (content-hash
dropDuplicates) inside one streaming query, with cross-batch dedup state
proving the content hash is keyed into the state store (run 2 resumes
from run 1's checkpoint and drops a re-sent payload).

The batch twins are docs_quality_filter / corpus_pipeline_flagship; this
pins that the SAME verdict SQL drives both modes (the Spark batch/stream
unification the reference's DStream design lacks — SURVEY §1.3).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_twitter_trends_analytics_spark.functions import dialect as dl
from realtime_twitter_trends_analytics_spark.operators.cleaning import _verdict_sql

DOC_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"

# passes every gate rule: 16 tokens, one stopword (1/16 < 15%), avg token
# length between 3 and 6 chars
GOOD = (
    "quick brown foxes jump across quiet fields under bright morning "
    "light near the distant rolling hills"
)


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, DOC_SCHEMA).coalesce(1).write.mode("append").parquet(path)


def _run_once(cleaned, out, ckpt):
    q = (
        cleaned.writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_streaming_quality_gate_and_cross_batch_exact_dedup(spark, tmp_path):
    src = str(tmp_path / "docs_stream")
    out = str(tmp_path / "cleaned_out")
    ckpt = str(tmp_path / "ckpt_corpus")
    # run 1: one keeper, one too-short doc, plus the keeper's exact dup
    _write_batch(
        spark,
        src,
        [
            (1, GOOD, "en", "s0", len(GOOD)),
            (2, "too short", "en", "s0", 9),
            (3, GOOD, "en", "s1", len(GOOD)),  # exact dup of doc 1
        ],
    )
    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    cleaned = (
        stream.withColumn("verdict", F.expr(_verdict_sql(dl.SPARK)))
        .filter(F.col("verdict") == "kept")
        .withColumn("content_hash", F.md5("text"))
        .dropDuplicates(["content_hash"])
    )
    _run_once(cleaned, out, ckpt)
    rows = spark.read.parquet(out).collect()
    # quality gate drops doc 2; exact dedup keeps ONE of {1, 3}
    assert len(rows) == 1
    assert rows[0]["doc_id"] in (1, 3)

    # run 2 resumes the SAME checkpoint: a re-send of the kept content plus
    # one new keeper — the state store must drop the re-send
    novel = GOOD.replace("foxes", "owlets").replace("hills", "dunes")
    _write_batch(
        spark,
        src,
        [(4, GOOD, "en", "s2", len(GOOD)), (5, novel, "en", "s0", len(novel))],
    )
    _run_once(cleaned, out, ckpt)
    rows2 = spark.read.parquet(out).collect()
    assert sorted(r["doc_id"] for r in rows2) in ([1, 5], [3, 5])
