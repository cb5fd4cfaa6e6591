"""corpus_pipeline_v4 (round 12): gate -> decontamination -> near-dup
dedup -> accounting — batch face vs streaming face on one planted corpus.

Planted fixture:
- eval doc E (external ground truth, not part of the feed);
- batch 0: a (novel, kept), c (near-copy of E -> CONTAMINATED: dropped
  before dedup and never indexed), g (fails the quality gate);
- batch 1: b (near-dup of a -> dropped by dedup), d (novel, kept).

Pinned:
- the stream drops c at the decontamination stage (n_contaminated_out=1)
  and c is NOT in the survivor store or the band index (an eval
  near-copy must never become the survivor another copy dedups against);
- stream survivors == batch-composition survivors == {a, d}, and the
  accounting totals agree;
- the batch composition here is built from the same primitives
  corpus_pipeline_v4 composes, with the eval set explicit (the registered
  operator derives its eval split from the md5-nibble rule, which a
  planted corpus cannot steer) — the registered operator itself is
  oracle-gated at every SF.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from realtime_twitter_trends_analytics_spark.functions import dialect as dl
from realtime_twitter_trends_analytics_spark.operators.cleaning import (
    DECON_MAX_CONTAM,
    _verdict_sql,
)
from realtime_twitter_trends_analytics_spark.operators.dedup import (
    JACCARD_THRESHOLD,
    MINHASH_K,
    banded_rel,
    minhash_signatures_for,
    shingles_sql,
    signature_match_count,
)
from realtime_twitter_trends_analytics_spark.streaming.corpus_stream import (
    eval_shingle_set,
    read_corpus_accounting,
    run_streaming_corpus_pipeline,
)

SCHEMA = "doc_id long, text string, lang string, source string"


def _fill(i: int, n_tok: int = 40) -> str:
    return " ".join(f"k{i:02d}{j:02d}" for j in range(n_tok))


def _near_dup(text: str, pos: int = 20) -> str:
    toks = text.split(" ")
    toks[pos] = "zz999"
    return " ".join(toks)


EVAL_DOC = (900, _fill(90), "en", "eval")
ROWS = {
    0: [
        (1, _fill(1), "en", "s0"),                    # a: novel
        (2, _near_dup(EVAL_DOC[1]), "en", "s1"),      # c: eval near-copy
        (3, "tiny doc", "en", "s0"),                  # g: gated out
    ],
    1: [
        (11, _near_dup(_fill(1)), "en", "s1"),        # b: near-dup of a
        (12, _fill(12), "fr", "s0"),                  # d: novel
    ],
}


def _write_jsonl(path, rows) -> None:
    with open(path, "w") as fh:
        for doc_id, text, lang, source in rows:
            fh.write(
                json.dumps(
                    {"doc_id": doc_id, "text": text, "lang": lang, "source": source}
                )
                + "\n"
            )


def _make_dirs(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    now = time.time()
    for b, rows in sorted(ROWS.items()):
        p = src / f"b{b}.json"
        _write_jsonl(p, rows)
        os.utime(p, (now - 60 + b * 10, now - 60 + b * 10))
    ev = tmp_path / "eval"
    ev.mkdir()
    _write_jsonl(ev / "eval.json", [EVAL_DOC])
    return src, ev


def _batch_twin(spark):
    """The v4 composition with the eval set explicit, from the same
    primitives the registered operator composes."""
    feed = spark.createDataFrame(
        [r for rows in ROWS.values() for r in rows], SCHEMA
    )
    eval_docs = spark.createDataFrame([EVAL_DOC], SCHEMA)
    eval_sh = eval_shingle_set(eval_docs)
    kept = feed.filter(F.expr(_verdict_sql(dl.SPARK)) == "kept")
    ksh = kept.select(
        "doc_id", F.expr(dl.split_ws(dl.SPARK, "text")).alias("toks")
    ).select(
        "doc_id",
        F.explode(
            F.expr(dl.arr_distinct(dl.SPARK, shingles_sql(dl.SPARK, "toks")))
        ).alias("sh"),
    )
    contam_ids = (
        ksh.join(eval_sh.withColumn("hit", F.lit(1)), "sh", "left")
        .groupBy("doc_id")
        .agg((F.sum(F.coalesce("hit", F.lit(0))) / F.count(F.lit(1))).alias("frac"))
        .filter(F.col("frac") > DECON_MAX_CONTAM)
        .select("doc_id")
    )
    clean = kept.join(contam_ids, "doc_id", "left_anti")
    sig = minhash_signatures_for(clean.select("doc_id", "text")).localCheckpoint()
    bands = banded_rel(sig)
    cand = (
        bands.select(F.col("doc_id").alias("a"), "band_id", "band_key")
        .join(
            bands.select(F.col("doc_id").alias("b"), "band_id", "band_key"),
            ["band_id", "band_key"],
        )
        .filter(F.col("b") > F.col("a"))
        .select("a", "b")
        .distinct()
    )
    sa = sig.select(
        F.col("doc_id").alias("a"),
        *[F.col(f"h{k}").alias(f"a_h{k}") for k in range(MINHASH_K)],
    )
    sb = sig.select(
        F.col("doc_id").alias("b"),
        *[F.col(f"h{k}").alias(f"b_h{k}") for k in range(MINHASH_K)],
    )
    est = (signature_match_count("a", "b") / F.lit(MINHASH_K)).alias("est")
    dropped = (
        cand.join(sa, "a")
        .join(sb, "b")
        .select("b", est)
        .filter(F.col("est") >= JACCARD_THRESHOLD)
        .select(F.col("b").alias("doc_id"))
        .distinct()
    )
    survivors = clean.join(dropped, "doc_id", "left_anti")
    n_tok = F.size(F.expr(dl.split_ws(dl.SPARK, "text")))
    acct = (
        survivors.select("lang", "source", n_tok.alias("n_tok"))
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
        )
    )
    return survivors, acct


def test_v4_stream_equals_batch_and_contaminated_never_indexed(spark, tmp_path):
    src, ev = _make_dirs(tmp_path)
    results: list[dict] = []
    assert run_streaming_corpus_pipeline(
        spark, str(src), str(tmp_path / "work"), max_files_per_trigger=1,
        results=results, eval_source_dir=str(ev),
    )
    by_id = {r["batch_id"]: r for r in results}
    assert by_id[0]["n_gated_out"] == 1          # g
    assert by_id[0]["n_contaminated_out"] == 1   # c, BEFORE dedup
    assert by_id[0]["n_dropped_within"] == 0
    assert by_id[1]["n_contaminated_out"] == 0
    assert by_id[1]["n_dropped_cross"] == 1      # b vs indexed survivor a

    surv_stream = sorted(
        r["doc_id"]
        for r in spark.read.parquet(f"{tmp_path}/work/dedup_store/survivors")
        .select("doc_id")
        .collect()
    )
    acct_stream = sorted(
        (r["lang"], r["source"], r["n_docs"], r["n_tokens"])
        for r in read_corpus_accounting(spark, f"{tmp_path}/work/accounting").collect()
    )
    surv_batch_df, acct_batch_df = _batch_twin(spark)
    surv_batch = sorted(r["doc_id"] for r in surv_batch_df.select("doc_id").collect())
    acct_batch = sorted(
        (r["lang"], r["source"], r["n_docs"], r["n_tokens"])
        for r in acct_batch_df.collect()
    )
    assert surv_stream == surv_batch == [1, 12]
    assert acct_stream == acct_batch
    # the contaminated doc is in NEITHER the survivor store NOR the index
    # (its bands were never written — it cannot shadow a later copy)
    bands = spark.read.parquet(f"{tmp_path}/work/dedup_store/bands")
    assert bands.filter(F.col("doc_id") == 2).count() == 0


def test_v4_without_eval_dir_is_the_old_topology(spark, tmp_path):
    """eval_source_dir=None keeps the round-10 behavior exactly: no
    decontamination stage, the eval near-copy survives like any doc."""
    src, _ev = _make_dirs(tmp_path)
    results: list[dict] = []
    assert run_streaming_corpus_pipeline(
        spark, str(src), str(tmp_path / "work"), max_files_per_trigger=1,
        results=results,
    )
    assert all(r.get("n_contaminated_out") == 0 for r in results)
    surv = sorted(
        r["doc_id"]
        for r in spark.read.parquet(f"{tmp_path}/work/dedup_store/survivors")
        .select("doc_id")
        .collect()
    )
    assert surv == [1, 2, 12]
