"""End-to-end streaming corpus pipeline (round 10, VERDICT r9 item 4):
gate -> near-dup dedup -> accounting in ONE topology, proven EQUAL to the
batch composition on the same corpus (the batch/stream unification
receipt, SURVEY §1.3).

The batch twin is built from the same primitives the batch operators use
(_verdict_sql gate, minhash_signatures_for / banded_rel pair detection,
drop-the-larger-id rule). The corpus plants only ISOLATED near-dup pairs
(no chains), so the greedy stream keeper rule and the batch
smaller-id-match rule provably coincide — the equality is then a real
check of the composed machinery, not of corpus luck. All texts are
20/40 unique 5-char tokens: inside every gate bound (12<=n<=94, distinct,
no stopwords, avg token length exactly 5 in [3, 6]) and deterministic
under the fixed md5 MinHash family.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from realtime_twitter_trends_analytics_spark.functions import dialect as dl
from realtime_twitter_trends_analytics_spark.operators.cleaning import _verdict_sql
from realtime_twitter_trends_analytics_spark.operators.dedup import (
    JACCARD_THRESHOLD,
    MINHASH_K,
    banded_rel,
    minhash_signatures_for,
    signature_match_count,
)
from realtime_twitter_trends_analytics_spark.streaming.corpus_stream import (
    read_corpus_accounting,
    run_streaming_corpus_pipeline,
)

SCHEMA = "doc_id long, text string, lang string, source string"


def _fill(i: int, n_tok: int = 40) -> str:
    # unique-per-(doc, position) 5-char tokens: k<doc:02d><pos:02d>
    return " ".join(f"k{i:02d}{j:02d}" for j in range(n_tok))


def _near_dup(i: int, n_tok: int = 40) -> str:
    # one mid token changed: 37 of 38 3-shingles shared minus the 3 the
    # change touches -> est Jaccard well above threshold, deterministic
    toks = _fill(i, n_tok).split(" ")
    toks[n_tok // 2] = "zz999"
    return " ".join(toks)


ROWS = {
    # batch 0: keepers 1, 2; gated-out 3; within-batch near-dup 4 of 2
    0: [
        (1, _fill(1), "en", "s0"),
        (2, _fill(2), "fr", "s1"),
        (3, "tiny doc", "en", "s0"),
        (4, _near_dup(2), "fr", "s0"),
    ],
    # batch 1: cross-batch near-dup 11 of 1; novel 12; gated-out 13
    1: [
        (11, _near_dup(1), "en", "s1"),
        (12, _fill(12), "en", "s1"),
        (13, "also tiny", "fr", "s1"),
    ],
    # batch 2: near-dup 21 of batch-1 survivor 12; novel 22
    2: [
        (21, _near_dup(12), "fr", "s0"),
        (22, _fill(22), "en", "s0"),
    ],
}


def _make_source(src) -> None:
    src.mkdir()
    names = []
    for b, rows in sorted(ROWS.items()):
        name = f"b{b}.json"
        with open(src / name, "w") as fh:
            for doc_id, text, lang, source in rows:
                fh.write(
                    json.dumps(
                        {"doc_id": doc_id, "text": text, "lang": lang, "source": source}
                    )
                    + "\n"
                )
        names.append(name)
    now = time.time()  # FileStreamSource orders by mtime — pin distinct ticks
    for i, name in enumerate(names):
        os.utime(src / name, (now - 60 + i * 10, now - 60 + i * 10))


def _batch_twin(spark):
    """The batch composition: gate -> banded-MinHash pair detection ->
    drop the larger id of every verified pair -> survivors + accounting."""
    all_rows = [r for rows in ROWS.values() for r in rows]
    docs = spark.createDataFrame(all_rows, SCHEMA)
    kept = docs.filter(F.expr(_verdict_sql(dl.SPARK)) == "kept")
    sig = minhash_signatures_for(kept.select("doc_id", "text")).localCheckpoint()
    bands = banded_rel(sig)
    cand = (
        bands.select(F.col("doc_id").alias("n"), "band_id", "band_key")
        .join(
            bands.select(F.col("doc_id").alias("c"), "band_id", "band_key"),
            ["band_id", "band_key"],
        )
        .filter(F.col("c") < F.col("n"))
        .select("n", "c")
        .distinct()
    )
    sa = sig.select(
        F.col("doc_id").alias("n"),
        *[F.col(f"h{k}").alias(f"a_h{k}") for k in range(MINHASH_K)],
    )
    sb = sig.select(
        F.col("doc_id").alias("c"),
        *[F.col(f"h{k}").alias(f"b_h{k}") for k in range(MINHASH_K)],
    )
    est = (signature_match_count("a", "b") / F.lit(MINHASH_K)).alias("est_jaccard")
    dropped = (
        cand.join(sa, "n")
        .join(sb, "c")
        .select("n", est)
        .filter(F.col("est_jaccard") >= JACCARD_THRESHOLD)
        .select(F.col("n").alias("doc_id"))
        .distinct()
    )
    survivors = kept.join(dropped, "doc_id", "left_anti")
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


def test_streaming_corpus_pipeline_equals_batch_composition(spark, tmp_path):
    src = tmp_path / "src"
    _make_source(src)
    results: list[dict] = []
    assert run_streaming_corpus_pipeline(
        spark, str(src), str(tmp_path / "work"), max_files_per_trigger=1,
        results=results,
    )
    assert len(results) == 3, results
    by_id = {r["batch_id"]: r for r in results}
    # gate: docs 3 and 13 never reach the dedup stage
    assert by_id[0]["n_gated_out"] == 1 and by_id[0]["n_in"] == 3
    assert by_id[1]["n_gated_out"] == 1 and by_id[1]["n_in"] == 2
    assert by_id[2]["n_gated_out"] == 0 and by_id[2]["n_in"] == 2
    # dedup: 4 within-batch; 11 and 21 cross-batch against the index
    assert by_id[0]["n_dropped_within"] == 1
    assert by_id[1]["n_dropped_cross"] == 1
    assert by_id[2]["n_dropped_cross"] == 1

    surv_stream = sorted(
        r["doc_id"]
        for r in spark.read.parquet(f"{tmp_path}/work/dedup_store/survivors")
        .select("doc_id")
        .collect()
    )
    acct_stream = sorted(
        (r["lang"], r["source"], r["n_docs"], r["n_tokens"])
        for r in read_corpus_accounting(
            spark, f"{tmp_path}/work/accounting"
        ).collect()
    )

    surv_batch_df, acct_batch_df = _batch_twin(spark)
    surv_batch = sorted(r["doc_id"] for r in surv_batch_df.select("doc_id").collect())
    acct_batch = sorted(
        (r["lang"], r["source"], r["n_docs"], r["n_tokens"])
        for r in acct_batch_df.collect()
    )

    assert surv_stream == surv_batch == [1, 2, 12, 22]
    assert acct_stream == acct_batch
    # accounting is non-trivial: at least two (lang, source) cells
    assert len(acct_stream) >= 2


def test_streaming_corpus_pipeline_restart_equality(spark, tmp_path):
    """Kill after >=1 committed batch; the restarted run's survivor store
    AND summed accounting must equal the uninterrupted run's."""
    from realtime_twitter_trends_analytics_spark.streaming.corpus_stream import (
        read_corpus_docs_stream,
        streaming_corpus_reset,
        streaming_corpus_writer,
    )
    from realtime_twitter_trends_analytics_spark.streaming.pipeline import (
        write_with_first_batch_setup,
    )

    src = tmp_path / "src"
    _make_source(src)

    ref_results: list[dict] = []
    assert run_streaming_corpus_pipeline(
        spark, str(src), str(tmp_path / "ref"), max_files_per_trigger=1,
        results=ref_results,
    )

    def surv_ids(work):
        df = spark.read.parquet(f"{work}/dedup_store/survivors")
        return sorted(r["doc_id"] for r in df.select("doc_id").collect())

    def acct(work):
        return sorted(
            tuple(r) for r in read_corpus_accounting(
                spark, f"{work}/accounting"
            ).collect()
        )

    work = tmp_path / "work"
    results: list[dict] = []

    def start():
        return write_with_first_batch_setup(
            read_corpus_docs_stream(spark, str(src), max_files_per_trigger=1),
            checkpoint_dir=f"{work}/ckpt",
            sink_writer=streaming_corpus_writer(
                spark, f"{work}/dedup_store", f"{work}/accounting", results=results
            ),
            first_batch_setup=streaming_corpus_reset(
                f"{work}/dedup_store", f"{work}/accounting"
            ),
            output_mode="append",
        )

    q = start()
    deadline = time.time() + 120
    while not results and time.time() < deadline:
        time.sleep(0.2)
    assert results, "no batch committed before the kill"
    q.stop()
    q.awaitTermination(60)

    q2 = start()
    assert q2.awaitTermination(180), "restarted stream did not drain"

    assert surv_ids(work) == surv_ids(tmp_path / "ref")
    assert acct(work) == acct(tmp_path / "ref")
