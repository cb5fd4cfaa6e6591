"""Planted-CHAIN batch/stream divergence in the corpus pipeline (round 12,
VERDICT r11 item 5): the caveat documented at corpus_pipeline_neardup
(cleaning.py) made executable.

The chain: a ~ b, b ~ c, a !~ c (verified with the REAL MinHash machinery:
est(a,b) = est(b,c) = 0.625 >= JACCARD_THRESHOLD = 0.5, banded together;
est(a,c) = 0.375, not banded), arriving in three micro-batches a | b | c.

- BATCH rule (drop a doc iff it has a verified match with a smaller
  doc_id, regardless of that match's own fate): b drops (a < b, a~b) AND
  c drops (b < c, b~c) -> survivors {a}.
- STREAM rule (survivors-only cross-batch index): b drops against indexed
  survivor a and is NEVER indexed; when c arrives its only match b is not
  in the index, so c SURVIVES and is indexed -> survivors {a, c}.

The divergence is exactly {c}, by design: exact equality on chained
corpora would require indexing dropped docs' bands, which the
survivors-only index deliberately avoids (cross-batch state stays
survivor-bounded). The streaming-corpus equality test uses isolated pairs
precisely so both rules coincide there; this test pins which face keeps
what when they don't.
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
    run_streaming_corpus_pipeline,
)


def _chain_texts() -> tuple[str, str, str]:
    """a, b, c with the estimates in the module docstring (40 unique
    5-char tokens each; b = a with positions 5/15/25 replaced, c = b with
    10/20/30 replaced — all inside every quality-gate bound)."""
    base = [f"k01{j:02d}" for j in range(40)]

    def variant(toks, positions, tag):
        out = list(toks)
        for p in positions:
            out[p] = f"z{tag}{p:02d}"[:5].ljust(5, "x")
        return out

    a = base
    b = variant(base, (5, 15, 25), "b")
    c = variant(b, (10, 20, 30), "c")
    return " ".join(a), " ".join(b), " ".join(c)


def _write_batches(src, texts) -> None:
    src.mkdir()
    now = time.time()
    for i, (doc_id, text) in enumerate(texts):
        name = src / f"b{i}.json"
        with open(name, "w") as fh:
            fh.write(
                json.dumps(
                    {"doc_id": doc_id, "text": text, "lang": "en", "source": "s0"}
                )
                + "\n"
            )
        os.utime(name, (now - 60 + i * 10, now - 60 + i * 10))


def test_chain_fixture_has_the_planted_estimates(spark):
    """The fixture IS a chain under the real machinery (not by fiat)."""
    a, b, c = _chain_texts()
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], "doc_id long, text string"
    )
    assert (
        df.filter(F.expr(_verdict_sql(dl.SPARK)) == "kept").count() == 3
    )  # all pass the gate — the dedup stage decides, not the gate
    sig = minhash_signatures_for(df)
    rows = {
        r["doc_id"]: [r[f"h{k}"] for k in range(MINHASH_K)] for r in sig.collect()
    }

    def est(x, y):
        return sum(1 for u, v in zip(rows[x], rows[y]) if u == v) / MINHASH_K

    assert est(1, 2) >= JACCARD_THRESHOLD
    assert est(2, 3) >= JACCARD_THRESHOLD
    assert est(1, 3) < JACCARD_THRESHOLD
    buckets: dict = {}
    for r in banded_rel(sig).collect():
        buckets.setdefault((r["band_id"], r["band_key"]), set()).add(r["doc_id"])
    pairs = {frozenset(p) for s in buckets.values() if len(s) > 1 for p in [s]}
    assert any({1, 2} <= s for s in pairs)
    assert any({2, 3} <= s for s in pairs)
    assert not any({1, 3} <= s for s in pairs)


def test_chain_divergence_batch_drops_c_stream_keeps_c(spark, tmp_path):
    a, b, c = _chain_texts()

    # --- STREAM face: a | b | c in three micro-batches
    src = tmp_path / "src"
    _write_batches(src, [(1, a), (2, b), (3, c)])
    results: list[dict] = []
    assert run_streaming_corpus_pipeline(
        spark, str(src), str(tmp_path / "work"), max_files_per_trigger=1,
        results=results,
    )
    by_id = {r["batch_id"]: r for r in results}
    assert by_id[1]["n_dropped_cross"] == 1  # b drops against survivor a
    assert by_id[2]["n_dropped_cross"] == 0  # c's only match b is unindexed
    surv_stream = sorted(
        r["doc_id"]
        for r in spark.read.parquet(f"{tmp_path}/work/dedup_store/survivors")
        .select("doc_id")
        .collect()
    )

    # --- BATCH face: the corpus_pipeline_neardup rule on the same corpus
    docs = spark.createDataFrame(
        [(1, a, "en", "s0"), (2, b, "en", "s0"), (3, c, "en", "s0")],
        "doc_id long, text string, lang string, source string",
    )
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
    surv_batch = sorted(
        r["doc_id"]
        for r in kept.join(dropped, "doc_id", "left_anti").select("doc_id").collect()
    )

    # the documented divergence, exactly: batch drops the whole chain tail,
    # the stream keeps the link whose only match was itself dropped
    assert surv_batch == [1]
    assert surv_stream == [1, 3]
