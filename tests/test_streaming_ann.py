"""Streaming ANN serve path (round 9): the online face of the LSH index
must BE the batch operator, not an approximation of it.

- Parity: serving the batch query set (vec_id < N_QUERY_VECS, corpus
  members, exclude_self) through the stream yields EXACTLY sim_lsh_ann's
  rows — same buckets, same probes, same cosine rounding, same tiebreak.
- Planted exact duplicate: a query carrying a corpus vector's embedding
  returns that vector at rank 1 with cosine 1.0.
- Batch partitioning: per-batch results land under batch=<id> and union
  to the full query set (the overwrite-by-batch-id idempotence layout).
"""

from __future__ import annotations

import json
import os
import time

from realtime_twitter_trends_analytics_spark.operators.similarity import (
    N_QUERY_VECS,
    sim_lsh_ann,
)
from realtime_twitter_trends_analytics_spark.sources.loaders import load_table
from realtime_twitter_trends_analytics_spark.streaming.ann_stream import (
    run_streaming_ann,
)

SF = "/root/testdata/sf0.001"


def _write_queries(path, rows) -> None:
    with open(path, "w") as fh:
        for qid, emb in rows:
            fh.write(json.dumps({"query_id": qid, "embedding": emb}) + "\n")


def _collect_emb(spark, vec_ids):
    emb = load_table(spark, SF, "embeddings")
    rows = emb.filter(emb.vec_id.isin(list(vec_ids))).collect()
    # float32 -> exact double (Python float), full-precision JSON round-trip
    return {r["vec_id"]: [float(x) for x in r["embedding"]] for r in rows}


def test_streaming_ann_equals_batch_operator(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    by_id = _collect_emb(spark, range(N_QUERY_VECS))
    # two micro-batches (5 queries each), deterministic order via mtimes
    items = sorted(by_id.items())
    _write_queries(src / "q0.json", items[:5])
    _write_queries(src / "q1.json", items[5:])
    now = time.time()
    for i, name in enumerate(["q0.json", "q1.json"]):
        os.utime(src / name, (now - 20 + i * 10, now - 20 + i * 10))

    metrics: list[dict] = []
    assert run_streaming_ann(
        spark,
        str(src),
        str(tmp_path / "work"),
        SF,
        exclude_self=True,
        max_files_per_trigger=1,
        metrics=metrics,
    )
    assert [m["n_queries"] for m in sorted(metrics, key=lambda m: m["batch_id"])] == [5, 5]

    served = spark.read.parquet(f"{tmp_path}/work/results")
    got = sorted(
        (r["query_id"], r["cand_id"], r["cosine"], r["rnk"])
        for r in served.select("query_id", "cand_id", "cosine", "rnk").collect()
    )
    want = sorted(
        (r["query_id"], r["cand_id"], r["cosine"], r["rnk"])
        for r in sim_lsh_ann(spark, SF).collect()
    )
    assert got == want


def test_streaming_ann_planted_exact_duplicate(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    emb42 = _collect_emb(spark, [42])[42]
    _write_queries(src / "q.json", [(9001, emb42)])
    assert run_streaming_ann(spark, str(src), str(tmp_path / "work"), SF)
    top = (
        spark.read.parquet(f"{tmp_path}/work/results")
        .filter("query_id = 9001 AND rnk = 1")
        .collect()
    )
    assert len(top) == 1
    assert top[0]["cand_id"] == 42, top
    assert abs(top[0]["cosine"] - 1.0) < 1e-9, top
