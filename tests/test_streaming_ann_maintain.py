"""Streaming ANN index MAINTENANCE (round 10, VERDICT r9 item 3): ingest
and serve on ONE index — the last face of the 100 TB retrieval story.

- Found-later: a vector ingested in batch 1 must be returned (rank 1,
  cosine 1.0) by a query in batch 2; a query in batch 0, before ANY
  ingest, serves the empty result with the pinned schema.
- Parity: ingesting the whole sf0.001 corpus across two batches and then
  querying the batch query set (vec_id < N_QUERY_VECS, exclude_self)
  yields EXACTLY sim_lsh_ann's rows — the maintained index converges to
  the write-once index, same buckets / probes / rounding / tiebreak.
- Restart equality: killing the stream after >=1 committed batch and
  restarting from the same checkpoint must leave index AND results equal
  to an uninterrupted run (overwrite-by-batch-id epochs).
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
    read_upsert_query_stream,
    run_streaming_ann_maintain,
    streaming_ann_maintain_reset,
    streaming_ann_maintain_writer,
)
from realtime_twitter_trends_analytics_spark.streaming.pipeline import (
    write_with_first_batch_setup,
)

SF = "/root/testdata/sf0.001"


def _write_rows(path, rows) -> None:
    with open(path, "w") as fh:
        for kind, rid, emb in rows:
            fh.write(json.dumps({"kind": kind, "id": rid, "embedding": emb}) + "\n")


def _pin_mtimes(src, names) -> None:
    # FileStreamSource orders by mtime; back-to-back writes can share a tick
    now = time.time()
    for i, name in enumerate(names):
        os.utime(src / name, (now - 60 + i * 10, now - 60 + i * 10))


def _collect_emb(spark, vec_ids):
    emb = load_table(spark, SF, "embeddings")
    rows = emb.filter(emb.vec_id.isin(list(vec_ids))).collect()
    return {r["vec_id"]: [float(x) for x in r["embedding"]] for r in rows}


def test_maintain_found_later_and_empty_first_batch(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    by_id = _collect_emb(spark, [42, 43])
    # b0: a query before any ingest; b1: ingest 42+43; b2: query 42's vector
    _write_rows(src / "b0.json", [("query", 9000, by_id[42])])
    _write_rows(
        src / "b1.json",
        [("ingest", 42, by_id[42]), ("ingest", 43, by_id[43])],
    )
    _write_rows(src / "b2.json", [("query", 9001, by_id[42])])
    _pin_mtimes(src, ["b0.json", "b1.json", "b2.json"])

    metrics: list[dict] = []
    assert run_streaming_ann_maintain(
        spark, str(src), str(tmp_path / "work"), max_files_per_trigger=1,
        metrics=metrics,
    )
    by_batch = {
        m["batch_id"]: (m["n_ingest"], m["n_queries"]) for m in metrics
    }
    assert by_batch == {0: (0, 1), 1: (2, 0), 2: (0, 1)}

    res = spark.read.parquet(f"{tmp_path}/work/results")
    # pre-ingest query: served against the empty index -> no rows
    assert res.filter("query_id = 9000").count() == 0
    # post-ingest query finds the earlier batch's vector at rank 1 / 1.0
    top = res.filter("query_id = 9001 AND rnk = 1").collect()
    assert len(top) == 1
    assert top[0]["cand_id"] == 42, top
    assert abs(top[0]["cosine"] - 1.0) < 1e-9, top


def test_maintain_converges_to_batch_operator(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    emb = load_table(spark, SF, "embeddings").collect()
    corpus = [(int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in emb]
    corpus.sort()
    half = len(corpus) // 2
    _write_rows(src / "b0.json", [("ingest", i, v) for i, v in corpus[:half]])
    _write_rows(src / "b1.json", [("ingest", i, v) for i, v in corpus[half:]])
    _write_rows(
        src / "b2.json",
        [("query", i, v) for i, v in corpus if i < N_QUERY_VECS],
    )
    _pin_mtimes(src, ["b0.json", "b1.json", "b2.json"])

    assert run_streaming_ann_maintain(
        spark, str(src), str(tmp_path / "work"), exclude_self=True,
        max_files_per_trigger=1,
    )
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


def test_maintain_restart_equals_uninterrupted(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    by_id = _collect_emb(spark, range(8))
    items = sorted(by_id.items())
    _write_rows(src / "b0.json", [("ingest", i, v) for i, v in items[:4]])
    _write_rows(
        src / "b1.json",
        [("ingest", i, v) for i, v in items[4:]] + [("query", 900, items[0][1])],
    )
    _write_rows(src / "b2.json", [("query", 901, items[5][1])])
    _pin_mtimes(src, ["b0.json", "b1.json", "b2.json"])

    def index_rows(work):
        df = spark.read.parquet(f"{work}/ann_index")
        return sorted(
            (r["t"], r["bucket"], r["cand_id"]) for r in
            df.select("t", "bucket", "cand_id").collect()
        )

    def result_rows(work):
        df = spark.read.parquet(f"{work}/results")
        return sorted(
            (r["query_id"], r["cand_id"], r["cosine"], r["rnk"]) for r in df.collect()
        )

    # reference: uninterrupted drain
    assert run_streaming_ann_maintain(
        spark, str(src), str(tmp_path / "ref"), max_files_per_trigger=1
    )

    # injected failure: stop after >=1 committed batch, restart same ckpt
    work = tmp_path / "work"
    index_dir = f"{work}/ann_index"
    results_dir = f"{work}/results"
    metrics: list[dict] = []

    def start():
        return write_with_first_batch_setup(
            read_upsert_query_stream(spark, str(src), max_files_per_trigger=1),
            checkpoint_dir=f"{work}/ckpt",
            sink_writer=streaming_ann_maintain_writer(
                spark, index_dir, results_dir, metrics=metrics
            ),
            first_batch_setup=streaming_ann_maintain_reset(index_dir, results_dir),
            output_mode="append",
        )

    q = start()
    deadline = time.time() + 120
    while not metrics and time.time() < deadline:
        time.sleep(0.2)
    assert metrics, "no batch committed before the kill"
    q.stop()
    q.awaitTermination(60)

    q2 = start()
    assert q2.awaitTermination(180), "restarted stream did not drain"

    assert index_rows(work) == index_rows(tmp_path / "ref")
    assert result_rows(work) == result_rows(tmp_path / "ref")
    # no double-applied index rows
    idx = spark.read.parquet(index_dir)
    assert idx.count() == idx.select("t", "bucket", "cand_id").distinct().count()


def test_maintain_epoch_replay_is_idempotent(spark, tmp_path):
    """Deterministic epoch-replay check (the dedup stream's double-invoke
    discipline): re-running an epoch whose index/results writes already
    committed must leave index and served results byte-identical. Unlike
    the dedup stream there is no self-match hazard here — serving is a
    read, not a drop decision — so including the current epoch in the
    index read is correct; this test pins that the overwrite-by-batch-id
    epochs actually make the replay a no-op."""
    work = tmp_path / "work"
    index_dir = f"{work}/ann_index"
    results_dir = f"{work}/results"
    metrics: list[dict] = []
    write = streaming_ann_maintain_writer(
        spark, index_dir, results_dir, metrics=metrics
    )
    by_id = _collect_emb(spark, [42, 43])
    schema = "kind string, id long, embedding array<double>"
    b0 = spark.createDataFrame([("ingest", 42, by_id[42])], schema)
    b1 = spark.createDataFrame(
        [("ingest", 43, by_id[43]), ("query", 900, by_id[42])], schema
    )
    write(b0, 0)
    write(b1, 1)

    def snapshot():
        idx = sorted(
            tuple(r)
            for r in spark.read.parquet(index_dir)
            .select("t", "bucket", "cand_id")
            .collect()
        )
        res = sorted(tuple(r) for r in spark.read.parquet(results_dir).collect())
        return idx, res

    before = snapshot()
    write(b1, 1)  # the replay: same epoch, stale batch=1 rows on disk
    assert snapshot() == before
    assert (metrics[1]["n_ingest"], metrics[1]["n_queries"]) == (
        metrics[2]["n_ingest"],
        metrics[2]["n_queries"],
    )
