"""Mixed bucket-width delta hazard (round 12, the ADVICE r11 MEDIUM item).

The scenario: a maintained stream keeps committing epochs while a
rebucket compaction runs. Any epoch committed BETWEEN the rebucket's
epoch snapshot and the ``_CURRENT`` pointer flip is written at the OLD
lsh_bits yet has batch_id > the new generation's absorbed_through — after
promotion, the base+delta union would probe it at the NEW width and its
vectors would suffer silent recall loss (findable only when the widened
code happens to land inside the multi-probe radius).

The fix pinned here: every epoch carries an ``_EPOCH_META.json`` stamp of
the width it was written at, and ``read_maintained_index`` REHASHES any
delta it cannot prove matches the serve width (stamp mismatched or stamp
missing) from the carried vectors — a map-side projection over the small
delta only. Asserted:

- the hazard is real: the stranded epoch's stored buckets differ from
  their serve-width rehash (the new planes fired);
- after promotion, the SAME resumed stream finds a pre-rebucket vector
  AND the stranded epoch's vector at rank 1 / cosine 1.0;
- an UNSTAMPED stranded epoch (replay died between the parquet overwrite
  and the re-stamp, or a pre-r12 layout) serves identically — missing
  stamp means untrusted, not assumed-current;
- a matching stamp passes through untouched (no rehash in the plan).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from realtime_twitter_trends_analytics_spark.operators.similarity import LSH_BITS
from realtime_twitter_trends_analytics_spark.sources.loaders import load_table
from realtime_twitter_trends_analytics_spark.streaming.ann_stream import (
    EPOCH_META,
    _bucket_rehash_expr,
    _read_epoch_meta,
    _serve_topk,
    promote_compacted_generation,
    read_maintained_index,
    rebucket_ann_index,
    run_streaming_ann_maintain,
)

SF = "/root/testdata/sf0.001"
NEW_BITS = LSH_BITS + 2


def _write_rows(path, rows) -> None:
    with open(path, "w") as fh:
        for kind, rid, emb in rows:
            fh.write(json.dumps({"kind": kind, "id": rid, "embedding": emb}) + "\n")


def _corpus(spark, n):
    emb = load_table(spark, SF, "embeddings")
    rows = emb.filter(emb.vec_id < n).collect()
    return sorted(
        (int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in rows
    )


def test_stranded_old_width_epoch_served_after_promotion(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    items = _corpus(spark, 12)
    work = tmp_path / "work"
    index_dir = f"{work}/ann_index"
    compact_dir = f"{work}/ann_compact"

    # phase 1: ingest at the gate width, drain
    _write_rows(src / "b0.json", [("ingest", i, v) for i, v in items[:4]])
    now = time.time()
    os.utime(src / "b0.json", (now - 180, now - 180))
    assert run_streaming_ann_maintain(
        spark, str(src), str(work), max_files_per_trigger=1
    )
    assert _read_epoch_meta(f"{index_dir}/batch=0") == LSH_BITS

    # rebucket snapshots the CURRENT epochs into a widened fresh gen —
    # but the pointer is NOT flipped yet (long compaction on a live
    # stream: this is the in-between window)
    gen2 = f"{work}/ann_compact_gen2"
    rebucket_ann_index(spark, index_dir, gen2, NEW_BITS)

    # the stream keeps running inside the window: batch=1 commits at the
    # OLD width (no manifest at the runner's compact_dir yet)
    _write_rows(src / "b1.json", [("ingest", i, v) for i, v in items[4:8]])
    os.utime(src / "b1.json", (now - 120, now - 120))
    assert run_streaming_ann_maintain(
        spark, str(src), str(work), max_files_per_trigger=1
    )
    assert _read_epoch_meta(f"{index_dir}/batch=1") == LSH_BITS

    # flip the pointer: batch=1 is now a delta STRANDED at the old width
    promote_compacted_generation(compact_dir, gen2)

    # the hazard is real: batch=1's stored buckets are NOT the serve-width
    # buckets (at least one row widens — (1/4)^16 failure odds)
    stored = spark.read.parquet(f"{index_dir}/batch=1")
    rehashed = stored.withColumn("nb", F.expr(_bucket_rehash_expr(NEW_BITS)))
    diffs = rehashed.filter(F.col("nb") != F.col("bucket")).count()
    assert diffs > 0

    # phase 3: the SAME stream resumes and queries one vector from the
    # widened base and one from the stranded epoch — both must be found
    _write_rows(
        src / "b2.json",
        [("query", 900, items[0][1]), ("query", 901, items[4][1])],
    )
    os.utime(src / "b2.json", (now - 60, now - 60))
    assert run_streaming_ann_maintain(
        spark, str(src), str(work), max_files_per_trigger=1
    )
    res = spark.read.parquet(f"{work}/results")
    for qid, want in [(900, items[0][0]), (901, items[4][0])]:
        top = res.filter(f"query_id = {qid} AND rnk = 1").collect()
        assert len(top) == 1, (qid, top)
        assert top[0]["cand_id"] == want, (qid, top)
        assert abs(top[0]["cosine"] - 1.0) < 1e-9, (qid, top)

    # unstamped variant of the same stranded epoch: missing stamp means
    # untrusted -> rehash; the served rows must be identical
    queries = spark.createDataFrame(
        [(900, items[0][1]), (901, items[4][1])],
        "query_id long, embedding array<double>",
    )
    before = {
        (r["query_id"], r["rnk"]): r["cand_id"]
        for r in _serve_topk(
            read_maintained_index(spark, index_dir, compact_dir),
            queries, 10, False, n_bits=NEW_BITS,
        ).collect()
    }
    os.remove(f"{index_dir}/batch=1/{EPOCH_META}")
    assert _read_epoch_meta(f"{index_dir}/batch=1") is None
    after = {
        (r["query_id"], r["rnk"]): r["cand_id"]
        for r in _serve_topk(
            read_maintained_index(spark, index_dir, compact_dir),
            queries, 10, False, n_bits=NEW_BITS,
        ).collect()
    }
    assert before == after


def test_matching_stamp_passes_through_unrehashed(spark, tmp_path):
    """Steady state (no width change): the delta's stamp matches the
    serve width and the read plan carries NO rehash projection — the
    stored buckets ARE the served buckets."""
    src = tmp_path / "src"
    src.mkdir()
    items = _corpus(spark, 8)
    work = tmp_path / "work"
    index_dir = f"{work}/ann_index"
    compact_dir = f"{work}/ann_compact"

    _write_rows(src / "b0.json", [("ingest", i, v) for i, v in items[:4]])
    now = time.time()
    os.utime(src / "b0.json", (now - 120, now - 120))
    assert run_streaming_ann_maintain(
        spark, str(src), str(work), max_files_per_trigger=1
    )
    from realtime_twitter_trends_analytics_spark.streaming.ann_stream import (
        compact_ann_index,
    )

    compact_ann_index(spark, index_dir, compact_dir, n_partitions=2)
    _write_rows(src / "b1.json", [("ingest", i, v) for i, v in items[4:]])
    os.utime(src / "b1.json", (now - 60, now - 60))
    assert run_streaming_ann_maintain(
        spark, str(src), str(work), max_files_per_trigger=1
    )
    assert _read_epoch_meta(f"{index_dir}/batch=1") == LSH_BITS
    idx = read_maintained_index(spark, index_dir, compact_dir)
    served = {
        (r["t"], r["cand_id"]): r["bucket"]
        for r in idx.filter(
            F.col("cand_id").isin([i for i, _v in items[4:]])
        ).collect()
    }
    stored = {
        (r["t"], r["cand_id"]): r["bucket"]
        for r in spark.read.parquet(f"{index_dir}/batch=1").collect()
    }
    assert served == stored
    # and no rehash node in the executed plan for this read
    assert "element_at" not in idx._jdf.queryExecution().executedPlan().toString()
