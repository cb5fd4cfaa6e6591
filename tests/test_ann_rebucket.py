"""Rebucket maintenance for the maintained ANN index (round 11): the
'more bits per code' density lever, executable and tested instead of
named. The growth probes established that serve cost grows linearly with
occupancy at fixed LSH_BITS; rebucket_ann_index widens the code during a
compaction rewrite and the maintained writer follows the manifest's width
for both post-rebucket ingest epochs and query probes.

Pinned here:
- refinement: the widened bucket mod 2^old_bits equals the old bucket for
  every row (the lsh_bucket_sql bit-packing property the job relies on);
- occupancy: max per-(t,bucket) occupancy strictly drops and the bucket
  space widens — the candidate-volume reset the lever buys;
- found-at-any-width: an exact-match query returns its vector at rank 1 /
  cosine 1.0 both before and after rebucketing (identical vectors are
  co-bucketed at every width), INCLUDING across the boundary in one
  resumed stream: pre-rebucket vectors served from the widened base,
  post-rebucket ingests written at the new width into delta epochs;
- the writer's epochs after rebucket really are at the new width (their
  buckets exceed the old 6-bit space for at least one row, and re-serving
  via read_maintained_index matches the stream's own results).
"""

from __future__ import annotations

import json
import os
import time

from realtime_twitter_trends_analytics_spark.operators.similarity import LSH_BITS
from realtime_twitter_trends_analytics_spark.sources.loaders import load_table
from realtime_twitter_trends_analytics_spark.streaming.ann_stream import (
    _read_compact_manifest,
    compact_ann_index,
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


def _pin_mtimes(src, names, base_offset=-60) -> None:
    now = time.time()
    for i, name in enumerate(names):
        t = now + base_offset + i * 10
        os.utime(src / name, (t, t))


def _corpus(spark, n):
    emb = load_table(spark, SF, "embeddings")
    rows = emb.filter(emb.vec_id < n).collect()
    return sorted(
        (int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in rows
    )


def test_rebucket_is_a_refinement_with_lower_occupancy(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    items = _corpus(spark, 120)
    _write_rows(src / "b0.json", [("ingest", i, v) for i, v in items[:60]])
    _write_rows(src / "b1.json", [("ingest", i, v) for i, v in items[60:]])
    _pin_mtimes(src, ["b0.json", "b1.json"])
    work = tmp_path / "work"
    assert run_streaming_ann_maintain(
        spark, str(src), str(work), max_files_per_trigger=1
    )
    index_dir = f"{work}/ann_index"
    compact_dir = f"{work}/ann_compact"

    old = {
        (r["t"], r["cand_id"]): r["bucket"]
        for r in spark.read.parquet(index_dir).collect()
    }
    stats = rebucket_ann_index(spark, index_dir, compact_dir, NEW_BITS)
    assert stats["lsh_bits"] == NEW_BITS
    manifest = _read_compact_manifest(compact_dir)
    assert manifest["lsh_bits"] == NEW_BITS

    new_rows = spark.read.parquet(compact_dir).collect()
    assert len(new_rows) == len(old)
    widened = 0
    occ_old: dict = {}
    occ_new: dict = {}
    for r in new_rows:
        nb = r["bucket"]
        ob = old[(r["t"], r["cand_id"])]
        # refinement: low bits unchanged
        assert nb % (2**LSH_BITS) == ob, (r["t"], r["cand_id"], ob, nb)
        if nb != ob:
            widened += 1
        occ_new[(r["t"], nb)] = occ_new.get((r["t"], nb), 0) + 1
    for (t, cand), b in old.items():
        occ_old[(t, b)] = occ_old.get((t, b), 0) + 1
    assert widened > 0  # the new planes actually fired
    assert len(occ_new) > len(occ_old)  # bucket space widened
    assert max(occ_new.values()) < max(occ_old.values())  # hot bucket shrank


def test_stream_continues_across_rebucket_boundary(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    items = _corpus(spark, 12)
    _write_rows(src / "b0.json", [("ingest", i, v) for i, v in items[:8]])
    _pin_mtimes(src, ["b0.json"], base_offset=-120)
    work = tmp_path / "work"
    assert run_streaming_ann_maintain(
        spark, str(src), str(work), max_files_per_trigger=1
    )
    index_dir = f"{work}/ann_index"
    compact_dir = f"{work}/ann_compact"
    rebucket_ann_index(spark, index_dir, compact_dir, NEW_BITS)

    # resume: ingest 4 more at the NEW width, query one old + one new
    _write_rows(src / "b1.json", [("ingest", i, v) for i, v in items[8:]])
    _write_rows(
        src / "b2.json",
        [("query", 900, items[0][1]), ("query", 901, items[8][1])],
    )
    _pin_mtimes(src, ["b1.json", "b2.json"], base_offset=-30)
    assert run_streaming_ann_maintain(
        spark, str(src), str(work), max_files_per_trigger=1
    )

    res = spark.read.parquet(f"{work}/results")
    for qid, want in [(900, items[0][0]), (901, items[8][0])]:
        top = res.filter(f"query_id = {qid} AND rnk = 1").collect()
        assert len(top) == 1, (qid, top)
        assert top[0]["cand_id"] == want, (qid, top)
        assert abs(top[0]["cosine"] - 1.0) < 1e-9, (qid, top)

    # the post-rebucket delta epoch is at the new width: at least one of
    # its buckets lies outside the old 6-bit space (probability of all
    # 4 tables x 4 vectors keeping both new bits zero is ~(1/4)^16)
    delta = spark.read.parquet(f"{index_dir}/batch=1").collect()
    assert any(r["bucket"] >= 2**LSH_BITS for r in delta), delta

    # base+delta read serves the same rows the stream served
    from realtime_twitter_trends_analytics_spark.streaming.ann_stream import (
        _serve_topk,
    )

    queries = spark.createDataFrame(
        [(900, items[0][1]), (901, items[8][1])],
        "query_id long, embedding array<double>",
    )
    idx = read_maintained_index(spark, index_dir, compact_dir)
    again = {
        (r["query_id"], r["rnk"]): r["cand_id"]
        for r in _serve_topk(idx, queries, 10, False, n_bits=NEW_BITS).collect()
    }
    stream_rows = {
        (r["query_id"], r["rnk"]): r["cand_id"]
        for r in res.filter("query_id IN (900, 901)").collect()
    }
    assert again == stream_rows


def test_narrowing_is_refused(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    items = _corpus(spark, 4)
    _write_rows(src / "b0.json", [("ingest", i, v) for i, v in items])
    _pin_mtimes(src, ["b0.json"])
    work = tmp_path / "work"
    assert run_streaming_ann_maintain(
        spark, str(src), str(work), max_files_per_trigger=1
    )
    index_dir = f"{work}/ann_index"
    gen1 = f"{work}/gen1"
    gen2 = f"{work}/gen2"
    rebucket_ann_index(spark, index_dir, gen1, NEW_BITS)
    try:
        compact_ann_index(
            spark, index_dir, gen2, base_compact_dir=gen1, new_bits=LSH_BITS
        )
        raise AssertionError("narrowing must be refused")
    except ValueError as e:
        assert "narrow" in str(e)
    # plain re-compaction of a rebucketed base KEEPS the wide code
    s = compact_ann_index(spark, index_dir, gen2, base_compact_dir=gen1)
    assert s["lsh_bits"] == NEW_BITS


def test_promoted_generation_serves_through_running_stream(spark, tmp_path):
    """The LSM superblock (round 11): generation n+1 compacts to a FRESH
    dir and promote_compacted_generation flips the _CURRENT pointer — the
    SAME maintained stream (same checkpoint, same writer wiring) serves
    the new base on its next trigger. Combined with rebucket: gen2 widens
    the code, so the post-promotion epoch must be written at the new
    width and queries must find vectors from every phase."""
    from realtime_twitter_trends_analytics_spark.streaming.ann_stream import (
        promote_compacted_generation,
        prune_absorbed_epochs,
    )

    src = tmp_path / "src"
    src.mkdir()
    items = _corpus(spark, 12)
    work = tmp_path / "work"
    index_dir = f"{work}/ann_index"
    compact_dir = f"{work}/ann_compact"  # the runner's fixed default

    # phase 1: ingest, drain, gen1 compaction IN PLACE (no pointer yet)
    _write_rows(src / "b0.json", [("ingest", i, v) for i, v in items[:4]])
    _pin_mtimes(src, ["b0.json"], base_offset=-180)
    assert run_streaming_ann_maintain(
        spark, str(src), str(work), max_files_per_trigger=1
    )
    compact_ann_index(spark, index_dir, compact_dir, n_partitions=2)
    prune_absorbed_epochs(index_dir, compact_dir)

    # phase 2: more ingest through the same checkpoint (delta epochs)
    _write_rows(src / "b1.json", [("ingest", i, v) for i, v in items[4:8]])
    _pin_mtimes(src, ["b1.json"], base_offset=-120)
    assert run_streaming_ann_maintain(
        spark, str(src), str(work), max_files_per_trigger=1
    )

    # gen2: rebucket [gen1 base + delta] into a fresh dir, promote
    gen2 = f"{work}/ann_compact_gen2"
    stats = rebucket_ann_index(
        spark, index_dir, gen2, NEW_BITS, base_compact_dir=compact_dir
    )
    assert (stats["generation"], stats["lsh_bits"]) == (2, NEW_BITS)
    promote_compacted_generation(compact_dir, gen2)
    prune_absorbed_epochs(index_dir, compact_dir)  # pointer-resolved

    # phase 3: the SAME stream continues — ingest at the promoted width,
    # then query one vector from each phase
    _write_rows(src / "b2.json", [("ingest", i, v) for i, v in items[8:]])
    _write_rows(
        src / "b3.json",
        [
            ("query", 900, items[0][1]),
            ("query", 901, items[4][1]),
            ("query", 902, items[8][1]),
        ],
    )
    _pin_mtimes(src, ["b2.json", "b3.json"], base_offset=-30)
    assert run_streaming_ann_maintain(
        spark, str(src), str(work), max_files_per_trigger=1
    )

    res = spark.read.parquet(f"{work}/results")
    for qid, want in [(900, items[0][0]), (901, items[4][0]), (902, items[8][0])]:
        top = res.filter(f"query_id = {qid} AND rnk = 1").collect()
        assert len(top) == 1, (qid, top)
        assert top[0]["cand_id"] == want, (qid, top)
        assert abs(top[0]["cosine"] - 1.0) < 1e-9, (qid, top)

    # the post-promotion epoch really is at the promoted width
    delta = spark.read.parquet(f"{index_dir}/batch=2").collect()
    assert any(r["bucket"] >= 2**LSH_BITS for r in delta), delta
    # absorbed epochs were pruned through the pointer; batch=2 survives
    assert not os.path.exists(f"{index_dir}/batch=1")
    assert os.path.exists(f"{index_dir}/batch=2")

    # a FRESH stream (new checkpoint/work dir reset) must not resurrect
    # the promoted base: batch-0 reset clears pointer + target
    src2 = tmp_path / "src2"
    src2.mkdir()
    _write_rows(src2 / "b0.json", [("query", 950, items[0][1])])
    _pin_mtimes(src2, ["b0.json"])
    import shutil

    shutil.rmtree(f"{work}/ckpt", ignore_errors=True)
    assert run_streaming_ann_maintain(
        spark, str(src2), str(work), max_files_per_trigger=1
    )
    res2 = spark.read.parquet(f"{work}/results")
    assert res2.filter("query_id = 950").count() == 0  # empty index again
    assert not os.path.exists(gen2)
    assert not os.path.exists(compact_dir + "_CURRENT")
