"""The dispatched PQ encode/LUT (round 14, ADVICE r13 item 3): pq_codes_sql
/ pq_lut_sql unroll one subexpression per (block, code) — no hard refusal
up to 65k entries (unlike the centroid wall), but the PLAN cost is
O(entries) PER CALL (~5 s at a production 8-bit codebook's 4096 entries),
paid per micro-batch in the streaming ingest/serve hot paths. Past
PQ_LITERAL_CEILING the codebook becomes DATA:

- pq_encode: broadcast equi-join on block + min(struct(d2, code)) keyed
  argmin (the batch _pq_assign shape) — map-side partial reduction, so the
  exchange moves N*blocks rows; corpus-SAFE.
- pq_query_lut: per-(key, block) live-code distance map densified over
  n_slots with DEAD_CODE_D2 padding — collect_list buffering, so it is
  QUERY-SIDE-ONLY with the same checked max_rows contract as
  nearest_centroids_topn.

Pinned here (the test_coarse_relation.py pins, PQ flavor):
1. EQUALITY at the gate codebook: both faces, encode and LUT, on the real
   sf tables.
2. The relation faces RUN past the REAL ceiling (a synthetic codebook
   above PQ_LITERAL_CEILING entries, where the literal face refuses) and
   match an independent Python brute force.
3. Dead-codeword parity: a dead (block, code) slot never wins the encode
   and pads the LUT with the stored DEAD_CODE_D2 constant in BOTH faces.
4. The REAL serve/ingest paths (encode_ivfpq_rows, _serve_ivfpq_topk) run
   through the PQ relation dispatch under a lowered ceiling — alone and
   combined with the lowered CENTROID ceiling (the 2x2 dispatch corner) —
   and produce identical rows.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import realtime_twitter_trends_analytics_spark.operators.ml as ml
from realtime_twitter_trends_analytics_spark.operators.ml import (
    DEAD_CODE_D2,
    PQ_LITERAL_CEILING,
    pq_codebook_rows,
    pq_encode,
    pq_query_lut,
    quantized_vectors,
)

SF = "/root/testdata/sf0.001"


def _rows_of(df):
    return sorted(map(tuple, df.collect()))


def _flat_codes(df):
    return _rows_of(
        df.select("vec_id", F.posexplode("codes").alias("block", "code"))
    )


def _flat_lut(df):
    return _rows_of(
        df.select("vec_id", F.posexplode("lut").alias("block", "arr"))
        .select("vec_id", "block", F.posexplode("arr").alias("slot", "d2"))
    )


# ---------------------------------------------------------------- equality


def test_pq_encode_relation_equals_literal(spark):
    cb = pq_codebook_rows(spark, SF)
    q = quantized_vectors(spark, SF)
    lit = pq_encode(q, cb, ["vec_id"], force="literal")
    rel = pq_encode(q, cb, ["vec_id"], force="relation")
    assert _flat_codes(lit) == _flat_codes(rel)


def test_pq_lut_relation_equals_literal(spark):
    cb = pq_codebook_rows(spark, SF)
    q = quantized_vectors(spark, SF).filter(F.col("vec_id") < 20)
    lit = pq_query_lut(q, cb, ["vec_id"], force="literal")
    rel = pq_query_lut(q, cb, ["vec_id"], force="relation", max_rows=20)
    assert _flat_lut(lit) == _flat_lut(rel)


def test_pq_lut_max_rows_contract(spark):
    cb = pq_codebook_rows(spark, SF)
    q = quantized_vectors(spark, SF)
    n_q = q.count()
    with pytest.raises(ValueError, match="query-side bound"):
        pq_query_lut(q, cb, ["vec_id"], force="relation", max_rows=n_q - 1)


# ------------------------------------------------- past the REAL ceiling

SUB = 4  # sub_dim; geometry derives from the codebook, 4 keeps d2 grids cheap


def _big_codebook(n_blocks: int, n_codes: int):
    return [
        (b, c, [((b * 31 + c * 7 + d * 3) % 201) - 100 for d in range(SUB)])
        for b in range(n_blocks)
        for c in range(n_codes)
    ]


def _vecs(spark, n: int, dim: int):
    rows = [
        (i, [((i * 13 + d * 5) % 201) - 100 for d in range(dim)])
        for i in range(n)
    ]
    return rows, spark.createDataFrame(rows, "vec_id long, qe array<bigint>")


def _brute_codes(cb, vec):
    by_block: dict = {}
    for b, c, v in cb:
        by_block.setdefault(b, {})[c] = v
    out = []
    for b in sorted(by_block):
        scored = sorted(
            (
                sum(
                    (x - y) * (x - y)
                    for x, y in zip(vec[b * SUB : (b + 1) * SUB], v)
                ),
                c,
            )
            for c, v in by_block[b].items()
        )
        out.append(scored[0][1])
    return out


def test_pq_faces_run_past_real_ceiling(spark):
    n_blocks, n_codes = 16, 160  # 2560 entries > PQ_LITERAL_CEILING=2048
    cb = _big_codebook(n_blocks, n_codes)
    assert len(cb) > PQ_LITERAL_CEILING
    rows, df = _vecs(spark, 30, n_blocks * SUB)
    with pytest.raises(ValueError, match="PQ_LITERAL_CEILING"):
        pq_encode(df, cb, ["vec_id"], force="literal")
    got = {
        r["vec_id"]: list(r["codes"])
        for r in pq_encode(df, cb, ["vec_id"]).collect()  # auto-dispatch
    }
    assert len(got) == len(rows)
    for i, v in rows:
        assert got[i] == _brute_codes(cb, v), f"vec {i}"


def test_pq_lut_past_ceiling_matches_brute(spark):
    n_blocks, n_codes = 16, 160
    cb = _big_codebook(n_blocks, n_codes)
    rows, df = _vecs(spark, 5, n_blocks * SUB)
    got = {
        r["vec_id"]: [list(a) for a in r["lut"]]
        for r in pq_query_lut(df, cb, ["vec_id"], max_rows=5).collect()
    }
    by_block: dict = {}
    for b, c, v in cb:
        by_block.setdefault(b, {})[c] = v
    for i, vec in rows:
        for b in range(n_blocks):
            subv = vec[b * SUB : (b + 1) * SUB]
            for c in range(n_codes):
                want = sum(
                    (x - y) * (x - y) for x, y in zip(subv, by_block[b][c])
                )
                assert got[i][b][c] == want, f"vec {i} block {b} code {c}"


# ------------------------------------------------------- dead-code parity


def test_dead_code_parity_across_faces(spark):
    """A dead (block, code) row is simply ABSENT from the codebook: both
    faces must never emit it from the encode and must pad its LUT slot
    with the stored DEAD_CODE_D2 constant (never a computed/squared
    sentinel — the r12 overflow)."""
    cb = [
        (b, c, [(b * 11 + c * 5 + d) % 50 - 25 for d in range(SUB)])
        for b in range(2)
        for c in range(ml.PQ_K)
        if not (b == 1 and c == 3)  # kill block 1, code 3
    ]
    rows, df = _vecs(spark, 12, 2 * SUB)
    enc = {}
    lut = {}
    for face in ("literal", "relation"):
        enc[face] = _flat_codes(pq_encode(df, cb, ["vec_id"], force=face))
        lut[face] = _flat_lut(
            pq_query_lut(df, cb, ["vec_id"], force=face, max_rows=12)
        )
    assert enc["literal"] == enc["relation"]
    assert lut["literal"] == lut["relation"]
    dead = [
        (v, bl, slot, d2)
        for v, bl, slot, d2 in lut["relation"]
        if bl == 1 and slot == 3
    ]
    assert dead and all(d2 == DEAD_CODE_D2 for *_x, d2 in dead)
    assert all(code != 3 or bl != 1 for _v, bl, code in enc["relation"])


# ---------------------- the REAL serve/ingest paths through the dispatch


def test_encode_and_serve_through_pq_relation_face(spark, monkeypatch):
    """encode_ivfpq_rows and _serve_ivfpq_topk run END-TO-END through the
    PQ relation dispatch under a lowered ceiling (gate codebook = 128
    entries > 64) and produce IDENTICAL rows to the literal face — then
    the 2x2 corner: BOTH ceilings lowered, so the coarse ranking rides the
    centroid relation while the codes/LUT ride the codebook relation."""
    from realtime_twitter_trends_analytics_spark.sources.loaders import load_table
    from realtime_twitter_trends_analytics_spark.streaming.ivfpq_stream import (
        _serve_ivfpq_topk,
        build_ivfpq_model,
        encode_ivfpq_rows,
    )

    emb = load_table(spark, SF, "embeddings").filter(F.col("vec_id") < 80)
    corpus = emb.select(
        F.col("vec_id").alias("cand_id"), "embedding"
    ).localCheckpoint()
    model = build_ivfpq_model(spark, SF)
    queries = spark.createDataFrame(
        [
            (900 + int(r["cand_id"]), [float(x) for x in r["embedding"]])
            for r in corpus.limit(5).collect()
        ],
        "query_id long, embedding array<double>",
    )

    def run():
        idx = encode_ivfpq_rows(corpus, model)
        enc = _rows_of(idx)
        srv = _rows_of(
            _serve_ivfpq_topk(
                idx.localCheckpoint(), queries, model, 10, False,
                broadcast_queries=True,
            )
        )
        return enc, srv

    want_enc, want_srv = run()
    assert len(model["codebook"]) == 128  # the gate geometry
    try:
        monkeypatch.setattr(ml, "PQ_LITERAL_CEILING", 64)
        got_enc, got_srv = run()
        monkeypatch.setattr(ml, "K_LITERAL_CEILING", 4)  # both walls down
        both_enc, both_srv = run()
    finally:
        monkeypatch.undo()
    assert got_enc == want_enc and got_srv == want_srv
    assert both_enc == want_enc and both_srv == want_srv


# ------------------------------------- batch-aware (N-dependent) dispatch


def test_crossover_model_reproduces_measurement():
    """pq_crossover_entries is the measured cost model (SCALE_SMOKE.md):
    monotone in the batch bound, and it reproduces the observed N=2000
    crossover (~512 entries at 16 blocks) within the probe's noise."""
    c500 = ml.pq_crossover_entries(500, 16)
    c2000 = ml.pq_crossover_entries(2000, 16)
    c32000 = ml.pq_crossover_entries(32000, 16)
    assert c500 < c2000 < c32000
    assert 400 <= c2000 <= 650, c2000
    # a corpus-sized batch amortizes the plan tax past the policy ceiling
    assert ml.pq_crossover_entries(10**6, 16) > PQ_LITERAL_CEILING


def test_batch_hint_dispatches_to_relation(spark):
    """Below the entries ceiling, a small declared batch takes the
    relation face (the literal plan tax dominates) while a large one
    stays literal — and the faces stay row-identical either way."""
    cb = [
        (b, c, [((b * 31 + c * 7 + d * 3) % 201) - 100 for d in range(8)])
        for b in range(16)
        for c in range(64)
    ]  # 1024 entries: between crossover(small N) and PQ_LITERAL_CEILING
    vecs = spark.createDataFrame(
        [
            (i, [((i * 29 + d * 7) % 201) - 100 for d in range(128)])
            for i in range(200)
        ],
        "vec_id long, qe array<bigint>",
    )
    assert ml._use_pq_relation(1024, None, batch_rows=200, n_blocks=16)
    assert not ml._use_pq_relation(1024, None, batch_rows=10**6, n_blocks=16)
    assert not ml._use_pq_relation(1024, None)  # no hint: entries-only rule
    small = pq_encode(vecs, cb, ["vec_id"], batch_rows=200)
    big = pq_encode(vecs, cb, ["vec_id"], batch_rows=10**6)
    plan_small = small._jdf.queryExecution().executedPlan().toString()
    plan_big = big._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan_small  # relation face
    assert "Join" not in plan_big  # literal face: one map-side projection
    flat = lambda df: sorted(  # noqa: E731
        (r["vec_id"], tuple(r["codes"])) for r in df.collect()
    )
    assert flat(small) == flat(big)
    # the LUT face takes the same hint (query side, bounded by max_rows)
    lut_rel = pq_query_lut(
        vecs, cb, ["vec_id"], max_rows=200, batch_rows=200
    )
    assert (
        "BroadcastHashJoin"
        in lut_rel._jdf.queryExecution().executedPlan().toString()
    )


def test_encode_ivfpq_rows_takes_batch_hint(spark, monkeypatch):
    """The streaming ingest hot path forwards its per-trigger bound: with
    the plan tax inflated (monkeypatched cost model) the gate model's 128
    entries dispatch to the relation face, rows identical to literal."""
    from realtime_twitter_trends_analytics_spark.streaming.ivfpq_stream import (
        build_ivfpq_model,
        encode_ivfpq_rows,
    )

    emb = (
        quantized_vectors(spark, SF)
        .limit(120)
        .selectExpr(
            "vec_id AS cand_id",
            "transform(qe, x -> CAST(x AS DOUBLE) / 1024.0) AS embedding",
        )
        .localCheckpoint()
    )
    model = build_ivfpq_model(spark, SF)
    want = _rows_of(
        encode_ivfpq_rows(emb, model).select("cell", "cand_id", "codes")
    )
    monkeypatch.setattr(ml, "PQ_PLAN_SEC_PER_ENTRY", 1.0)  # tax >> relation
    got_df = encode_ivfpq_rows(emb, model, batch_rows=120)
    assert (
        "BroadcastHashJoin"
        in got_df._jdf.queryExecution().executedPlan().toString()
    )
    got = _rows_of(got_df.select("cell", "cand_id", "codes"))
    assert got == want
