"""The TWO-LEVEL coarse quantizer (round 14 — the K~1e6 wall SCALE.md
named past the sharded single-level face).

ml.nearest_centroid_two_level groups the K centroids under S ~= sqrt(K)
super-cells (ml.two_level_rows — the same fixed-point Lloyd semantics as
level 1, run over the K centroid rows, never the corpus), ranks the
super-cells per vector (stage 1: literal top-p at S <= K_LITERAL_CEILING,
p rounds of the excluded relation argmin past it), then equi-joins probed
cells to their sub-centroid groups and takes the keyed argmin (stage 2:
broadcast below BROADCAST_CENTROID_BYTES, shuffle_hash equi-join past it).

Pinned here:
1. EXACTNESS at p >= S: identical rows to the flat nearest_centroid —
   below the ceiling (vs the literal face) AND above it (vs the relation
   face under a lowered ceiling), carry columns riding through.
2. The iterated stage-1 arm (the S > ceiling path) equals the literal
   stage-1 arm at every p — the excluded-argmin prefix IS the topn.
3. The stage-2 shuffle face equals the broadcast face, and actually plans
   a shuffle join (no broadcast of the group relation).
4. Empty super-cells are dropped (live-cell filtering): every input key
   still gets a candidate and exactness still holds.
5. The super-level Lloyd rounds dispatch their audit label with the face
   (kmeans_super_round_rel whitelisted — the ADVICE-r13 rule).
6. The approximate serving arm (p=SUPER_PROBES) agrees with the flat
   argmin on >= 90% of the sf0.001 corpus (deterministic fixture — the
   exact rate is stable), while the gate query ml_kmeans_two_level
   value-oracles its full semantics against DuckDB every round.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import realtime_twitter_trends_analytics_spark.operators.ml as ml
from realtime_twitter_trends_analytics_spark.operators.ml import (
    kmeans_centroid_rows,
    nearest_centroid,
    nearest_centroid_two_level,
    quantized_vectors,
    s_for_k,
    two_level_rows,
)

SF = "/root/testdata/sf0.001"
DIM = 8


def _fixture(spark, n_cent: int, n_vec: int):
    cents = [
        (cl, [((cl * 37 + d * 19 + (cl * d) % 7) % 201) - 100 for d in range(DIM)])
        for cl in range(n_cent)
    ]
    vecs = [
        (i, [((i * 11 + d * 5 + (i * d) % 13) % 201) - 100 for d in range(DIM)])
        for i in range(n_vec)
    ]
    df = spark.createDataFrame(vecs, "vec_id long, qe array<bigint>")
    return cents, df


def _arg_rows(df):
    return sorted(
        (r["vec_id"], r["m"]["d2"], r["m"]["cl"]) for r in df.collect()
    )


def test_s_for_k():
    assert s_for_k(1) == 1
    assert s_for_k(8) == 3
    assert s_for_k(16) == 4
    assert s_for_k(17) == 5
    assert s_for_k(10**6) == 1000


def test_exact_arm_equals_flat_argmin(spark):
    """probes >= S joins every group -> all K candidates, same min(struct)
    tie order: bit-equal to the flat argmin, carry columns included."""
    cents, df = _fixture(spark, 60, 80)
    plan = two_level_rows(spark, cents)
    assert len(plan[0]) <= s_for_k(60)
    flat = nearest_centroid(df, cents, ["vec_id"], carry=["qe"], force="literal")
    two = nearest_centroid_two_level(
        df, cents, ["vec_id"], carry=["qe"], probes=10**9, plan=plan
    )
    key = lambda d: sorted(  # noqa: E731
        (r["vec_id"], tuple(r["qe"]), r["m"]["d2"], r["m"]["cl"])
        for d_ in [d]
        for r in d_.collect()
    )
    assert key(two) == key(flat)


def test_exact_arm_equals_flat_above_ceiling(spark, monkeypatch):
    """With the ceiling lowered below K, the FLAT face runs the broadcast
    relation and the two-level face still matches it exactly at p >= S —
    the hierarchy loses nothing the flat relation face has."""
    cents, df = _fixture(spark, 48, 50)
    monkeypatch.setattr(ml, "K_LITERAL_CEILING", 16)
    flat = nearest_centroid(df, cents, ["vec_id"])  # auto: relation face
    plan = two_level_rows(spark, cents)
    two = nearest_centroid_two_level(df, cents, ["vec_id"], probes=10**9, plan=plan)
    assert _arg_rows(two) == _arg_rows(flat)


@pytest.mark.parametrize("p", [1, 2, 4])
def test_iterated_stage1_equals_literal(spark, p):
    """The excluded-argmin rounds (the S > K_LITERAL_CEILING stage-1 arm)
    pick exactly the literal top-p prefix — final rows identical at every
    p, approximate arms included."""
    cents, df = _fixture(spark, 70, 60)
    plan = two_level_rows(spark, cents)
    lit = nearest_centroid_two_level(
        df, cents, ["vec_id"], probes=p, plan=plan, force_stage1="literal"
    )
    it = nearest_centroid_two_level(
        df, cents, ["vec_id"], probes=p, plan=plan, force_stage1="iterated"
    )
    assert _arg_rows(it) == _arg_rows(lit)


def test_iterated_stage1_sharded_supers(spark, monkeypatch):
    """Iterated stage 1 with the super relation itself SHARDED (forced tiny
    broadcast budget) — the per-shard excluded argmin + union-min still
    picks the exact top-p prefix."""
    cents, df = _fixture(spark, 70, 40)
    plan = two_level_rows(spark, cents)
    want = _arg_rows(
        nearest_centroid_two_level(
            df, cents, ["vec_id"], probes=2, plan=plan, force_stage1="literal"
        )
    )
    monkeypatch.setattr(ml, "BROADCAST_CENTROID_BYTES", 256)
    assert len(ml._centroid_shards(plan[0])) > 1
    got = _arg_rows(
        nearest_centroid_two_level(
            df, cents, ["vec_id"], probes=2, plan=plan, force_stage1="iterated"
        )
    )
    assert got == want


def test_stage2_shuffle_face_equals_broadcast(spark):
    """force_join="shuffle" plans a shuffle equi-join on g (no broadcast of
    the group relation — the K > BROADCAST_CENTROID_BYTES arm) and returns
    the identical rows."""
    cents, df = _fixture(spark, 60, 50)
    plan = two_level_rows(spark, cents)
    bc = nearest_centroid_two_level(df, cents, ["vec_id"], probes=2, plan=plan)
    sh = nearest_centroid_two_level(
        df, cents, ["vec_id"], probes=2, plan=plan, force_join="shuffle"
    )
    splan = sh._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in splan
    assert "BroadcastHashJoin" not in splan
    assert _arg_rows(sh) == _arg_rows(bc)


def test_empty_super_cell_dropped(spark):
    """Duplicate seed centroids force a super-cell empty in round 1 (ties
    break to the lowest g); the live-cell filter drops it, every key still
    yields a candidate, and the exact arm still equals flat."""
    base = [
        (cl, [((cl * 37 + d * 19) % 201) - 100 for d in range(DIM)])
        for cl in range(20)
    ]
    # seeds are the first S=5 in cl order; make seeds 0 and 1 identical
    cents = [(0, base[1][1])] + base[1:]
    df = spark.createDataFrame(
        [(i, [((i * 11 + d * 5) % 201) - 100 for d in range(DIM)]) for i in range(30)],
        "vec_id long, qe array<bigint>",
    )
    super_rows, group_rows = two_level_rows(spark, cents)
    assert len(super_rows) < s_for_k(len(cents))
    assert {g for g, _, _ in group_rows} == {g for g, _ in super_rows}
    flat = nearest_centroid(df, cents, ["vec_id"], force="literal")
    two = nearest_centroid_two_level(
        df, cents, ["vec_id"], probes=10**9, plan=(super_rows, group_rows)
    )
    assert _arg_rows(two) == _arg_rows(flat)
    # and the approximate arm still covers every key
    ap = nearest_centroid_two_level(
        df, cents, ["vec_id"], probes=1, plan=(super_rows, group_rows)
    )
    assert len(ap.collect()) == 30


def test_super_round_audit_label_dispatches(spark, monkeypatch):
    """When S exceeds the (lowered) ceiling the super Lloyd rounds run the
    relation face and their audit capture lands under the WHITELISTED
    kmeans_super_round_rel label (the ADVICE-r13 / kmeans_update_round_rel
    rule)."""
    from realtime_twitter_trends_analytics_spark.audit import audit_plans
    from tests.test_plan_hygiene import AUDIT_CARTESIAN_OK

    assert "kmeans_super_round_rel" in AUDIT_CARTESIAN_OK
    cents, _df = _fixture(spark, 16, 1)
    monkeypatch.setattr(ml, "K_LITERAL_CEILING", 2)
    two_level_rows(spark, cents)  # S = 4 > 2 -> relation-face training
    plans = audit_plans()
    assert "kmeans_super_round_rel" in plans
    lit = plans.get("kmeans_super_round")
    if lit is not None:
        assert "CartesianProduct" not in lit
        assert "BroadcastNestedLoopJoin" not in lit


def test_serving_arm_agreement_on_sf_table(spark):
    """The approximate serving arm (p=SUPER_PROBES=2 of S=3) agrees with
    the flat argmin on >= 90% of the sf0.001 corpus — deterministic
    fixture, so the rate is a stable regression floor (the measured value
    is recorded in SCALE_SMOKE.md by tools/coarse_probe.py)."""
    rows = kmeans_centroid_rows(spark, SF)
    q = quantized_vectors(spark, SF)
    plan = ml.two_level_plan_for(spark, SF)
    flat = nearest_centroid(q, rows, ["vec_id"]).select(
        "vec_id", F.col("m.cl").alias("flat_cl")
    )
    two = nearest_centroid_two_level(q, rows, ["vec_id"], plan=plan).select(
        "vec_id", F.col("m.cl").alias("two_cl")
    )
    j = flat.join(two, "vec_id")
    n, same = j.select(
        F.count(F.lit(1)), F.sum((F.col("flat_cl") == F.col("two_cl")).cast("int"))
    ).first()
    assert n == q.count()
    assert same / n >= 0.90, f"agreement {same}/{n}"


def test_empty_inputs_refuse_loudly(spark):
    q = quantized_vectors(spark, SF)
    with pytest.raises(ValueError, match="no centroids"):
        nearest_centroid_two_level(q, [], ["vec_id"])
    with pytest.raises(ValueError, match="no centroids"):
        two_level_rows(spark, [])
