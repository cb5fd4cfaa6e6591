"""Worst-case skew demo for the cell-blocked self-joins (VERDICT r4 item 7).

SemDeDup's known failure mode is a skewed giant cell: the within-cell
pairwise scan is O(sum cell^2), so one hot cell owns almost all the work.
This fixture PLANTS that case — one natural cluster at >=10x the mean
occupancy of the others — and asserts the structural bound that makes the
method scale anyway: the candidate set is exactly sum-over-cells C(n,2)
(per-cell products from the cell equi-join), never the all-pairs C(N,2),
and the giant cell's share is the documented hot spot, not an accident of
the test data. Companion to test_lsh_candidates_bounded_by_bucket_sizes
(the same property for LSH buckets); SCALE.md's SemDeDup section names
raising K as the production mitigation and points here.
"""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from realtime_twitter_trends_analytics_spark.functions import dialect as dl
from realtime_twitter_trends_analytics_spark.operators.ml import (
    EMB_DIM,
    K_CLUSTERS,
    _quant_sql,
    centroid_argmin_sql,
    kmeans_centroid_rows,
)
from realtime_twitter_trends_analytics_spark.operators.similarity import (
    dedup_semantic_cells,
)
from realtime_twitter_trends_analytics_spark.sources.loaders import load_table

GIANT_N = 200  # cluster 0 occupancy
SMALL_N = 5    # clusters 1..K-1 occupancy


def _vec(cluster: int, member: int) -> list[float]:
    """Deterministic member vector: one-hot direction per natural cluster
    (dims 8*cluster..8*cluster+7) + a tiny index-derived perturbation, so
    within-cluster cosine is ~1 (well above SEMDEDUP_THRESHOLD) and
    across-cluster cosine is ~0."""
    v = [0.0] * EMB_DIM
    base = cluster * 8
    for d in range(8):
        v[base + d] = 10.0 + ((member * 7 + d * 3) % 5 - 2) * 0.01
    return v


@pytest.fixture(scope="module")
def skew_dir(tmp_path_factory):
    """An embeddings table whose natural clusters are 1 giant + 7 small
    (40x mean-of-others occupancy). vec_ids 0..K-1 are one per cluster —
    they are the k-means seeds, so training converges onto exactly this
    cluster structure and cell 0 IS the planted giant."""
    from realtime_twitter_trends_analytics_spark.session import get_spark

    spark = get_spark("rtta-tests", cpus=8)
    out = tmp_path_factory.mktemp("skew_sf")
    rows = []
    # seeds first: vec_id i in cluster i (i < K_CLUSTERS)
    for c in range(K_CLUSTERS):
        rows.append((c, _vec(c, 0), c))
    nxt = K_CLUSTERS
    for c in range(K_CLUSTERS):
        n = (GIANT_N if c == 0 else SMALL_N) - 1
        for m in range(1, n + 1):
            rows.append((nxt, _vec(c, m), c))
            nxt += 1
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>, label int")
    df.coalesce(1).write.mode("overwrite").parquet(str(out / "embeddings.parquet"))
    return str(out)


def test_giant_cell_candidates_bounded_per_cell(spark, skew_dir):
    audit = dedup_semantic_cells(spark, skew_dir).collect()
    sizes = {r["cell"]: r["n_vectors"] for r in audit}
    n_total = sum(sizes.values())
    assert n_total == GIANT_N + (K_CLUSTERS - 1) * SMALL_N

    # the planted skew materialized: one cell at >=10x the mean of the rest
    giant = max(sizes.values())
    others = sorted(sizes.values())[:-1]
    assert giant >= 10 * (sum(others) / len(others))

    # recompute the operator's own cell assignment and count the ACTUAL
    # join candidates (no cosine filter): must equal sum C(n_cell, 2)
    # exactly — the per-cell bound — and be strictly below all-pairs
    rows = kmeans_centroid_rows(spark, skew_dir)
    emb = load_table(spark, skew_dir, "embeddings")
    cells = emb.select(
        "vec_id",
        F.expr(centroid_argmin_sql(rows, _quant_sql(dl.SPARK, "embedding")))
        .getField("cl")
        .alias("cell"),
    )
    a = cells.select("cell", F.col("vec_id").alias("a_id"))
    b = cells.select("cell", F.col("vec_id").alias("b_id"))
    n_cand = a.join(b, "cell").filter(F.col("a_id") < F.col("b_id")).count()
    assert n_cand == sum(n * (n - 1) // 2 for n in sizes.values())
    assert n_cand < math.comb(n_total, 2)

    # and the giant cell owns the candidate work — the documented hot spot
    # (production mitigation: raise K, SCALE.md SemDeDup section)
    assert math.comb(giant, 2) / n_cand > 0.9

    # the audit's dup accounting stays per-cell-consistent under skew
    for r in audit:
        assert r["n_dropped"] <= r["n_vectors"] - 1
        assert r["n_dup_pairs"] <= math.comb(r["n_vectors"], 2)


def test_giant_cell_join_is_equijoin_not_cartesian(spark, skew_dir):
    """Skew must not change the plan shape: the within-cell self-join stays
    a cell-id equi-join (hash/sort-merge), never a nested-loop product."""
    plan = dedup_semantic_cells(spark, skew_dir)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
