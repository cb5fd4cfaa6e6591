"""Invariant tests for the ML primitives (engine parity is covered by the
oracle gate; these check the algorithm means what it claims)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from realtime_twitter_trends_analytics_spark.functions import dialect as dl
from realtime_twitter_trends_analytics_spark.operators.ml import (
    K_CLUSTERS,
    KMEANS_SCALE,
    _quant_sql,
    _update,
    centroid_argmin_sql,
    ml_embedding_dim_variance,
    ml_kmeans_embeddings,
)
from realtime_twitter_trends_analytics_spark.sources.loaders import load_table


def _quantized(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select("vec_id", F.expr(_quant_sql(dl.SPARK, "embedding")).alias("qe"))


def _assign_rows(q, rows):
    """Assignment against literal centroid rows (the map-side production
    shape — see ml.centroid_argmin_sql)."""
    return q.select(
        "vec_id", "qe", F.expr(centroid_argmin_sql(rows)).alias("m")
    ).select(
        "vec_id", "qe", F.col("m.cl").alias("cluster"), F.col("m.d2").alias("d2")
    )


def _seed_rows(q):
    return [
        (int(r.vec_id), [int(v) for v in r.qe])
        for r in q.filter(F.col("vec_id") < K_CLUSTERS).collect()
    ]


def test_kmeans_partitions_all_vectors(spark, sf_dir):
    n_vecs = load_table(spark, sf_dir, "embeddings").count()
    rows = ml_kmeans_embeddings(spark, sf_dir).collect()
    assert 1 <= len(rows) <= K_CLUSTERS
    assert sum(r.n_vecs for r in rows) == n_vecs
    assert all(r.inertia >= 0 for r in rows)


def test_kmeans_update_does_not_increase_inertia(spark, sf_dir):
    """The Lloyd invariant: reassigning against the updated centroids can
    only lower (or keep) total inertia. Floor-quantizing the centroid shifts
    each coordinate by <1 fixed-point unit, so allow that slack: the shift
    inflates each squared distance by at most (2*|x-c|+1) per dim."""
    q = _quantized(spark, sf_dir)
    a1 = _assign_rows(q, _seed_rows(q))
    inertia1 = a1.agg(F.sum("d2")).collect()[0][0]
    updated = [
        (int(r.cluster), [int(v) for v in r.c]) for r in _update(a1).collect()
    ]
    a2 = _assign_rows(q, updated)
    inertia2 = a2.agg(F.sum("d2")).collect()[0][0]
    n, d = q.count(), 64
    # exact-mean update strictly minimizes; floor() can add < (2*sqrt(d2)+1)
    # per dim, bounded loosely by 3 * n * d * KMEANS_SCALE
    assert inertia2 <= inertia1 + 3 * n * d * KMEANS_SCALE


def test_kmeans_assignment_is_nearest(spark, sf_dir):
    """Spot-check: every assigned distance is <= the distance to seed 0."""
    q = _quantized(spark, sf_dir)
    a1 = _assign_rows(q, _seed_rows(q))
    c0 = q.filter(F.col("vec_id") == 0).select(F.col("qe").alias("c0"))
    joined = a1.crossJoin(F.broadcast(c0)).select(
        "d2",
        F.expr(
            "aggregate(zip_with(qe, c0, (x, y) -> (x - y) * (x - y)), "
            "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
        ).alias("d2_seed0"),
    )
    bad = joined.filter(F.col("d2") > F.col("d2_seed0")).count()
    assert bad == 0


def test_pq_codebook_partitions_every_block(spark, sf_dir):
    """Every (vec, block) unit lands in exactly one codeword: per-block
    populations each sum to the vector count, inertia non-negative, and
    codes stay in [0, PQ_K)."""
    from realtime_twitter_trends_analytics_spark.operators.ml import (
        PQ_BLOCKS,
        PQ_K,
        ml_pq_codebook,
    )

    n_vecs = load_table(spark, sf_dir, "embeddings").count()
    rows = ml_pq_codebook(spark, sf_dir).collect()
    assert {r.block for r in rows} == set(range(PQ_BLOCKS))
    for b in range(PQ_BLOCKS):
        block_rows = [r for r in rows if r.block == b]
        assert sum(r.n_vecs for r in block_rows) == n_vecs
        assert all(0 <= r.code < PQ_K for r in block_rows)
        assert all(r.inertia >= 0 for r in block_rows)


def test_dim_variance_shape_and_bounds(spark, sf_dir):
    rows = ml_embedding_dim_variance(spark, sf_dir).collect()
    n_vecs = load_table(spark, sf_dir, "embeddings").count()
    assert len(rows) == 64
    assert {r.dim for r in rows} == set(range(1, 65))
    for r in rows:
        assert r.n == n_vecs
        assert r.var_fp >= 0.0
        # quantized dims live in a few units of the scale
        assert abs(r.mean_fp) <= 8 * KMEANS_SCALE


def test_hll_rollup_accuracy(spark, sf_dir):
    """The merged-sketch estimate must track exact distinct users within
    HLL's error envelope (lgK=12 default: ~1.6% rel. std error; assert 5%),
    and the naive sum of daily estimates must be >= the merged estimate
    (double-counting repeat users is the error the union avoids)."""
    from pyspark.sql import functions as F

    from realtime_twitter_trends_analytics_spark.operators.relational_ext import (
        events_hll_rollup,
    )
    from realtime_twitter_trends_analytics_spark.sources.loaders import load_table

    rows = {r.event_type: r for r in events_hll_rollup(spark, sf_dir).collect()}
    exact = {
        r.event_type: r.exact
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("exact"))
        .collect()
    }
    assert set(rows) == set(exact)
    for et, r in rows.items():
        # tolerance + naive-vs-merged checks run in-plan now (round 6);
        # assert the booleans and that the exact column matches a fresh
        # exact aggregation
        assert r.exact_users == exact[et], et
        assert r.merged_within_5pct, et
        assert r.merged_le_naive, et
        assert r.naive_daily_sum >= r.exact_users, et


def test_normal_equations_solve_matches_numpy(spark, sf_dir):
    """Close the loop on the distributed Gram matrix: solving the
    accumulated X'X b = X'y on the driver must reproduce numpy's
    least-squares fit computed directly from the raw rows — i.e. the
    one-pass sufficient statistics lose nothing."""
    import numpy as np

    from realtime_twitter_trends_analytics_spark.operators.ml import (
        KMEANS_SCALE,
        NORMAL_EQ_DIMS,
        ml_normal_equations,
        quantized_vectors,
    )

    d1 = NORMAL_EQ_DIMS + 1
    rows = ml_normal_equations(spark, sf_dir).collect()
    xtx = np.zeros((d1, d1))
    xty = np.zeros(d1)
    for r in rows:
        xtx[r.i - 1, r.j - 1] = r.xtx
        xtx[r.j - 1, r.i - 1] = r.xtx
        if r.i == r.j:
            xty[r.i - 1] = r.xty_diag
    beta = np.linalg.solve(xtx, xty)

    q = quantized_vectors(spark, sf_dir).collect()
    emb = {r.vec_id: r.qe for r in q}
    labels = {
        r.vec_id: r.label
        for r in load_table(spark, sf_dir, "embeddings").select("vec_id", "label").collect()
    }
    X = np.array(
        [[KMEANS_SCALE] + list(emb[v][:NORMAL_EQ_DIMS]) for v in sorted(emb)], dtype=float
    )
    y = np.array([labels[v] for v in sorted(emb)], dtype=float)
    beta_np, *_ = np.linalg.lstsq(X, y, rcond=None)
    assert np.allclose(beta, beta_np, rtol=1e-6, atol=1e-9)


def test_pca_iterate_matches_independent_numpy_replica(spark, sf_dir):
    """ml_pca_power_iteration must equal an INDEPENDENT numpy replica of
    the algorithm: covariance from the raw quantized vectors via np.cov
    (not the operator's sufficient-statistic path), then the same 8
    normalize(C v) rounds. Also pins the Rayleigh-quotient bounds: the
    iterate's explained-variance ratio lies in (mean-eigenvalue/trace,
    lambda_max/trace] — on this near-isotropic synthetic corpus the
    spectrum is flat, so the iterate is NOT the converged eigenvector
    (documented in the operator docstring); equality with the replica is
    the correctness claim, eigh only bounds it."""
    import numpy as np

    from realtime_twitter_trends_analytics_spark.operators.ml import (
        PCA_ITERS,
        ml_pca_power_iteration,
        quantized_vectors,
    )

    rows = ml_pca_power_iteration(spark, sf_dir).collect()
    v = np.array([r.loading for r in sorted(rows, key=lambda r: r.dim)])

    q = quantized_vectors(spark, sf_dir).collect()
    X = np.array([r.qe for r in q], dtype=float)
    C = np.cov(X, rowvar=False, bias=True)
    u = np.full(C.shape[0], 0.125)
    for _ in range(PCA_ITERS):
        w = C @ u
        u = w / np.sqrt(w @ w)
    assert np.allclose(v, u, atol=2e-4)
    assert np.linalg.norm(v) == pytest.approx(1.0, abs=1e-2)

    evals = np.linalg.eigvalsh(C)
    trace = float(np.trace(C))
    rayleigh = float(u @ (C @ u))
    evr = rows[0].explained_var_ratio
    assert evr == pytest.approx(rayleigh / trace, abs=5e-4)
    assert evals.mean() / trace < evr <= evals[-1] / trace + 1e-9


def test_zipf_fit_matches_numpy_polyfit(spark, sf_dir):
    """textstats_zipf_fit's per-lang OLS must agree with numpy polyfit on
    an independently recomputed rank/frequency table."""
    import numpy as np

    from collections import Counter

    from realtime_twitter_trends_analytics_spark.operators.textstats import (
        ZIPF_TOP,
        textstats_zipf_fit,
    )

    got = {r.lang: r for r in textstats_zipf_fit(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").select("lang", "text").collect()
    by_lang: dict[str, Counter] = {}
    for r in docs:
        by_lang.setdefault(r.lang, Counter()).update(r.text.split(" "))
    for lang, cnt in by_lang.items():
        ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:ZIPF_TOP]
        x = np.log(np.arange(1, len(ranked) + 1, dtype=float))
        y = np.log(np.array([f for _, f in ranked], dtype=float))
        slope, intercept = np.polyfit(x, y, 1)
        r = np.corrcoef(x, y)[0, 1]
        assert got[lang].n_types == len(cnt)
        assert got[lang].zipf_slope == pytest.approx(slope, abs=2e-4)
        assert got[lang].intercept == pytest.approx(intercept, abs=2e-4)
        assert got[lang].r2 == pytest.approx(r * r, abs=2e-4)
        assert got[lang].zipf_slope < 0  # frequency decreases with rank
