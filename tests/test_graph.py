"""Invariant tests for the graph-analytics operators (engine-parity is
covered by the oracle gate; these check the math means what it claims)."""

from __future__ import annotations

from realtime_twitter_trends_analytics_spark.operators.graph import (
    PAGERANK_TOP,
    PR_SCALE,
    graph_degree_stats,
    graph_pagerank_topk,
    graph_triangle_stats,
)


def test_triangle_stats_invariants(spark, sf_dir):
    row = graph_triangle_stats(spark, sf_dir).collect()[0]
    assert row.n_nodes > 0 and row.n_edges > 0
    # an undirected simple graph has at most C(n,2) edges
    assert row.n_edges <= row.n_nodes * (row.n_nodes - 1) // 2
    # every triangle closes exactly one oriented wedge
    assert 0 <= row.n_triangles <= row.n_wedges
    assert 0.0 <= row.clustering_coeff <= 1.0


def test_degree_bounded_by_node_count(spark, sf_dir):
    stats = graph_triangle_stats(spark, sf_dir).collect()[0]
    degs = graph_degree_stats(spark, sf_dir).collect()
    assert len(degs) > 0
    for r in degs:
        assert 1 <= r.degree <= stats.n_nodes - 1
        # each incident edge contributes >= MIN support co-doc count
        assert r.weighted_degree >= r.degree


def test_pagerank_conserves_fixed_point_mass(spark, sf_dir):
    """With no dangling nodes in the bigram graph, total rank mass stays at
    SCALE minus only floor-division losses (bounded by a few units per node
    per iteration) — the conservation law that catches a wrong damping or a
    dropped-contribution bug. Also: ranks positive, ordering consistent."""
    rows = graph_pagerank_topk(spark, sf_dir).collect()
    assert 0 < len(rows) <= PAGERANK_TOP
    ranks = [r.rank_fp for r in rows]
    assert ranks == sorted(ranks, reverse=True)
    assert all(r > 0 for r in ranks)
    # the top-k alone can't exceed the total mass
    assert sum(ranks) <= PR_SCALE
    # every node's rank is at least the undamped base share
    n_ub = 64  # vocabulary upper bound for the driver corpus
    assert all(r.rank_fp >= (15 * (PR_SCALE // n_ub)) // 100 for r in rows)


def test_lpa_recovers_planted_communities(spark, tmp_path_factory):
    """LPA must separate two planted 4-token cliques whose cross pairs
    fall below the 60% co-occurrence support (the corpus-level query
    collapses to one community because the real graph is small and dense
    — this pins that the ALGORITHM separates what the support rule keeps
    apart). 20 docs: 7 pure-A, 7 pure-B, 6 mixed — intra-clique pairs
    co-occur in 13 docs (>= 12 = 60%), cross pairs in only 6 (dropped)."""
    from realtime_twitter_trends_analytics_spark.operators.graph import (
        graph_lpa_communities,
    )

    out = tmp_path_factory.mktemp("lpa_sf")
    rows = []
    for i in range(7):
        rows.append((i, "aaa aab aac aad", "en", "s0", 15))
    for i in range(7, 14):
        rows.append((i, "bba bbb bbc bbd", "en", "s0", 15))
    for i in range(14, 20):
        rows.append((i, "aaa aab aac aad bba bbb bbc bbd", "en", "s0", 31))
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).coalesce(1).write.mode("overwrite").parquet(str(out / "documents.parquet"))

    got = {
        r["community"]: (r["n_tokens"], r["sample_members"])
        for r in graph_lpa_communities(spark, str(out)).collect()
    }
    assert got == {
        "aaa": (4, "aaa,aab,aac,aad"),
        "bba": (4, "bba,bbb,bbc,bbd"),
    }
