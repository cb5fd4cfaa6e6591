"""Central registry: every implemented query + its DuckDB oracle SQL.

The driver contract (__spark_entry__.py) re-exports these. Modules register
{name -> fn(spark, sf_dir) -> DataFrame} and {name -> oracle SQL}; a query
without an oracle gets the driver's weaker rows-only check (reserved for
genuinely non-SQL-expressible ops, e.g. binary-payload transport).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .operators import (
    analytics_ext,
    analytics_ext2,
    cleaning,
    dedup,
    graph,
    layout,
    grouped_pandas,
    ml,
    multimodal,
    quality,
    relational,
    relational_ext,
    sampling,
    similarity,
    skew,
    sql_battery,
    textstats,
    trends,
)

_MODULES = [
    relational,
    relational_ext,
    analytics_ext,
    analytics_ext2,
    trends,
    dedup,
    similarity,
    skew,
    sql_battery,
    textstats,
    multimodal,
    quality,
    grouped_pandas,
    sampling,
    cleaning,
    layout,
    graph,
    ml,
]

QueryFn = Callable[[SparkSession, str], DataFrame]


def all_queries() -> dict[str, QueryFn]:
    out: dict[str, QueryFn] = {}
    for m in _MODULES:
        overlap = set(out) & set(m.QUERIES)
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(m.QUERIES)
    return out


def all_staging() -> dict[str, QueryFn]:
    """Named staging-relation builders (memoized per application/sf_dir —
    the in-process analogue of a pipeline's parquet staging writes).

    bench.py builds these FIRST and records each build as its own
    ``staging:<name>`` line (VERDICT r5 item 3): consumers of a memoized
    relation otherwise report near-zero times (dedup_minhash_pairs read
    0.02 s in r5 because dedup_clusters had already built the pair
    relation), which let a consumer's own regression hide behind its
    newly-joined staging tier. With the build cost as a named line, both
    the build and every consumer are comparable across rounds."""
    return {
        # tokenize-once FIRST (r8): the shingle builds, bigram_instances,
        # and dsir_instances all read it — before r8 each re-tokenized
        # documents from raw text
        "tokenized_docs": dedup.tokenized_docs_staging,
        # r15 (VERDICT r14 item 2): the |V| scalar's distinct-token agg is
        # a timed line — without it the memoized build landed in the
        # untimed warm-up and its two consumers' bench lines stopped being
        # comparable round-over-round. Right after tokenized_docs (its
        # input) so the line prices ONLY the distinct-count aggregation.
        "corpus_vocab": textstats.corpus_vocab_staging,
        # the uncapped distinct-shingle relation, read by BOTH the hot-list
        # cap build and the minhash signature agg
        "doc_shingles": dedup.shingle_rel_staging,
        "capped_shingles": dedup.capped_shingle_staging,
        # signatures BEFORE the pair build that consumes them (round 7:
        # shared by the banded self-join and the incremental probe)
        "minhash_signatures": dedup.minhash_signatures_staging,
        "minhash_pairs": dedup.dedup_minhash_pairs,
        "cooc_edges": graph._cooc_edges,
        # r8: the kcore bipartite edge build was ~85% of the kcore query's
        # bench line — now a named staging line like cooc_edges
        "kcore_edges": graph.kcore_edges_staging,
        # quantized_vectors FIRST among the vector builds: it is their
        # shared scan (round-7 memoization — VERDICT r6 item 7), so its
        # one-time materialization cost gets its own line instead of
        # riding whichever consumer builds first.
        "quantized_vectors": ml.quantized_vectors,
        # trainer BEFORE its consumer (r8): kmeans_cells used to absorb
        # the Lloyd-round training cost because it built the codebook
        # memo first — same accounting fix as kcore_edges
        "kmeans_codebook": ml.kmeans_centroids,
        "kmeans_cells": similarity.kmeans_cell_assignment,
        "bigram_instances": textstats.bigram_instance_staging,
        "dsir_instances": cleaning.dsir_instance_staging,
        # r11: the per-doc log-weight relation — the bucket-split top-K
        # reads it twice per job and corpus_pipeline_v3 reads it again
        "dsir_perdoc": cleaning.dsir_perdoc_staging,
        "pq_codebook": lambda s, d: ml.pq_trained(s, d)[1],
    }


def all_bench_only() -> dict[str, QueryFn]:
    """Production-plan variants benched but NOT in the driver correctness
    gate: each is the sketch-only / verification-free form of an
    oracle-gated eval query (the eval twin carries the in-plan bound
    checks that make the sketch path oracle-checkable; these price the
    plan a deployment actually runs). Kept out of all_queries() so the
    gate stays 100% value-oracled — a rows-only registry entry would be
    a weaker check pretending to be coverage."""
    return {
        "percentiles_approx_prod": relational_ext.percentiles_approx_prod,
        "events_hll_rollup_prod": relational_ext.events_hll_rollup_prod,
        "events_hll_sliding_dau_prod": relational_ext.events_hll_sliding_dau_prod,
        # r8: sketch/bucket twins of the exact global-sort segmentation
        # readouts (accuracy pinned vs the exact twins in
        # tests/test_prod_twins.py)
        "part_abc_classification_prod": analytics_ext.part_abc_classification_prod,
        "events_power_users_gini_prod": analytics_ext.events_power_users_gini_prod,
        "customers_rfm_segments_prod": quality.customers_rfm_segments_prod,
        "layout_range_splits_prod": layout.layout_range_splits_prod,
        # r8: RRF fusion with the LSH-ANN dense side (composition proven in
        # tests/test_rrf_composition.py; the oracle-gated fusion keeps the
        # brute-force dense baseline)
        "retrieval_rrf_fusion_ann": similarity.retrieval_rrf_fusion_ann,
        # r10: the JVM window form of the applyInPandas grouped-map surface
        # demo (equality pinned in tests/test_prod_twins.py) — prices the
        # Arrow boundary + per-group pandas overhead explicitly
        "grouped_zscore_prod": grouped_pandas.grouped_zscore_prod,
        # r11: the density-rule face of the SemDeDup report — K derived
        # from corpus size (ml.k_for_corpus) instead of the oracle-pinned
        # constant; row-identical to the gate query at bench SF (pinned in
        # tests/test_density_rule.py), ~linear at 10x density
        # (SCALE_SMOKE.md density section)
        "dedup_semantic_cells_prod": similarity.dedup_semantic_cells_prod,
        "sim_ivfpq_ann_prod": similarity.sim_ivfpq_ann_prod,
        # r12: the BPE trainer's production faces (VERDICT r11 item 4 —
        # the 3-round heaviest-line weak item). _prod = distributed type
        # reduction + capped driver trainer (the SentencePiece/HF shape,
        # ~0.9 s vs the 6.2 s sequential wall); _batched = the
        # distributed trainer with provably-sequential top-m batching for
        # the no-collect regime. Both learned merge lists pinned
        # IDENTICAL to the oracle-gated face at every test SF
        # (tests/test_bpe_prod.py).
        "textstats_bpe_induction_prod": textstats.textstats_bpe_induction_prod,
        "textstats_bpe_induction_batched": textstats.textstats_bpe_induction_batched,
    }


def clear_staging_memos() -> None:
    """Drop every staging-relation memo (and the driver-state model memos
    they feed) so bench.py can rebuild the staging tier and record
    MIN-of-N build times. Same-tree staging drift was the largest
    un-damped noise channel in round-over-round diffs (r7->r8 probe:
    unchanged cooc_edges/pq_codebook lines re-measured 1.23x/1.37x on the
    same box) — query lines already damp with min-of-2 timed runs, but a
    memoized build only ever ran once per process. Safe to call between
    builds: every builder is deterministic and idempotent, and consumers
    only hold references through the memo."""
    from .operators import cleaning, dedup, graph, ml, similarity, textstats

    for memo in (
        dedup._TOKD_MEMO,
        dedup._SH_ALL_MEMO,
        dedup._CAPPED_SH_MEMO,
        dedup._SIG_MEMO,
        dedup._PAIRS_MEMO,
        graph._COOC_MEMO,
        graph._KCORE_EDGES_MEMO,
        ml._QVEC_MEMO,
        ml._KMEANS_CENT_MEMO,
        ml._PQ_CENT_MEMO,
        ml._TWO_LEVEL_MEMO,
        similarity._CELL_ASSIGN_MEMO,
        textstats._BIGRAM_MEMO,
        textstats._BPE_MERGES_MEMO,
        textstats._VOCAB_MEMO,
        cleaning._DSIR_INST_MEMO,
        cleaning._DSIR_PERDOC_MEMO,
    ):
        memo.clear()


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    unknown = set(out) - set(all_queries())
    if unknown:
        raise ValueError(f"oracles without queries: {unknown}")
    return out
