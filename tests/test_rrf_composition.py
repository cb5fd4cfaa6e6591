"""RRF (id, rank) composition contract (VERDICT r7 item 6).

retrieval_rrf_fusion's docstring claims any ANN variant composes into the
fusion unchanged via the (doc_id, rank) contract. This proves it:
retrieval_rrf_fusion_ann swaps the brute-force dense ranking for the
multi-probe LSH-ANN candidate generator (the same machinery as
sim_lsh_ann, cut at RRF_POOL instead of TOP_K) and the fused result is
pinned against the brute-force fusion.

Measured at pin time (2026-08): top-20 overlap 1.00 at sf0.1 (the bench
SF — LSH multiprobe surfaces every pool candidate that matters) and 0.85
at sf0.001 (the tiny corpus has sparse buckets, so the mid-pool tail
frays — the standard LSH recall trade, same reason the ANN recall floor
is a floor, not equality).
"""

from __future__ import annotations

from realtime_twitter_trends_analytics_spark.operators.similarity import (
    RRF_POOL,
    RRF_TOP,
    retrieval_rrf_fusion,
    retrieval_rrf_fusion_ann,
)

SF_BENCH = "/root/testdata/sf0.1"
OVERLAP_FLOOR = {"/root/testdata/sf0.001": 0.7, SF_BENCH: 0.9}


def _top_ids(rows):
    return [r["doc_id"] for r in sorted(rows, key=lambda r: r["rnk"])]


def test_ann_fusion_contract_and_overlap(spark, sf_dir):
    for sf in (sf_dir, SF_BENCH):
        bf = retrieval_rrf_fusion(spark, sf).collect()
        an = retrieval_rrf_fusion_ann(spark, sf).collect()
        spark.catalog.clearCache()
        # contract: same shape, dense ranks bounded by the pool, fused
        # ranks dense from 1
        for rows in (bf, an):
            ranks = sorted(r["rnk"] for r in rows)
            assert ranks == list(range(1, len(rows) + 1))
            assert len(rows) == RRF_TOP
            for r in rows:
                assert r["rank_dense"] is None or 1 <= r["rank_dense"] <= RRF_POOL
        # the composition claim: swapping the dense ranker changes the
        # fused list by no more than the ANN candidate-recall trade
        overlap = len(set(_top_ids(bf)) & set(_top_ids(an))) / RRF_TOP
        assert overlap >= OVERLAP_FLOOR[sf], (sf, overlap)
