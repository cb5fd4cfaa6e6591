"""ANN recall measurement + candidate-bound properties (VERDICT r1 item 8).

Both ANN paths (sign-LSH, IVF) are oracle-verified for exactness *given
their candidate sets*; what the oracle gate cannot see is a silent
candidate-generation regression (e.g. a bucket-hash change that makes every
bucket a singleton would still hash-match its own oracle). These tests pin
recall@10 against brute force exactly — everything is deterministic, so the
snapshot is stable — and assert the structural bounds of each method.

Round-4 recall floors (VERDICT r3 item 3): every path must clear 0.5 —
multi-probe IVF over the learned codebook, Hamming-1 multiprobe LSH, and
PQ exact rerank raised lsh/ivf/pq_adc from 0.12/0.12/0.29 to ~0.7/0.9/0.8.
The exact snapshot is also pinned (deterministic hashing + fixtures), so
any candidate-generation change shows up as a number shift. bench.py
reports the same numbers per round under "ann_recall_at_10".
"""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_twitter_trends_analytics_spark.operators.similarity import (
    ANN_LSH_TABLES,
    LSH_PROBE_MASKS,
    N_QUERY_VECS,
    TOP_K,
    ann_recall,
    sim_ivf_ann,
    sim_lsh_ann,
    sim_topk_bruteforce,
)
from realtime_twitter_trends_analytics_spark.sources.loaders import load_table

RECALL_FLOOR = 0.5


def test_recall_snapshot_vs_bruteforce(spark, sf_dir):
    got = ann_recall(spark, sf_dir)
    # the hard gate: no ANN path may regress below the round-4 floor
    assert all(v >= RECALL_FLOOR for v in got.values()), got
    # the exact snapshot (sf0.001): a shift here = candidate generation
    # changed — re-measure and re-pin deliberately, never silently
    # r5: pq_adc 0.81 -> 0.98 (PQ_RERANK 100->200, PQ_K 8->16; sf0.1 grid
    # in similarity.PQ_RERANK's comment — 0.61 -> 0.85 at bench SF);
    # lsh 0.67 -> 0.98 (Hamming<=2 multiprobe, 0.74 -> 0.96 at sf0.1)
    # r6: ivf_kmeans 0.72 -> 0.88 (IVFK_NPROBE 1 -> 3 over the staged
    # inverted lists; 0.79 -> 0.87 at sf0.1 — the r5 >=0.85 ask)
    # r11: + ivfpq (IVF-blocked ADC + exact rerank) at 0.88 (0.80 at
    # sf0.1) — the same candidate bound as ivf_kmeans (nprobe cells),
    # ADC ordering inside it costs a little recall vs full-precision
    # cosine, the PQ_RERANK refine recovers most
    assert got == {
        "lsh": 0.98,
        "ivf": 0.88,
        "ivf_kmeans": 0.88,
        "pq_adc": 0.98,
        "ivfpq": 0.88,
    }


def test_ann_results_are_structurally_sound(spark, sf_dir):
    for fn in (sim_lsh_ann, sim_ivf_ann):
        rows = fn(spark, sf_dir).collect()
        by_query = {}
        for r in rows:
            assert r["query_id"] != r["cand_id"]  # no self-pairs
            assert 1 <= r["rnk"] <= TOP_K
            by_query.setdefault(r["query_id"], []).append(r)
        assert set(by_query) <= set(range(N_QUERY_VECS))
        for q, rs in by_query.items():
            # ranks are dense from 1 and cosines non-increasing along them
            rs.sort(key=lambda r: r["rnk"])
            assert [r["rnk"] for r in rs] == list(range(1, len(rs) + 1))
            cosines = [r["cosine"] for r in rs]
            assert cosines == sorted(cosines, reverse=True)
            # candidates are distinct
            assert len({r["cand_id"] for r in rs}) == len(rs)


def test_lsh_candidates_bounded_by_bucket_sizes(spark, sf_dir):
    """The LSH candidate set per query is exactly the union of its probed
    buckets' occupancies (Hamming<=2 multiprobe since round 5) — the bounded-candidates
    property that makes the method scale. Verified by recomputing bucket
    membership: every returned pair must differ by at most one bucket bit
    in at least one table (mask-set membership, so the assert tracks
    LSH_PROBE_MASKS whatever the probe radius)."""
    from realtime_twitter_trends_analytics_spark.functions import dialect as dl
    from realtime_twitter_trends_analytics_spark.operators.similarity import (
        lsh_bucket_sql,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    bucketed = emb.select(
        "vec_id",
        *[
            F.expr(lsh_bucket_sql(dl.SPARK, "embedding", t)).alias(f"b{t}")
            for t in range(ANN_LSH_TABLES)
        ],
    ).collect()
    by_id = {r["vec_id"]: [r[f"b{t}"] for t in range(ANN_LSH_TABLES)] for r in bucketed}
    ann = sim_lsh_ann(spark, sf_dir).collect()
    probe_set = set(LSH_PROBE_MASKS)
    for r in ann:
        qb, cb = by_id[r["query_id"]], by_id[r["cand_id"]]
        # every returned pair lands in a probed bucket of some table
        assert any((qb[t] ^ cb[t]) in probe_set for t in range(ANN_LSH_TABLES)), r


def test_embedding_cosine_dedup_finds_planted(spark):
    """Planted near-identical vectors must surface as cosine-dup pairs;
    orthogonal vectors must not."""
    import math

    from realtime_twitter_trends_analytics_spark.operators.similarity import (
        EMB_DIM,
        embedding_cosine_pairs,
    )

    def unit(seed):
        # deterministic pseudo-vector from a seed, normalized
        vals = [math.sin(seed * 31 + j) for j in range(EMB_DIM)]
        n = math.sqrt(sum(v * v for v in vals))
        return [v / n for v in vals]

    base = unit(1)
    near = [v * 0.999 + 0.001 * w for v, w in zip(base, unit(2))]  # ~cos 1.0
    rows = [
        (0, base),
        (1, near),          # planted dup of 0
        (2, unit(7)),       # unrelated
        (3, unit(13)),      # unrelated
    ]
    emb = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    got = {(r["a"], r["b"]): r["cosine"] for r in embedding_cosine_pairs(emb, 0.95).collect()}
    assert (0, 1) in got and got[(0, 1)] > 0.99
    assert all(p == (0, 1) for p in got), got


def test_mmr_diversifies_relative_to_plain_topk(spark, sf_dir):
    """MMR's picks must (a) start from the most-relevant candidate, (b)
    never repeat a candidate, and (c) have a LOWER mean pairwise cosine
    among the selected set than plain top-MMR_K relevance ranking for at
    least one query — the diversification MMR exists to buy."""
    import itertools

    import numpy as np

    from realtime_twitter_trends_analytics_spark.operators.similarity import (
        MMR_K,
        sim_mmr_topk,
        sim_topk_bruteforce,
    )
    from realtime_twitter_trends_analytics_spark.sources.loaders import load_table

    rows = sim_mmr_topk(spark, sf_dir).collect()
    emb = {
        r["vec_id"]: np.array(r["embedding"])
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }

    def mean_pairwise(ids):
        sims = [
            float(emb[a] @ emb[b] / (np.linalg.norm(emb[a]) * np.linalg.norm(emb[b])))
            for a, b in itertools.combinations(ids, 2)
        ]
        return sum(sims) / len(sims)

    plain = {}
    for r in sim_topk_bruteforce(spark, sf_dir).collect():
        if r["rnk"] <= MMR_K:
            plain.setdefault(r["query_id"], []).append((r["rnk"], r["cand_id"]))

    diversified = 0
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rs in by_q.items():
        ids = [r["cand_id"] for r in sorted(rs, key=lambda r: r["step"])]
        assert len(set(ids)) == MMR_K
        # step 1 = the plain top-1 (pure relevance)
        top1 = min(plain[qid])[1]
        assert ids[0] == top1
        if mean_pairwise(ids) < mean_pairwise([c for _, c in sorted(plain[qid])]) - 1e-9:
            diversified += 1
    assert diversified >= 1
