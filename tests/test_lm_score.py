"""Invariants for the bigram LM scorer (engine parity is oracle-gated)."""

from __future__ import annotations

import math

from realtime_twitter_trends_analytics_spark.operators.textstats import (
    textstats_lm_score,
)


def test_lm_score_invariants(spark, sf_dir, duck):
    rows = textstats_lm_score(spark, sf_dir).collect()
    assert len(rows) > 0
    # per-source bigram totals must reconcile with a direct corpus count
    n_expected = duck.execute(
        "SELECT count(*) FROM (SELECT unnest(string_split(text,' ')) FROM documents)"
        " UNION ALL SELECT count(*) FROM documents"
    ).fetchall()
    total_bigrams = n_expected[0][0] - n_expected[1][0]  # sum(len-1) per doc
    assert sum(r.n_bigrams for r in rows) == total_bigrams
    for r in rows:
        # add-one smoothing keeps every probability strictly inside (0, 1):
        # cross-entropy positive, perplexity consistent with its mean
        assert r.mean_nll > 0
        assert abs(r.ppl - math.exp(r.mean_nll)) < 0.01 * r.ppl + 1e-3
        assert r.n_docs > 0 and r.n_bigrams >= r.n_docs
