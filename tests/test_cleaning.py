"""Semantics tests for the corpus-cleaning operators (PII redaction,
quality gate, mixture weights, dedup survivor selection)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from realtime_twitter_trends_analytics_spark.operators.cleaning import (
    EMAIL_PATTERN,
    PHONE_PATTERN,
    docs_mixture_weights,
    docs_pii_redact,
    docs_quality_filter,
)
from realtime_twitter_trends_analytics_spark.operators.dedup import (
    dedup_minhash_pairs,
    dedup_survivors,
)
from realtime_twitter_trends_analytics_spark.sources.loaders import load_table


def test_pii_redact_scrubs_everything(spark, sf_dir):
    rows = docs_pii_redact(spark, sf_dir).collect()
    assert len(rows) > 0
    phone_re, email_re = re.compile(PHONE_PATTERN), re.compile(EMAIL_PATTERN)
    for r in rows:
        # the synthesized contact line plants exactly one of each
        assert r["n_phone_hits"] == 1
        assert r["n_email_hits"] == 1
        assert phone_re.search(r["clean_text"]) is None
        assert email_re.search(r["clean_text"]) is None
        assert "[PHONE]" in r["clean_text"] and "[EMAIL]" in r["clean_text"]


def test_quality_filter_partitions_the_corpus(spark, sf_dir):
    agg = docs_quality_filter(spark, sf_dir).collect()
    verdicts = {r["verdict"] for r in agg}
    allowed = {
        "kept",
        "too_short",
        "too_long",
        "too_repetitive",
        "too_stopwordy",
        "tokens_too_short",
        "tokens_too_long",
    }
    assert verdicts <= allowed
    assert "kept" in verdicts  # the gate must not drop everything
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in agg) == n_docs  # verdicts partition docs


def test_mixture_weights_sum_to_one_and_boost_rare(spark, sf_dir):
    rows = docs_mixture_weights(spark, sf_dir).collect()
    assert abs(sum(r["token_share"] for r in rows) - 1.0) < 1e-2
    assert abs(sum(r["temp_share"] for r in rows) - 1.0) < 1e-2
    # sqrt temperature flattens the mixture: the largest domain loses
    # share, the smallest gains
    biggest = max(rows, key=lambda r: r["n_tokens"])
    smallest = min(rows, key=lambda r: r["n_tokens"])
    assert biggest["boost"] <= 1.0 + 1e-9
    assert smallest["boost"] >= 1.0 - 1e-9


def test_survivors_match_greedy_pair_rule(spark, sf_dir):
    surv = dedup_survivors(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    assert sum(r["n_docs"] for r in surv) == n_docs
    for r in surv:
        assert r["n_kept"] + r["n_dropped"] == r["n_docs"]
    n_dropped = sum(r["n_dropped"] for r in surv)
    expected = (
        dedup_minhash_pairs(spark, sf_dir).select("b").distinct().count()
    )
    assert n_dropped == expected
