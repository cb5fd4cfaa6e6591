"""Property-based tests (hypothesis) for the round-7 fixed-point and
sketch math — the algebra the operators encode, checked over random
inputs rather than one fixture:

- dialect.round_ratio == true half-up rational rounding (both dialects:
  the Spark form via one batched spark.sql job per example set, the
  DuckDB form via duckdb.sql) — this is the primitive nearly every
  ratio-emitting query leans on for cross-engine equality;
- the offline Misra-Gries reduction (docs_heavy_hitters) satisfies the
  MG bounds and is independent of sharding, for arbitrary multisets;
- the fixed-point EWMA fold (events_ewma_forecast) is bounded by the
  series range — the stability property that makes the forecast sane.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal
from fractions import Fraction

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from realtime_twitter_trends_analytics_spark.functions import dialect as dl


def _true_round_ratio(num: int, den: int, digits: int = 4) -> float:
    q = Decimal(num) / Decimal(den)
    return float(q.quantize(Decimal(1).scaleb(-digits), rounding=ROUND_HALF_UP))


pairs = st.lists(
    st.tuples(st.integers(min_value=0, max_value=10**9),
              st.integers(min_value=1, max_value=10**6)),
    min_size=1,
    max_size=50,
)


@settings(max_examples=20, deadline=None)
@given(pairs)
def test_round_ratio_duck_matches_half_up(ps):
    exprs = ", ".join(
        f"{dl.round_ratio(dl.DUCK, str(n), str(d))} AS r{i}"
        for i, (n, d) in enumerate(ps)
    )
    row = duckdb.sql(f"SELECT {exprs}").fetchone()
    for (n, d), got in zip(ps, row):
        assert got == _true_round_ratio(n, d), (n, d)


@pytest.mark.usefixtures("spark")
@settings(max_examples=5, deadline=None)
@given(pairs)
def test_round_ratio_spark_matches_half_up(ps):
    # hypothesis + pytest fixtures don't compose directly; grab the live
    # session from the SparkSession singleton the suite already opened
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession() or SparkSession.builder.getOrCreate()
    exprs = ", ".join(
        f"{dl.round_ratio(dl.SPARK, str(n), str(d))} AS r{i}"
        for i, (n, d) in enumerate(ps)
    )
    row = spark.sql(f"SELECT {exprs}").collect()[0]
    for (n, d), got in zip(ps, row):
        assert got == _true_round_ratio(n, d), (n, d)


# ------------------------------------------------------------------ MG math
def _offline_mg(shards: list[list[str]], cap: int):
    """The docs_heavy_hitters reduction in pure Python: per shard, exact
    counts minus the (cap+1)-th largest; merge by summation. Returns
    (est: dict, total_err)."""
    est: dict[str, int] = {}
    total_err = 0
    for shard in shards:
        counts: dict[str, int] = {}
        for t in shard:
            counts[t] = counts.get(t, 0) + 1
        ordered = sorted(counts.values(), reverse=True)
        d = ordered[cap] if len(ordered) > cap else 0
        total_err += d
        for t, c in counts.items():
            if c - d > 0:
                est[t] = est.get(t, 0) + (c - d)
    return est, total_err


tokens = st.lists(st.sampled_from([f"t{i}" for i in range(30)]), max_size=300)


@settings(max_examples=50, deadline=None)
@given(tokens, st.integers(min_value=1, max_value=8), st.integers(min_value=1, max_value=10))
def test_offline_mg_bounds_and_shard_invariance(stream, n_shards, cap):
    exact: dict[str, int] = {}
    for t in stream:
        exact[t] = exact.get(t, 0) + 1
    # deterministic sharding by hash — the operator's doc_id % SHARDS
    shards: list[list[str]] = [[] for _ in range(n_shards)]
    for i, t in enumerate(stream):
        shards[i % n_shards].append(t)
    est, err = _offline_mg(shards, cap)
    # per-shard error floor: d_p <= shard_tokens / (cap + 1)
    assert err <= sum(len(s) for s in shards) // (cap + 1)
    for t, x in exact.items():
        e = est.get(t, 0)
        assert e <= x                  # undercount only
        assert x - e <= err            # within the merged error budget
    # order independence WITHIN shards: shuffling each shard's contents
    # (reversal = a nontrivial reorder) must not change the reduction
    est2, err2 = _offline_mg([list(reversed(s)) for s in shards], cap)
    assert est2 == est and err2 == err


# ------------------------------------------------------------------ EWMA math
@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=60))
def test_fixed_point_ewma_bounded_by_series_range(cs):
    from realtime_twitter_trends_analytics_spark.operators.analytics_ext import (
        EWMA_DEN,
        EWMA_NUM,
        EWMA_SCALE,
    )

    lvl = cs[0] * EWMA_SCALE
    for x in cs[1:]:
        lvl = (EWMA_NUM * x * EWMA_SCALE + (EWMA_DEN - EWMA_NUM) * lvl) // EWMA_DEN
    # the level is a convex-ish combination with floor-div slack: it can
    # undershoot min(cs) by at most 1 scaled unit per step, never overshoot
    assert lvl <= max(cs) * EWMA_SCALE
    assert lvl >= min(cs) * EWMA_SCALE - len(cs)
