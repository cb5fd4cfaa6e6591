"""Cross-engine property test for the dual-dialect layer: on RANDOM token
texts, the Spark and DuckDB renderings of the shared templates (sentiment
score, shingles, quality features, split-bucket) must agree exactly. This is
the foundation every hash-defined operator (MinHash, SimHash, LSH) rests on."""

from __future__ import annotations

import random

import pandas as pd

from pyspark.sql import Row, functions as F

from realtime_twitter_trends_analytics_spark.functions import dialect as dl
from realtime_twitter_trends_analytics_spark.functions.sentiment import (
    score_sql,
    score_texts_pandas,
)
from realtime_twitter_trends_analytics_spark.operators.dedup import shingles_sql
from realtime_twitter_trends_analytics_spark.operators.textstats import quality_sql

WORDS = [
    "fast", "slow", "dup", "the", "a", "spark", "merge", "small", "big",
    "zzz", "Q", "x1", "hashJoin", "UPPER", "mixedCase", "1234",
]


def _random_texts(n: int = 40, seed: int = 7) -> list[str]:
    rng = random.Random(seed)
    texts = ["", "fast", "a b"]
    for _ in range(n):
        k = rng.randint(1, 30)
        texts.append(" ".join(rng.choice(WORDS) for _ in range(k)))
    return texts


def test_sentiment_template_agrees_across_engines(spark, duck):
    texts = _random_texts()
    sdf = spark.createDataFrame([Row(text=t) for t in texts])
    got_spark = [
        r["s"] for r in sdf.select(F.expr(score_sql(dl.SPARK, "text")).alias("s")).collect()
    ]
    duck.register("t_dlg", pd.DataFrame({"text": texts}))
    got_duck = [r[0] for r in duck.execute(
        f"SELECT {score_sql(dl.DUCK, 'text')} FROM t_dlg"
    ).fetchall()]
    ref = score_texts_pandas(texts)
    assert got_spark == got_duck == ref
    duck.unregister("t_dlg")


def test_shingles_template_agrees_across_engines(spark, duck):
    # the template takes a pre-split token-array column (tokenize-once)
    texts = [t for t in _random_texts(seed=11)]
    sdf = spark.createDataFrame([Row(text=t) for t in texts]).select(
        F.expr(dl.split_ws(dl.SPARK, "text")).alias("toks")
    )
    got_spark = [
        r["s"] for r in sdf.select(F.expr(shingles_sql(dl.SPARK, "toks")).alias("s")).collect()
    ]
    duck.register("t_dlg2", pd.DataFrame({"text": texts}))
    got_duck = [r[0] for r in duck.execute(
        f"SELECT {shingles_sql(dl.DUCK, dl.split_ws(dl.DUCK, 'text'))} FROM t_dlg2"
    ).fetchall()]
    assert got_spark == got_duck
    # python reference: consecutive 3-token windows
    for t, sh in zip(texts, got_spark):
        toks = t.split(" ")
        want = [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)] if len(toks) >= 3 else []
        assert sh == want, t
    duck.unregister("t_dlg2")


def test_quality_template_agrees_across_engines(spark, duck):
    texts = [t for t in _random_texts(seed=13) if t]  # ratios undefined on ""
    feats_s, score_s = quality_sql(dl.SPARK)
    feats_d, score_d = quality_sql(dl.DUCK)
    sdf = spark.createDataFrame([Row(text=t) for t in texts])
    cols = [F.expr(sql).alias(k) for k, sql in feats_s.items()] + [
        F.expr(score_s).alias("q")
    ]
    got_spark = [tuple(r) for r in sdf.select(*cols).collect()]
    duck.register("t_dlg3", pd.DataFrame({"text": texts}))
    sel = ", ".join(f"{sql} AS {k}" for k, sql in feats_d.items())
    got_duck = [
        tuple(r) for r in duck.execute(f"SELECT {sel}, {score_d} AS q FROM t_dlg3").fetchall()
    ]
    assert got_spark == got_duck
    duck.unregister("t_dlg3")


def test_round_ratio_matches_exact_fraction_rounding(spark, duck):
    """Property: round_ratio(num, den, 4) equals decimal.Decimal
    ROUND_HALF_UP of the exact fraction, in BOTH engines, including
    .xxxx5 ties that double-rounding gets wrong."""
    from decimal import Decimal, ROUND_HALF_UP
    from fractions import Fraction

    rng = random.Random(7)
    cases = [(6587 * 100 + 50, 1_000_000), (1, 3), (1, 160), (3, 160), (0, 5)]
    cases += [(rng.randrange(0, 10**9), rng.randrange(1, 10**6)) for _ in range(60)]
    rows = [Row(i=i, num=n, den=d) for i, (n, d) in enumerate(cases)]
    sdf = spark.createDataFrame(rows)
    sdf.createOrReplaceTempView("rr_cases")
    got_spark = {
        r["i"]: r["v"]
        for r in spark.sql(
            f"SELECT i, {dl.round_ratio(dl.SPARK, 'num', 'den')} AS v FROM rr_cases"
        ).collect()
    }
    duck.execute("CREATE OR REPLACE TABLE rr_cases AS SELECT * FROM (VALUES "
                 + ", ".join(f"({i}, {n}, {d})" for i, (n, d) in enumerate(cases))
                 + ") t(i, num, den)")
    got_duck = {
        i: v
        for i, v in duck.execute(
            f"SELECT i, {dl.round_ratio(dl.DUCK, 'num', 'den')} FROM rr_cases"
        ).fetchall()
    }
    for i, (n, d) in enumerate(cases):
        frac = Fraction(n, d)
        want = float(
            Decimal(frac.numerator)
            .scaleb(4)  # num * 10^4
            .__truediv__(Decimal(frac.denominator))
            .quantize(Decimal(1), rounding=ROUND_HALF_UP)
        ) / 10**4
        assert got_spark[i] == want, (i, n, d, got_spark[i], want)
        assert got_duck[i] == want, (i, n, d, got_duck[i], want)


def test_hex_prefix_u60_matches_python_int(spark, duck):
    """The 60-bit hash fold must equal int(md5_hex[:15], 16) in BOTH
    engines — the property every priority-sampling / winnowing rank rests
    on. Random plaintexts, plus the all-'f' worst case for carry bugs."""
    import hashlib

    texts = _random_texts(25, seed=13) + ["x"]
    hexes = [hashlib.md5(t.encode()).hexdigest() for t in texts] + ["f" * 32, "0" * 32]
    expected = [int(h[:15], 16) for h in hexes]

    sdf = spark.createDataFrame([Row(h=h) for h in hexes])
    got_spark = [
        r["u"]
        for r in sdf.select(
            F.expr(dl.hex_prefix_u60(dl.SPARK, "h")).alias("u")
        ).collect()
    ]
    duck.register("t_u60", pd.DataFrame({"h": hexes}))
    got_duck = [
        r[0]
        for r in duck.execute(
            f"SELECT {dl.hex_prefix_u60(dl.DUCK, 'h')} FROM t_u60"
        ).fetchall()
    ]
    duck.unregister("t_u60")
    assert got_spark == got_duck == expected
