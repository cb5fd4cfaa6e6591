"""Fourth-session analytics operators (round 8 continuation):

- DAU/MAU stickiness with the per-user interval-merge rewrite (the
  28-day exact MAU that a naive day x user-day range join would pay a
  28x fan-out for),
- Kendall tau-b rank correlation over the bounded day grain,
- the hashing-trick featurizer (feature hashing over document tokens),
- Neyman allocation for stratified sampling budgets,
- a balanced range-split planner for repartitionByRange layouts,
- uplift-by-decile (Qini-style) experiment readout,
- the stationary distribution of the event-type Markov chain by
  unrolled power iteration.

Same contract as every other operator module: pure DataFrame/window/agg
compositions (no row Python), exact-integer sums before any IEEE math,
one shared double expression per readout column, and a DuckDB oracle per
query.

Reference tie-in: the reference's analytic core is a keyed windowed
count (proc:131-140); these extend the same key -> agg -> readout shape
to the retention/experimentation/featurization queries a production
analytics stack runs beside it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window as W

from ..functions import dialect as dl
from ..sources.loaders import load_table


# ---------------------------------------------------------------- stickiness
MAU_WINDOW_DAYS = 28  # trailing window for the MAU denominator


def events_stickiness_dau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness per day — the canonical product-engagement
    ratio (what share of the monthly actives showed up today), with the
    MAU side computed EXACTLY over a trailing 28-day window.

    The naive exact plan (events_rolling_dau's day x user-day range
    join) pays a fan-out equal to the window length — fine at 7 days,
    4x worse at 28. This is the interval-merge rewrite: an active day d
    makes its user MAU-active for window ends [d, d+27], so per user,
    active days closer than the window merge into one covered interval
    (gaps-and-islands with gap > W as the break). Each user contributes
    ONE exploded row per covered day, not per (active-day x 28): for a
    regularly-active user the blow-up is ~1x, and the worst case
    (isolated single days) degrades to exactly the naive fan-out, never
    worse. MAU(d) is then a plain count because per-user intervals are
    disjoint by construction.

    Scale: the user-day distinct is the big shrink (cardinality bounded
    by users x days, orders below the event count); the lag window
    partitions by user; the explode is linear in covered user-days.
    Day-index arithmetic per the repo convention (unix_timestamp DIV
    86400 vs floor(epoch) in DuckDB — epoch() alone ROUNDS sub-second
    fractions)."""
    e = load_table(spark, sf_dir, "events")
    ud = (
        e.select(
            "user_id",
            F.expr("CAST(unix_timestamp(ts) DIV 86400 AS BIGINT)").alias("di"),
        )
        .distinct()
    )
    lag = F.lag("di").over(W.partitionBy("user_id").orderBy("di"))
    brk = F.when(
        lag.isNull() | (F.col("di") - lag > MAU_WINDOW_DAYS), F.lit(1)
    ).otherwise(F.lit(0))
    isl = ud.select(
        "user_id",
        "di",
        F.sum(brk).over(
            W.partitionBy("user_id").orderBy("di").rowsBetween(W.unboundedPreceding, 0)
        ).alias("island"),
    )
    cover = (
        isl.groupBy("user_id", "island")
        .agg(F.min("di").alias("lo"), F.max("di").alias("hi"))
        .select(
            "user_id",
            F.explode(
                F.expr(f"sequence(lo, hi + {MAU_WINDOW_DAYS - 1})")
            ).alias("di"),
        )
    )
    mau = cover.groupBy("di").agg(F.count(F.lit(1)).alias("mau_28d"))
    dau = ud.groupBy("di").agg(F.count(F.lit(1)).alias("dau"))
    ratio = dl.round_ratio(dl.SPARK, "dau", "mau_28d")
    return (
        dau.join(mau, "di")
        .selectExpr("di", "dau", "mau_28d", f"{ratio} AS stickiness")
        .orderBy("di")
    )


def _oracle_stickiness() -> str:
    d = dl.DUCK
    ratio = dl.round_ratio(d, "dau", "mau_28d")
    return f"""
WITH ud AS (
  SELECT DISTINCT user_id,
    (CAST(floor(epoch(ts)) AS BIGINT) // 86400) AS di
  FROM events
), brk AS (
  SELECT user_id, di,
    CASE WHEN di - lag(di) OVER (PARTITION BY user_id ORDER BY di)
              > {MAU_WINDOW_DAYS}
         OR lag(di) OVER (PARTITION BY user_id ORDER BY di) IS NULL
      THEN 1 ELSE 0 END AS b
  FROM ud
), isl AS (
  SELECT user_id, di,
    sum(b) OVER (PARTITION BY user_id ORDER BY di
                 ROWS UNBOUNDED PRECEDING) AS island
  FROM brk
), cover AS (
  SELECT user_id,
    unnest(generate_series(min(di), max(di) + {MAU_WINDOW_DAYS - 1})) AS di
  FROM isl GROUP BY user_id, island
), mau AS (
  SELECT di, count(*) AS mau_28d FROM cover GROUP BY di
), dau AS (
  SELECT di, count(*) AS dau FROM ud GROUP BY di
)
SELECT dau.di AS di, dau, mau_28d, {ratio} AS stickiness
FROM dau JOIN mau ON dau.di = mau.di
ORDER BY di
"""


# ---------------------------------------------------------------- kendall tau
def stats_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b between daily order volume and daily revenue — the
    rank-correlation twin of stats_spearman_rho that is robust to ties
    by construction (tau-b's denominator discounts tied pairs on either
    axis). Concordant/discordant/tied pair counts come from the classic
    pairwise definition over the DAY-GRAIN series.

    Scale: the quadratic pair join runs on the day grain, which is
    CALENDAR-bounded (~2.4k days at any SF — the same argument as every
    day-spine op): pairs are ~3M regardless of event volume, evaluated
    once. The O(n log n) merge-sort inversion count is the textbook
    alternative; at a calendar-bounded n it buys nothing. The non-equi
    self-join is whitelisted in tests/test_plan_hygiene.py with this
    reason. x/y are exact BIGINTs (count, cents), so the comparisons
    and the C/D/tie counts are integer-exact; tau-b and the normal
    z-statistic are one shared IEEE expression over them."""
    o = load_table(spark, sf_dir, "orders")
    day = (
        o.select(
            F.expr("CAST(unix_timestamp(o_orderdate) DIV 86400 AS BIGINT)").alias(
                "di"
            ),
            F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
        )
        .groupBy("di")
        .agg(F.count(F.lit(1)).alias("x"), F.sum("cents").alias("y"))
    )
    a = day.select(
        F.col("di").alias("di1"), F.col("x").alias("x1"), F.col("y").alias("y1")
    )
    b = day.select(
        F.col("di").alias("di2"), F.col("x").alias("x2"), F.col("y").alias("y2")
    )
    pairs = a.join(b, F.col("di1") < F.col("di2"))
    agg = pairs.agg(
        F.sum(
            F.when(
                ((F.col("x1") < F.col("x2")) & (F.col("y1") < F.col("y2")))
                | ((F.col("x1") > F.col("x2")) & (F.col("y1") > F.col("y2"))),
                1,
            ).otherwise(0)
        ).alias("nc"),
        F.sum(
            F.when(
                ((F.col("x1") < F.col("x2")) & (F.col("y1") > F.col("y2")))
                | ((F.col("x1") > F.col("x2")) & (F.col("y1") < F.col("y2"))),
                1,
            ).otherwise(0)
        ).alias("nd"),
        F.sum(F.when(F.col("x1") == F.col("x2"), 1).otherwise(0)).alias("tx"),
        F.sum(F.when(F.col("y1") == F.col("y2"), 1).otherwise(0)).alias("ty"),
        F.count(F.lit(1)).alias("n0"),
    )
    n_days = day.agg(F.count(F.lit(1)).alias("n_days"))
    tau = (
        "(CAST(nc - nd AS DOUBLE) "
        "/ sqrt(CAST(n0 - tx AS DOUBLE) * CAST(n0 - ty AS DOUBLE)))"
    )
    z = (
        "(3.0 * CAST(nc - nd AS DOUBLE) "
        "/ sqrt(CAST(n_days AS DOUBLE) * (n_days - 1) * (2 * n_days + 5) / 2.0))"
    )
    return agg.crossJoin(n_days).selectExpr(
        "n_days",
        "nc",
        "nd",
        "tx",
        "ty",
        f"round({tau}, 4) AS tau_b",
        f"round({z}, 4) AS z_stat",
    )


def _oracle_kendall() -> str:
    tau = (
        "(CAST(nc - nd AS DOUBLE) "
        "/ sqrt(CAST(n0 - tx AS DOUBLE) * CAST(n0 - ty AS DOUBLE)))"
    )
    z = (
        "(3.0 * CAST(nc - nd AS DOUBLE) "
        "/ sqrt(CAST(n_days AS DOUBLE) * (n_days - 1) * (2 * n_days + 5) / 2.0))"
    )
    return f"""
WITH day AS (
  SELECT (CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400) AS di,
    count(*) AS x,
    sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS y
  FROM orders GROUP BY 1
), agg AS (
  SELECT
    CAST(sum(CASE WHEN (a.x < b.x AND a.y < b.y)
                    OR (a.x > b.x AND a.y > b.y) THEN 1 ELSE 0 END) AS BIGINT) AS nc,
    CAST(sum(CASE WHEN (a.x < b.x AND a.y > b.y)
                    OR (a.x > b.x AND a.y < b.y) THEN 1 ELSE 0 END) AS BIGINT) AS nd,
    CAST(sum(CASE WHEN a.x = b.x THEN 1 ELSE 0 END) AS BIGINT) AS tx,
    CAST(sum(CASE WHEN a.y = b.y THEN 1 ELSE 0 END) AS BIGINT) AS ty,
    count(*) AS n0
  FROM day a JOIN day b ON a.di < b.di
), nn AS (SELECT count(*) AS n_days FROM day)
SELECT n_days, nc, nd, tx, ty,
  round({tau}, 4) AS tau_b,
  round({z}, 4) AS z_stat
FROM agg, nn
"""


# ------------------------------------------------------------ feature hashing
FH_DIM = 4096  # hashed feature space (2^12)
FH_TOP = 20    # readout rows


def ml_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing-trick featurizer (Weinberger et al. 2009) over the
    document corpus: every token maps to a feature index
    md5-prefix % FH_DIM with a +/-1 sign from an independent hash
    nibble — the fixed-width, vocabulary-free text featurization that
    large-scale linear models and online learners train on (no
    dictionary build, no driver-side vocab broadcast, new tokens never
    change the schema). Readout: the FH_TOP heaviest feature buckets
    with their instance counts, signed sums (the value a linear model
    would accumulate), and the distinct-token collision count per
    bucket.

    Consumes the shared tokenize-once staging relation. Scale: one
    token-grain hash agg into a D-bounded (4096-row) space — map-side
    partials do almost all the work, and the output is constant-sized
    regardless of corpus size. All-integer arithmetic (md5-prefix
    folds), so cross-engine equality is exact."""
    from .dedup import tokenized_docs_staging

    toks = tokenized_docs_staging(spark, sf_dir).select(
        F.explode("toks").alias("w")
    )
    h = toks.selectExpr("w", "md5(w) AS hx").selectExpr(
        "w",
        f"pmod({dl.hex_prefix_uint(dl.SPARK, 'hx', 8)}, {FH_DIM}) AS feat",
        f"CASE WHEN {dl.hex_nibble(dl.SPARK, 'substr(hx, 9, 1)')} < 8 "
        "THEN 1 ELSE -1 END AS sgn",
    )
    return (
        h.groupBy("feat")
        .agg(
            F.count(F.lit(1)).alias("n_instances"),
            F.sum("sgn").alias("signed_sum"),
            F.count_distinct("w").alias("n_distinct_tokens"),
        )
        .orderBy(F.desc("n_instances"), F.asc("feat"))
        .limit(FH_TOP)
    )


def _oracle_feature_hashing() -> str:
    d = dl.DUCK
    return f"""
WITH tokd AS (
  SELECT doc_id, {dl.split_ws(d, 'text')} AS toks FROM documents
), tok AS (
  SELECT {dl.unnest(d, 'toks')} AS w FROM tokd
), h AS (
  SELECT w, md5(w) AS hx FROM tok
), f AS (
  SELECT w,
    ({dl.hex_prefix_uint(d, 'hx', 8)}) % {FH_DIM} AS feat,
    CASE WHEN {dl.hex_nibble(d, 'substr(hx, 9, 1)')} < 8
      THEN 1 ELSE -1 END AS sgn
  FROM h
)
SELECT feat, count(*) AS n_instances,
  CAST(sum(sgn) AS BIGINT) AS signed_sum,
  count(DISTINCT w) AS n_distinct_tokens
FROM f GROUP BY feat
ORDER BY n_instances DESC, feat ASC
LIMIT {FH_TOP}
"""


# --------------------------------------------------------- neyman allocation
NEYMAN_BUDGET = 10000  # total sample budget to allocate across strata


def sample_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified sampling allocation over the events
    table (strata = event_type): the sample budget each stratum should
    get to minimize the variance of the estimated mean, n_h proportional
    to N_h * s_h — the survey-sampling design readout a platform shows
    next to its samplers (sample_stratified draws the rows; this decides
    HOW MANY per stratum, and how far proportional allocation is from
    optimal).

    Exact arithmetic: per-stratum n/s1/s2 are exact cents BIGINTs; the
    std, the Neyman and proportional shares, and the allocated budget
    are each ONE shared IEEE expression over them (ks_lambda
    convention). The stratum-total denominators ride a global window
    over the TYPE-GRAIN grouped relation (a handful of rows — never
    data-sized), not a scalar cross join.

    Scale: one (event_type) hash agg; everything after is constant-
    sized."""
    e = load_table(spark, sf_dir, "events")
    g = (
        e.select(
            "event_type",
            F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("s1"),
            F.sum(F.col("cents") * F.col("cents")).alias("s2"),
        )
        .filter(F.col("n") >= 2)
    )
    std = (
        "sqrt((CAST(n AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1) "
        "/ (CAST(n AS DOUBLE) * (n - 1)))"
    )
    w_all = W.partitionBy()
    scored = g.select(
        "event_type",
        "n",
        F.expr(std).alias("ns_std"),
        F.sum("n").over(w_all).alias("n_tot"),
        F.sum(F.expr(f"CAST(n AS DOUBLE) * {std}")).over(w_all).alias("d_tot"),
    )
    return scored.selectExpr(
        "event_type",
        "n AS n_rows",
        "round(ns_std / 100, 4) AS std_dollars",
        "round(CAST(n AS DOUBLE) * ns_std / d_tot, 4) AS neyman_share",
        "round(CAST(n AS DOUBLE) / n_tot, 4) AS prop_share",
        f"round({NEYMAN_BUDGET} * CAST(n AS DOUBLE) * ns_std / d_tot, 2) "
        "AS alloc_rows",
    ).orderBy("event_type")


def _oracle_neyman() -> str:
    std = (
        "sqrt((CAST(n AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1) "
        "/ (CAST(n AS DOUBLE) * (n - 1)))"
    )
    return f"""
WITH g AS (
  SELECT event_type, count(*) AS n,
    sum(CAST(round(value * 100) AS BIGINT)) AS s1,
    sum(CAST(round(value * 100) AS BIGINT)
        * CAST(round(value * 100) AS BIGINT)) AS s2
  FROM events GROUP BY 1
  HAVING count(*) >= 2
), scored AS (
  SELECT event_type, n, {std} AS ns_std,
    sum(n) OVER () AS n_tot,
    sum(CAST(n AS DOUBLE) * {std}) OVER () AS d_tot
  FROM g
)
SELECT event_type, n AS n_rows,
  round(ns_std / 100, 4) AS std_dollars,
  round(CAST(n AS DOUBLE) * ns_std / d_tot, 4) AS neyman_share,
  round(CAST(n AS DOUBLE) / n_tot, 4) AS prop_share,
  round({NEYMAN_BUDGET} * CAST(n AS DOUBLE) * ns_std / d_tot, 2) AS alloc_rows
FROM scored ORDER BY event_type
"""


QUERIES = {
    "events_stickiness_dau_mau": events_stickiness_dau_mau,
    "stats_kendall_tau": stats_kendall_tau,
    "ml_feature_hashing": ml_feature_hashing,
    "sample_neyman_allocation": sample_neyman_allocation,
}

ORACLES = {
    "events_stickiness_dau_mau": _oracle_stickiness(),
    "stats_kendall_tau": _oracle_kendall(),
    "ml_feature_hashing": _oracle_feature_hashing(),
    "sample_neyman_allocation": _oracle_neyman(),
}
