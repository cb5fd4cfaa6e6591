"""Batch relational core (SURVEY.md §2.4): the full join / aggregation /
window-function / set-op / scalar-function surface, as idiomatic DataFrame
queries with matching DuckDB oracle SQL.

The reference exercises almost none of this directly (its only Catalyst op is
``dropDuplicates``, proc:115; its only join is the dormant RDD equi-join,
proc:93) — this module supplies the declarative surface a user of a general
engine needs, planned entirely by Catalyst.

Determinism conventions (driver hashes values order-insensitively):
- Money sums go through DECIMAL(18,2) so partial-aggregation order can't
  perturb floating point; the final value is CAST to DOUBLE and round(4)ed.
  DuckDB does the identical decimal arithmetic -> bit-equal doubles.
- Averages are computed as exact-decimal-sum / count, never avg(double).
- Every LIMIT/top-k query carries a total tie-breaking ORDER BY.

Scale notes:
- Dimension joins (region/nation/supplier/part) use explicit
  ``F.broadcast`` — at 100 TB the fact side never shuffles for them.
- Fact-fact joins (orders ⋈ lineitem) are left to sort-merge + AQE.
- Aggregations are partial/final hash aggs planned by Catalyst; no manual
  combiner logic (the reference hand-rolled one, proc:247-255).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window as W

from ..sources.loaders import driver_rows_df, load_table, register_table_view


def _dec(c: str | Column) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return col.cast("decimal(18,2)")


def _sumd(expr: Column, alias: str) -> Column:
    """Exact decimal sum -> double, rounded: partition-order independent."""
    return F.round(F.sum(expr).cast("double"), 4).alias(alias)


def _avgd(expr: Column, alias: str) -> Column:
    """Deterministic average: exact decimal sum / count, in double."""
    return F.round(F.sum(expr).cast("double") / F.count(F.lit(1)), 4).alias(alias)


# ---------------------------------------------------------------------------
# Aggregation queries
# ---------------------------------------------------------------------------

def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy filtered group-by with 8 aggregates.
    Filter reaches the parquet scan (PushedFilters); partial/final hash agg."""
    l = load_table(spark, sf_dir, "lineitem")
    disc_price = _dec("l_extendedprice") * _dec(F.lit(1) - F.col("l_discount"))
    charge = disc_price * _dec(F.lit(1) + F.col("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _sumd(_dec("l_quantity"), "sum_qty"),
            _sumd(_dec("l_extendedprice"), "sum_base_price"),
            _sumd(disc_price, "sum_disc_price"),
            _sumd(charge, "sum_charge"),
            _avgd(_dec("l_quantity"), "avg_qty"),
            _avgd(_dec("l_extendedprice"), "avg_price"),
            _avgd(_dec("l_discount"), "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


ORACLE_Q01 = """
SELECT l_returnflag, l_linestatus,
  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 4) AS sum_qty,
  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 4) AS sum_base_price,
  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE), 4) AS sum_disc_price,
  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2)) * CAST(1 + l_tax AS DECIMAL(18,2))) AS DOUBLE), 4) AS sum_charge,
  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4) AS avg_qty,
  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4) AS avg_price,
  round(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4) AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter + single agg — the predicate-pushdown
    showcase (all three predicates land in PushedFilters)."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount").between(0.02, 0.06))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _sumd(_dec("l_extendedprice") * _dec("l_discount"), "revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


ORACLE_Q06 = """
SELECT
  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE), 4) AS revenue,
  count(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 24
"""


def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join (broadcast the filtered customer side is
    wrong at scale — customer grows with SF — so sort-merge orders⋈lineitem,
    and let AQE choose for customer), group, deterministic top-10."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1998-01-01"))
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1996-01-01"))
    revenue = _dec("l_extendedprice") * _dec(F.lit(1) - F.col("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_sumd(revenue, "revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


ORACLE_Q03 = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE), 4) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1996-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def q05_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way star join. Dims (region, nation, supplier) are
    broadcast explicitly — zero shuffle for them at any scale; the orders ⋈
    lineitem fact join shuffles on orderkey only."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    revenue = _dec("l_extendedprice") * _dec(F.lit(1) - F.col("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .filter(c.c_nationkey == s.s_nationkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(_sumd(revenue, "revenue"))
    )


ORACLE_Q05 = """
SELECT n_name,
  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE), 4) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
"""


def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: fact-fact join + CASE conditional aggregation
    (high/low priority line counts per returnflag-year)."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01")) & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag", F.year("l_shipdate").alias("ship_year"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_priority_lines"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_priority_lines"),
        )
    )


ORACLE_Q12 = """
SELECT l_returnflag, CAST(year(l_shipdate) AS INT) AS ship_year,
  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_priority_lines,
  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_priority_lines
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1, 2
"""


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: ratio of conditional sum to total sum (promo revenue
    share per ship-year), dim join broadcast."""
    p = load_table(spark, sf_dir, "part")
    l = load_table(spark, sf_dir, "lineitem")
    disc_price = _dec("l_extendedprice") * _dec(F.lit(1) - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc_price).otherwise(F.lit(0).cast("decimal(18,2)"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy(F.year("l_shipdate").alias("ship_year"))
        .agg(
            F.round(
                F.lit(100.0) * F.sum(promo).cast("double") / F.sum(disc_price).cast("double"), 4
            ).alias("promo_revenue_pct"),
            _sumd(disc_price, "total_revenue"),
        )
    )


ORACLE_Q14 = """
SELECT CAST(year(l_shipdate) AS INT) AS ship_year,
  round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
      THEN CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))
      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
    / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE), 4) AS promo_revenue_pct,
  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE), 4) AS total_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY 1
"""


def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING-filtered aggregate subquery joined back to
    the dimension chain (orders whose total quantity exceeds a threshold)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.round(F.sum(_dec("l_quantity")).cast("double"), 4).alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate",
                F.round("o_totalprice", 4).alias("o_totalprice"), "total_qty")
    )


ORACLE_Q18 = """
WITH big AS (
  SELECT l_orderkey,
    round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 4) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 4) > 150
)
SELECT c_custkey, c_name, o_orderkey, o_orderdate,
  round(o_totalprice, 4) AS o_totalprice, total_qty
FROM big JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs predicate across a join (brand/size/qty
    bands) — exercises disjunctive pushdown + constant folding."""
    p = load_table(spark, sf_dir, "part")
    l = load_table(spark, sf_dir, "lineitem")
    disc_price = _dec("l_extendedprice") * _dec(F.lit(1) - F.col("l_discount"))
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size").between(1, 15))
         & (F.col("l_quantity").between(1, 20)))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size").between(10, 30))
           & (F.col("l_quantity").between(10, 30)))
        | ((F.col("p_brand") == "Brand#13") & (F.col("p_size").between(20, 50))
           & (F.col("l_quantity").between(20, 50)))
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(_sumd(disc_price, "revenue"), F.count(F.lit(1)).alias("n_lines"))
    )


ORACLE_Q19 = """
SELECT
  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE), 4) AS revenue,
  count(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#13' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50)
"""


def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count_distinct / sum_distinct per group (expand + two-phase agg)."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").alias("n_parts"),
        F.count_distinct("l_suppkey").alias("n_supps"),
        F.round(F.sum_distinct(F.col("l_quantity").cast("decimal(18,2)")).cast("double"), 4).alias("sum_distinct_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )


ORACLE_AGG_DISTINCT = """
SELECT l_returnflag,
  count(DISTINCT l_partkey) AS n_parts,
  count(DISTINCT l_suppkey) AS n_supps,
  round(CAST(sum(DISTINCT CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 4) AS sum_distinct_qty,
  count(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
"""


def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over the region -> nation hierarchy (broadcast dims onto
    customer, then one grouping-sets agg)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return joined.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        _sumd(_dec("c_acctbal"), "sum_acctbal"),
    )


ORACLE_AGG_ROLLUP = """
SELECT r_name, n_name, count(*) AS n_customers,
  round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 4) AS sum_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two independent dimensions."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        _sumd(_dec("l_quantity"), "sum_qty"),
    )


ORACLE_AGG_CUBE = """
SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 4) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


# ---------------------------------------------------------------------------
# Join-type surface
# ---------------------------------------------------------------------------

def join_anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join: customers with no orders (plans as a shuffled or
    broadcast anti join; no fan-out, no dedup needed)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


ORACLE_JOIN_ANTI = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def join_semi_customers_with_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join: customers holding at least one open ('O') order."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )


ORACLE_JOIN_SEMI = """
SELECT c_custkey, c_nationkey, round(c_acctbal, 4) AS c_acctbal
FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
"""


def join_outer_nation_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two aggregates (customer vs supplier balance per
    nation) — exercises outer-join null semantics deterministically."""
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    cb = c.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_customers"), _sumd(_dec("c_acctbal"), "cust_bal")
    )
    sb = s.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_suppliers"), _sumd(_dec("s_acctbal"), "supp_bal")
    )
    return (
        cb.join(sb, cb.c_nationkey == sb.s_nationkey, "full_outer")
        .select(
            F.coalesce("c_nationkey", "s_nationkey").alias("nationkey"),
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("cust_bal", F.lit(0.0)).alias("cust_bal"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
            F.coalesce("supp_bal", F.lit(0.0)).alias("supp_bal"),
        )
    )


ORACLE_JOIN_OUTER = """
WITH cb AS (
  SELECT c_nationkey, count(*) AS n_customers,
    round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 4) AS cust_bal
  FROM customer GROUP BY c_nationkey
), sb AS (
  SELECT s_nationkey, count(*) AS n_suppliers,
    round(CAST(sum(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE), 4) AS supp_bal
  FROM supplier GROUP BY s_nationkey
)
SELECT coalesce(c_nationkey, s_nationkey) AS nationkey,
  coalesce(n_customers, 0) AS n_customers,
  coalesce(cust_bal, 0.0) AS cust_bal,
  coalesce(n_suppliers, 0) AS n_suppliers,
  coalesce(supp_bal, 0.0) AS supp_bal
FROM cb FULL OUTER JOIN sb ON c_nationkey = s_nationkey
"""


def join_range_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range/theta) join: price-band lookup. The bands table is a
    tiny broadcast side, so the theta condition runs as BroadcastNestedLoop —
    the right physical plan for band joins at any scale."""
    p = load_table(spark, sf_dir, "part")
    bands = driver_rows_df(
        spark,
        [("cheap", 0.0, 500.0), ("mid", 500.0, 1200.0), ("expensive", 1200.0, 1e9)],
        "band string, lo double, hi double",
    )
    return (
        p.join(
            F.broadcast(bands),
            (p.p_retailprice >= bands.lo) & (p.p_retailprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            _avgd(_dec("p_retailprice"), "avg_price"),
        )
    )


ORACLE_JOIN_RANGE = """
WITH bands(band, lo, hi) AS (
  VALUES ('cheap', 0.0, 500.0), ('mid', 500.0, 1200.0), ('expensive', 1200.0, 1e9)
)
SELECT band, count(*) AS n_parts,
  round(CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4) AS avg_price
FROM part JOIN bands ON p_retailprice >= lo AND p_retailprice < hi
GROUP BY band
"""


def join_asof_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of style join (an operator Spark lacks natively): for each customer,
    their most recent order ON OR BEFORE 1999-01-01. Expressed as filter +
    windowed row_number — composition of built-ins, one shuffle on custkey."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") <= F.lit("1999-01-01"))
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
    )


ORACLE_JOIN_ASOF = """
SELECT o_custkey, o_orderkey, o_orderdate, round(o_totalprice, 4) AS o_totalprice
FROM (
  SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders WHERE o_orderdate <= TIMESTAMP '1999-01-01'
) WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# Window functions / sorts / top-k / set ops
# ---------------------------------------------------------------------------

def window_topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed top-k (rank / dense_rank / row_number) — top 3 orders by
    price per customer, fully tie-broken."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .withColumn("rk", F.rank().over(w))
        .withColumn("drk", F.dense_rank().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 4).alias("o_totalprice"), "rn", "rk", "drk")
    )


ORACLE_WINDOW_TOPK = """
SELECT o_custkey, o_orderkey, round(o_totalprice, 4) AS o_totalprice,
  CAST(rn AS INT) AS rn, CAST(rk AS INT) AS rk, CAST(drk AS INT) AS drk
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
    row_number() OVER w AS rn, rank() OVER w AS rk, dense_rank() OVER w AS drk
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
) WHERE rn <= 3
"""


def window_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum + lag/lead over each customer's order history (frame:
    rows unbounded-preceding..current). Decimal running sum keeps the value
    exact at every prefix."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum(_dec("o_totalprice")).over(run).cast("double"), 4).alias("running_total"),
        F.round(F.lag("o_totalprice", 1).over(w), 4).alias("prev_price"),
        F.round(F.lead("o_totalprice", 1).over(w), 4).alias("next_price"),
        F.row_number().over(w).alias("order_seq"),
    )


ORACLE_WINDOW_RUNNING = """
SELECT o_custkey, o_orderkey,
  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 4) AS running_total,
  round(lag(o_totalprice, 1) OVER w, 4) AS prev_price,
  round(lead(o_totalprice, 1) OVER w, 4) AS next_price,
  CAST(row_number() OVER w AS INT) AS order_seq
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


def sort_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-20 by extendedprice. Plans as TakeOrderedAndProject —
    per-partition heap + driver merge, no full sort at scale."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.orderBy(F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber"))
        .limit(20)
        .select("l_orderkey", "l_linenumber", F.round("l_extendedprice", 4).alias("l_extendedprice"))
    )


ORACLE_SORT_TOPK = """
SELECT l_orderkey, l_linenumber, round(l_extendedprice, 4) AS l_extendedprice
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
LIMIT 20
"""


def set_ops_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT over customer vs supplier nation sets,
    labeled and re-unioned into one deterministic result."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey")).distinct()
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey")).distinct()
    both = c.intersect(s).withColumn("relation", F.lit("both"))
    cust_only = c.exceptAll(s).withColumn("relation", F.lit("customer_only"))
    supp_only = s.exceptAll(c).withColumn("relation", F.lit("supplier_only"))
    return both.unionByName(cust_only).unionByName(supp_only)


ORACLE_SET_OPS = """
WITH c AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
     s AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
SELECT nationkey, 'both' AS relation FROM (SELECT nationkey FROM c INTERSECT SELECT nationkey FROM s)
UNION ALL
SELECT nationkey, 'customer_only' AS relation FROM (SELECT nationkey FROM c EXCEPT SELECT nationkey FROM s)
UNION ALL
SELECT nationkey, 'supplier_only' AS relation FROM (SELECT nationkey FROM s EXCEPT SELECT nationkey FROM c)
"""


# ---------------------------------------------------------------------------
# Scalar-function surface (string / date / json)
# ---------------------------------------------------------------------------

def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function surface over part names (upper/substr/replace/concat/
    length/split/contains) — all whole-stage-codegen'd."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 4).alias("name_prefix"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.element_at(F.split(F.col("p_name"), " "), -1).alias("last_word"),
        F.col("p_name").contains("widget").cast("int").alias("is_widget"),
        F.trim(F.lit("  x  ")).alias("trimmed"),
    )


ORACLE_STRING_FUNCS = """
SELECT p_partkey,
  upper(p_name) AS name_upper,
  CAST(length(p_name) AS INT) AS name_len,
  substr(p_name, 1, 4) AS name_prefix,
  replace(p_name, ' ', '_') AS name_snake,
  concat_ws('|', p_brand, p_type) AS brand_type,
  string_split(p_name, ' ')[-1] AS last_word,
  CAST(contains(p_name, 'widget') AS INT) AS is_widget,
  trim('  x  ') AS trimmed
FROM part
"""


def datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time surface: truncation, extraction, arithmetic on orders."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            F.to_date(F.date_trunc("month", F.col("o_orderdate"))).alias("order_month"),
            F.year("o_orderdate").alias("order_year"),
            F.quarter("o_orderdate").alias("order_quarter"),
            F.dayofweek("o_orderdate").alias("order_dow"),
            _dec("o_totalprice").alias("price_dec"),
        )
        .groupBy("order_month", "order_year", "order_quarter", "order_dow")
        .agg(F.count(F.lit(1)).alias("n_orders"), _sumd(F.col("price_dec"), "sum_price"))
    )


# DuckDB dayofweek: Sunday=0; Spark dayofweek: Sunday=1 -> +1 aligns them.
ORACLE_DATETIME_FUNCS = """
SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
  CAST(year(o_orderdate) AS INT) AS order_year,
  CAST(quarter(o_orderdate) AS INT) AS order_quarter,
  CAST(dayofweek(o_orderdate) + 1 AS INT) AS order_dow,
  count(*) AS n_orders,
  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 4) AS sum_price
FROM orders
GROUP BY 1, 2, 3, 4
"""


def json_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction over events.props (the reference never parses its own
    payload JSON; a real engine must): get_json_object + typed cast + agg."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return (
        e.select(F.col("event_type"), k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.count_distinct("k").alias("n_distinct_k"),
        )
    )


ORACLE_JSON_FUNCS = """
SELECT event_type, count(*) AS n_events,
  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
  count(DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_distinct_k
FROM events
GROUP BY event_type
"""


def variant_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT path (Spark 4): parse props once into a
    VARIANT value, then typed variant_get extraction — the
    open-schema-JSON answer that replaces per-field get_json_object
    re-parses. At scale VARIANT's binary encoding is parsed once per row
    and every extraction is a cheap path lookup, vs one full JSON parse
    per extracted field. Oracle: DuckDB's native JSON extraction produces
    the same typed values."""
    e = load_table(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    return e.select(
        "event_id",
        F.try_variant_get(v, "$.k", "bigint").alias("k"),
        F.try_variant_get(v, "$.k", "string").alias("k_str"),
        F.try_variant_get(v, "$.missing", "bigint").alias("missing_field"),
        F.schema_of_variant(v).alias("variant_schema"),
    )


ORACLE_VARIANT_FUNCS = """
SELECT event_id,
  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
  json_extract_string(props, '$.k') AS k_str,
  CAST(NULL AS BIGINT) AS missing_field,
  'OBJECT<k: BIGINT>' AS variant_schema
FROM events
"""


def grouping_sets_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS via the SQL front-end (spark.sql), proving the engine's
    SQL surface, not just the DataFrame DSL."""
    register_table_view(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
          round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 4) AS sum_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), (o_orderstatus, o_orderpriority))
        """
    )


ORACLE_GROUPING_SETS = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 4) AS sum_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), (o_orderstatus, o_orderpriority))
"""


QUERIES = {
    "q01_pricing_summary": q01_pricing_summary,
    "q03_shipping_priority": q03_shipping_priority,
    "q05_region_revenue": q05_region_revenue,
    "q06_forecast_revenue": q06_forecast_revenue,
    "q12_priority_shipping": q12_priority_shipping,
    "q14_promo_revenue": q14_promo_revenue,
    "q18_large_volume_customers": q18_large_volume_customers,
    "q19_disjunctive_predicates": q19_disjunctive_predicates,
    "agg_distinct": agg_distinct,
    "agg_rollup": agg_rollup,
    "agg_cube": agg_cube,
    "grouping_sets_sql": grouping_sets_sql,
    "join_anti_customers_without_orders": join_anti_customers_without_orders,
    "join_semi_customers_with_open_orders": join_semi_customers_with_open_orders,
    "join_outer_nation_balance": join_outer_nation_balance,
    "join_range_theta": join_range_theta,
    "join_asof_latest_order": join_asof_latest_order,
    "window_topk_orders_per_customer": window_topk_orders_per_customer,
    "window_running_totals": window_running_totals,
    "sort_global_topk": sort_global_topk,
    "set_ops_nations": set_ops_nations,
    "string_functions": string_functions,
    "datetime_functions": datetime_functions,
    "json_functions": json_functions,
    "variant_functions": variant_functions,
}

ORACLES = {
    "q01_pricing_summary": ORACLE_Q01,
    "q03_shipping_priority": ORACLE_Q03,
    "q05_region_revenue": ORACLE_Q05,
    "q06_forecast_revenue": ORACLE_Q06,
    "q12_priority_shipping": ORACLE_Q12,
    "q14_promo_revenue": ORACLE_Q14,
    "q18_large_volume_customers": ORACLE_Q18,
    "q19_disjunctive_predicates": ORACLE_Q19,
    "agg_distinct": ORACLE_AGG_DISTINCT,
    "agg_rollup": ORACLE_AGG_ROLLUP,
    "agg_cube": ORACLE_AGG_CUBE,
    "grouping_sets_sql": ORACLE_GROUPING_SETS,
    "join_anti_customers_without_orders": ORACLE_JOIN_ANTI,
    "join_semi_customers_with_open_orders": ORACLE_JOIN_SEMI,
    "join_outer_nation_balance": ORACLE_JOIN_OUTER,
    "join_range_theta": ORACLE_JOIN_RANGE,
    "join_asof_latest_order": ORACLE_JOIN_ASOF,
    "window_topk_orders_per_customer": ORACLE_WINDOW_TOPK,
    "window_running_totals": ORACLE_WINDOW_RUNNING,
    "sort_global_topk": ORACLE_SORT_TOPK,
    "set_ops_nations": ORACLE_SET_OPS,
    "string_functions": ORACLE_STRING_FUNCS,
    "datetime_functions": ORACLE_DATETIME_FUNCS,
    "json_functions": ORACLE_JSON_FUNCS,
    "variant_functions": ORACLE_VARIANT_FUNCS,
}
