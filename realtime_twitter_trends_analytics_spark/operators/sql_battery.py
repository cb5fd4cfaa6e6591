"""Shared-ANSI-text SQL battery: each query is ONE SQL string executed
verbatim by BOTH engines (spark.sql over temp views; DuckDB over the same
parquet views) — proving the SQL front-end end-to-end with zero translation
layer. Shapes: correlated scalar subquery in a predicate (Q2-ish),
two-sided dimension filter with year extraction (Q7-ish), top-k customer
ranking over a filtered join (Q10-ish), EXISTS-under-agg with a date-
interval correlation (Q4-ish), 5-way join with LIKE and year rollup
(Q9-ish), left-outer count distribution (Q13-ish), doubly-correlated
scalar-avg predicate (Q17-ish), NOT EXISTS + scalar-avg gate (Q22-ish),
conditional-share-of-total over a 7-way join (Q8-ish), group-HAVING
against a global scalar (Q11-ish), CTE + max-of-CTE self-reference
(Q15-ish), NOT IN + count-distinct rollup (Q16-ish), nested IN with a
grouped HAVING inner (Q20-ish), EXISTS + NOT EXISTS self-joins on the
fact table (Q21-ish).

The TPC-H columns/tables absent from the driver tables (l_commitdate,
l_receiptdate, c_phone, partsupp) are replaced by equivalent-shape
predicates on existing columns (shipdate-vs-orderdate lag, mktsegment
grouping, lineitem-derived part-supplier supply relationships).

Determinism: decimal sums -> double -> round(4); total ORDER BY on every
LIMIT; only functions with identical semantics in both engines (year widths
differ — DuckDB BIGINT vs Spark INT — so date_part is explicitly CAST). Catalyst plans these exactly like the DataFrame versions:
the SQL front-end and the DSL meet in the same logical plan space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.loaders import load_table, register_table_view

SQL_Q2_MIN_COST_SUPPLIER = """
SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE s.s_acctbal = (
  SELECT max(s2.s_acctbal) FROM supplier s2 WHERE s2.s_nationkey = s.s_nationkey
)
"""

SQL_Q7_VOLUME_BY_YEAR = """
SELECT n1.n_name AS cust_nation,
  CAST(date_part('year', l.l_shipdate) AS INT) AS ship_year,
  round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
        * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE), 4) AS volume
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
WHERE n1.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
GROUP BY n1.n_name, 2
"""

SQL_Q10_RETURNED_ITEMS = """
SELECT c.c_custkey, c.c_name,
  round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
        * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE), 4) AS revenue,
  round(c.c_acctbal, 4) AS c_acctbal, c.c_mktsegment
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, c.c_mktsegment
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""

SQL_Q4_LATE_SHIPMENTS = """
SELECT o.o_orderpriority, count(*) AS order_count
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
)
GROUP BY o.o_orderpriority
"""

SQL_Q9_PROFIT_BY_NATION_YEAR = """
SELECT n.n_name, CAST(date_part('year', o.o_orderdate) AS INT) AS o_year,
  round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
        * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE), 4) AS profit
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_name LIKE '%a%'
GROUP BY 1, 2
"""

SQL_Q13_CUSTOMER_DISTRIBUTION = """
SELECT c_count, count(*) AS custdist FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c LEFT OUTER JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
) GROUP BY c_count
"""

SQL_Q17_SMALL_QUANTITY_REVENUE = """
SELECT round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 4) AS avg_yearly
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = (SELECT min(p_brand) FROM part)
  AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)
"""

SQL_Q22_DORMANT_RICH_CUSTOMERS = """
SELECT c.c_mktsegment, count(*) AS numcust,
  round(CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 4) AS totacctbal
FROM customer c
WHERE c.c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (
    SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
  )
GROUP BY c.c_mktsegment
"""

SQL_Q8_MARKET_SHARE = """
SELECT o_year,
  round(CAST(sum(CASE WHEN nation = 'NATION_1' THEN volume ELSE 0 END) AS DOUBLE)
        / sum(volume), 4) AS mkt_share
FROM (
  SELECT CAST(date_part('year', o.o_orderdate) AS INT) AS o_year,
    CAST(l.l_extendedprice AS DECIMAL(18,2))
      * CAST(1 - l.l_discount AS DECIMAL(18,2)) AS volume,
    n2.n_name AS nation
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
  JOIN region r ON n1.n_regionkey = r.r_regionkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
  WHERE r.r_name = 'ASIA'
) all_nations
GROUP BY o_year
"""

SQL_Q11_IMPORTANT_SUPPLY = """
SELECT l.l_partkey AS ps_partkey,
  round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
        * CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE), 4) AS supply_value
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE n.n_name = 'NATION_1'
GROUP BY l.l_partkey
HAVING sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(l.l_quantity AS DECIMAL(18,2))) > (
  SELECT 0.001 * sum(CAST(l2.l_extendedprice AS DECIMAL(18,2)) * CAST(l2.l_quantity AS DECIMAL(18,2)))
  FROM lineitem l2
  JOIN supplier s2 ON l2.l_suppkey = s2.s_suppkey
  JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
  WHERE n2.n_name = 'NATION_1'
)
ORDER BY supply_value DESC, ps_partkey ASC
"""

SQL_Q15_TOP_SUPPLIER = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
    round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
          * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE), 4) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s
JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s.s_suppkey
"""

SQL_Q16_SUPPLIER_CNT = """
SELECT p.p_brand, p.p_type, p.p_size,
  count(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#13'
  AND p.p_type NOT LIKE 'PROMO%'
  AND p.p_size IN (1, 2, 3, 4, 5, 10, 15, 20)
  AND l.l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC
"""

SQL_Q20_EXCESS_SUPPLIERS = """
SELECT s.s_name, s.s_suppkey
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE n.n_name = 'NATION_2'
  AND s.s_suppkey IN (
    SELECT l.l_suppkey
    FROM lineitem l
    WHERE l.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%gear%')
      AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_suppkey, l.l_partkey
    HAVING sum(l.l_quantity) > 30
  )
ORDER BY s.s_suppkey
"""

SQL_Q21_WAITING_ORDERS = """
SELECT s.s_name, count(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE o.o_orderstatus = 'F'
  AND n.n_name = 'NATION_3'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY s.s_name
ORDER BY numwait DESC, s_name ASC
"""

# Spark 4 WITH RECURSIVE (and DuckDB's, same ANSI text): generate a
# 60-day calendar spine by recursion, densify daily order counts so
# zero-order days appear — the gap-free time-series shape reporting needs.
# Integer-cents sums keep the join exact; depth 60 sits well under
# spark.sql.cteRecursionLevelLimit (100).
SQL_RECURSIVE_DATE_SPINE = """
WITH RECURSIVE cal(d) AS (
  SELECT CAST('1997-01-01' AS DATE)
  UNION ALL
  SELECT CAST(d + INTERVAL 1 DAY AS DATE) FROM cal WHERE d < CAST('1997-03-01' AS DATE)
), daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d, count(*) AS n,
    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY 1
)
SELECT cal.d AS order_day,
  CAST(coalesce(daily.n, 0) AS BIGINT) AS n_orders,
  CAST(coalesce(daily.cents, 0) AS BIGINT) AS total_cents
FROM cal LEFT JOIN daily ON daily.d = cal.d
ORDER BY order_day
"""

# Correlated LATERAL subquery (Spark 3.2+/DuckDB): per driving row, an
# inner ordered-LIMIT scan — the "top-N related rows per entity" shape that
# otherwise needs a window + filter. Catalyst decorrelates this into a
# ranked join (no per-row re-execution); total ORDER BY in the inner LIMIT
# keeps both engines deterministic.
SQL_LATERAL_TOPK_ORDERS = """
SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
FROM (SELECT c_custkey, c_name
      FROM customer ORDER BY c_acctbal DESC, c_custkey LIMIT 10) c,
LATERAL (SELECT o_orderkey, o_totalprice FROM orders
         WHERE o_custkey = c.c_custkey
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) o
"""

# GROUP BY ALL (Spark 3.4+/DuckDB): group by every non-aggregate select
# item — removes the copy-the-select-list failure mode in wide rollups.
SQL_GROUP_BY_ALL = """
SELECT o_orderstatus, o_orderpriority,
  count(*) AS n_orders,
  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
FROM orders
GROUP BY ALL
"""

_SQL = {
    "sql_recursive_date_spine": SQL_RECURSIVE_DATE_SPINE,
    "sql_lateral_topk_orders": SQL_LATERAL_TOPK_ORDERS,
    "sql_group_by_all": SQL_GROUP_BY_ALL,
    "sql_q2_min_cost_supplier": SQL_Q2_MIN_COST_SUPPLIER,
    "sql_q4_late_shipments": SQL_Q4_LATE_SHIPMENTS,
    "sql_q7_volume_by_year": SQL_Q7_VOLUME_BY_YEAR,
    "sql_q8_market_share": SQL_Q8_MARKET_SHARE,
    "sql_q11_important_supply": SQL_Q11_IMPORTANT_SUPPLY,
    "sql_q15_top_supplier": SQL_Q15_TOP_SUPPLIER,
    "sql_q16_supplier_cnt": SQL_Q16_SUPPLIER_CNT,
    "sql_q20_excess_suppliers": SQL_Q20_EXCESS_SUPPLIERS,
    "sql_q21_waiting_orders": SQL_Q21_WAITING_ORDERS,
    "sql_q9_profit_by_nation_year": SQL_Q9_PROFIT_BY_NATION_YEAR,
    "sql_q10_returned_items": SQL_Q10_RETURNED_ITEMS,
    "sql_q13_customer_distribution": SQL_Q13_CUSTOMER_DISTRIBUTION,
    "sql_q17_small_quantity_revenue": SQL_Q17_SMALL_QUANTITY_REVENUE,
    "sql_q22_dormant_rich_customers": SQL_Q22_DORMANT_RICH_CUSTOMERS,
}

_NEEDED = ("supplier", "nation", "region", "lineitem", "orders", "customer", "part")


def _run(sql: str):
    def runner(spark: SparkSession, sf_dir: str) -> DataFrame:
        for t in _NEEDED:
            register_table_view(spark, sf_dir, t)
        return spark.sql(sql)

    return runner


QUERIES = {name: _run(sql) for name, sql in _SQL.items()}
ORACLES = dict(_SQL)
