"""Shared-ANSI-text SQL battery: each query is ONE SQL string executed
verbatim by BOTH engines (spark.sql over temp views; DuckDB over the same
parquet views) — proving the SQL front-end end-to-end with zero translation
layer. Shapes: correlated scalar subquery in a predicate (Q2-ish),
two-sided dimension filter with year extraction (Q7-ish), top-k customer
ranking over a filtered join (Q10-ish), EXISTS-under-agg with a date-
interval correlation (Q4-ish), 5-way join with LIKE and year rollup
(Q9-ish), left-outer count distribution (Q13-ish), doubly-correlated
scalar-avg predicate (Q17-ish), NOT EXISTS + scalar-avg gate (Q22-ish).

The TPC-H columns absent from the driver tables (l_commitdate,
l_receiptdate, c_phone) are replaced by equivalent-shape predicates on
existing columns (shipdate-vs-orderdate lag, mktsegment grouping).

Determinism: decimal sums -> double -> round(4); total ORDER BY on every
LIMIT; only functions with identical semantics in both engines (year widths
differ — DuckDB BIGINT vs Spark INT — so date_part is explicitly CAST). Catalyst plans these exactly like the DataFrame versions:
the SQL front-end and the DSL meet in the same logical plan space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.loaders import load_table

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

_SQL = {
    "sql_q2_min_cost_supplier": SQL_Q2_MIN_COST_SUPPLIER,
    "sql_q4_late_shipments": SQL_Q4_LATE_SHIPMENTS,
    "sql_q7_volume_by_year": SQL_Q7_VOLUME_BY_YEAR,
    "sql_q9_profit_by_nation_year": SQL_Q9_PROFIT_BY_NATION_YEAR,
    "sql_q10_returned_items": SQL_Q10_RETURNED_ITEMS,
    "sql_q13_customer_distribution": SQL_Q13_CUSTOMER_DISTRIBUTION,
    "sql_q17_small_quantity_revenue": SQL_Q17_SMALL_QUANTITY_REVENUE,
    "sql_q22_dormant_rich_customers": SQL_Q22_DORMANT_RICH_CUSTOMERS,
}

_NEEDED = ("supplier", "nation", "lineitem", "orders", "customer", "part")


def _run(sql: str):
    def runner(spark: SparkSession, sf_dir: str) -> DataFrame:
        for t in _NEEDED:
            load_table(spark, sf_dir, t).createOrReplaceTempView(t)
        return spark.sql(sql)

    return runner


QUERIES = {name: _run(sql) for name, sql in _SQL.items()}
ORACLES = dict(_SQL)
