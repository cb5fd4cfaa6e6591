"""Data-layout and ETL-shaping operators: z-order clustering keys (the
data-skipping story), fixed-width histograms (profiling before layout
decisions), and SCD2 effective-dated ranges (the warehouse-shaping step).

Scale rationale: at 100 TB the scan cost is decided before the query runs —
by how the writer laid the files out. A z-order key interleaves the bits of
two filter columns so rows close in (user, time) land in the same file;
parquet min/max footers then prune most files for either predicate. The
operator here computes the key and PROVES the locality (per-block bounding
boxes) with integer-exact arithmetic, so the oracle verifies the actual bit
math a writer would `sortWithinPartitions` on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from ..functions import dialect as dl
from ..sources.loaders import load_table

Z_BITS = 10          # bits kept per dimension (user, hour)
Z_BLOCK_SHIFT = 12   # z >> shift = the "file" a writer would group into


def _epoch_sec(d: str) -> str:
    return "unix_timestamp(ts)" if d == dl.SPARK else "CAST(epoch(ts) AS BIGINT)"


def _bit(d: str, col: str, i: int, out_pos: int) -> str:
    """Bit i of ``col`` moved to position ``out_pos`` (dual-dialect)."""
    if d == dl.SPARK:
        return f"shiftleft(shiftright({col}, {i}) & 1, {out_pos})"
    return f"((({col} >> {i}) & 1) << {out_pos})"


def _z_sql(d: str) -> str:
    """Interleave Z_BITS bits of ux (even positions) and tb (odd)."""
    terms = [_bit(d, "ux", i, 2 * i) for i in range(Z_BITS)]
    terms += [_bit(d, "tb", i, 2 * i + 1) for i in range(Z_BITS)]
    return "(" + " + ".join(terms) + ")"


def layout_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over (user_id, event hour), then the
    per-block locality audit: for each Z_BLOCK (what a writer would emit as
    one file after sorting by z), the row count and the (user, hour)
    bounding box. Tight boxes = min/max footer pruning works for BOTH
    filter columns — the property a 100 TB layout is chosen for. All
    integer bit arithmetic, identical in both engines."""
    ev = load_table(spark, sf_dir, "events")
    d = dl.SPARK
    masked = ev.select(
        F.expr(f"user_id & {2 ** Z_BITS - 1}").alias("ux"),
        F.expr(f"({_epoch_sec(d)} DIV 3600) & {2 ** Z_BITS - 1}").alias("tb"),
    )
    z = masked.withColumn("z", F.expr(_z_sql(d)))
    return (
        z.groupBy(F.expr(f"shiftright(z, {Z_BLOCK_SHIFT})").cast("int").alias("z_block"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("ux").alias("min_user"),
            F.max("ux").alias("max_user"),
            F.min("tb").alias("min_hour"),
            F.max("tb").alias("max_hour"),
        )
        .withColumn(
            "bbox_area",
            (
                (F.col("max_user") - F.col("min_user") + 1)
                * (F.col("max_hour") - F.col("min_hour") + 1)
            ).cast("bigint"),
        )
    )


def _oracle_zorder() -> str:
    d = dl.DUCK
    return f"""
WITH masked AS (
  SELECT user_id & {2 ** Z_BITS - 1} AS ux,
    (({_epoch_sec(d)}) // 3600) & {2 ** Z_BITS - 1} AS tb
  FROM events
), zz AS (
  SELECT ux, tb, {_z_sql(d)} AS z FROM masked
)
SELECT CAST(z >> {Z_BLOCK_SHIFT} AS INT) AS z_block, count(*) AS n_rows,
  min(ux) AS min_user, max(ux) AS max_user,
  min(tb) AS min_hour, max(tb) AS max_hour,
  CAST((max(ux) - min(ux) + 1) * (max(tb) - min(tb) + 1) AS BIGINT) AS bbox_area
FROM zz GROUP BY 1
"""


HIST_BUCKET_WIDTH = 25
HIST_MAX_BUCKET = 19  # values clamp into [0, (HIST_MAX_BUCKET+1)*WIDTH)


def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram per event type — the profiling step
    before choosing layout/partition bounds. Buckets via floor (truncating
    casts diverge between engines); sums in integer cents so no double
    summation order can flip a digit. One scan, one small agg shuffle."""
    ev = load_table(spark, sf_dir, "events")
    bucket = F.expr(
        f"CAST(least(floor(value / {HIST_BUCKET_WIDTH}.0), {HIST_MAX_BUCKET}) AS INT)"
    )
    cents = F.expr("CAST(round(value * 100) AS BIGINT)")
    return (
        ev.select("event_type", bucket.alias("bucket"), cents.alias("cents"))
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("cents").alias("total_cents"))
        .withColumn("bucket_lo", (F.col("bucket") * HIST_BUCKET_WIDTH).cast("int"))
        .withColumn("bucket_hi", ((F.col("bucket") + 1) * HIST_BUCKET_WIDTH).cast("int"))
    )


def _oracle_value_histogram() -> str:
    b = f"CAST(least(floor(value / {HIST_BUCKET_WIDTH}.0), {HIST_MAX_BUCKET}) AS INT)"
    return f"""
SELECT event_type, {b} AS bucket, count(*) AS n_events,
  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents,
  CAST({b} * {HIST_BUCKET_WIDTH} AS INT) AS bucket_lo,
  CAST(({b} + 1) * {HIST_BUCKET_WIDTH} AS INT) AS bucket_hi
FROM events GROUP BY event_type, {b}
"""


# open-ended sentinel; kept inside pandas' datetime64[ns] range (year 2262
# cap) because the verification harness normalizes dates through pandas
SCD_OPEN_END = "2099-12-31"


def orders_scd_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 construction: each customer's order history becomes
    effective-dated rows (valid from its order date until the day before
    the next order; the latest row stays open-ended and flagged current).
    The warehouse-shaping step every dimension build runs. One window per
    customer key — shuffles once on the uniform o_custkey; ties on a date
    are ordered by o_orderkey so the ranges are deterministic (a same-day
    successor yields an empty range, by construction, not by chance)."""
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "o_orderdate", F.to_date("o_orderdate")  # stored as timestamp
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = F.lead("o_orderdate", 1).over(w)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderstatus",
        F.col("o_orderdate").alias("effective_from"),
        F.coalesce(F.date_sub(nxt, 1), F.to_date(F.lit(SCD_OPEN_END))).alias(
            "effective_to"
        ),
        nxt.isNull().cast("int").alias("is_current"),
    )


def _oracle_scd_ranges() -> str:
    return f"""
WITH o AS (
  SELECT o_custkey, o_orderkey, o_orderstatus,
    CAST(o_orderdate AS DATE) AS o_orderdate
  FROM orders
), nxt AS (
  SELECT o_custkey, o_orderkey, o_orderstatus, o_orderdate,
    lead(o_orderdate) OVER (
      PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ) AS next_date
  FROM o
)
SELECT o_custkey, o_orderkey, o_orderstatus,
  o_orderdate AS effective_from,
  coalesce(next_date - 1, DATE '{SCD_OPEN_END}') AS effective_to,
  CAST(CASE WHEN next_date IS NULL THEN 1 ELSE 0 END AS INT) AS is_current
FROM nxt
"""


INCR_SPLIT_DATE = "1997-01-01"


def orders_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance: the per-customer order aggregate
    is computed as BASE (orders before INCR_SPLIT_DATE, the 'materialized'
    state) merged with DELTA (the increment) via a full-outer coalesce-sum
    — never by re-aggregating the full history.

    This is the pattern that keeps a 100 TB warehouse viable: the nightly
    job aggregates only the new partition (pruned scan on the date
    predicate) and merges it into customer-keyed state; both sides shuffle
    on the same key so the merge co-partitions. All sums are integer cents
    — the merge is EXACT, and the DuckDB oracle computes the aggregate the
    non-incremental way (one direct groupBy over all orders), so the
    hash-match proves merge(base, delta) == full recompute."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")
    split = F.lit(INCR_SPLIT_DATE).cast("timestamp")

    def agg(df: DataFrame, n: str, c: str) -> DataFrame:
        return df.groupBy("o_custkey").agg(
            F.count(F.lit(1)).alias(n), F.sum(cents).alias(c)
        )

    base = agg(o.filter(F.col("o_orderdate") < split), "bn", "bc")
    delta = agg(o.filter(F.col("o_orderdate") >= split), "dn", "dc")
    zero = F.lit(0).cast("bigint")
    return base.join(delta, "o_custkey", "full_outer").select(
        "o_custkey",
        (F.coalesce("bn", zero) + F.coalesce("dn", zero)).alias("n_orders"),
        (F.coalesce("bc", zero) + F.coalesce("dc", zero)).alias("total_cents"),
    )


def _oracle_incremental_merge() -> str:
    # deliberately NON-incremental: the direct aggregate over all orders.
    # Hash-equality with the Spark merge result proves the incremental
    # path reconstructs the full-recompute answer exactly.
    return f"""
SELECT o_custkey, count(*) AS n_orders,
  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
FROM orders GROUP BY o_custkey
"""


QUERIES = {
    "layout_zorder_key": layout_zorder_key,
    "events_value_histogram": events_value_histogram,
    "orders_scd_ranges": orders_scd_ranges,
    "orders_incremental_merge": orders_incremental_merge,
}

ORACLES = {
    "layout_zorder_key": _oracle_zorder(),
    "events_value_histogram": _oracle_value_histogram(),
    "orders_scd_ranges": _oracle_scd_ranges(),
    "orders_incremental_merge": _oracle_incremental_merge(),
}
