"""Planted hot-key skew evidence (round 9, VERDICT r8 item 7).

skew.py's salted shapes (two-phase agg, salted join) are oracle-green, but
through round 8 SCALE_SMOKE had no HOT-KEY fixture — the disjoint-shard
scale-ups deliberately add shards, not hot keys, so nothing measured that
the salt actually flattens a straggler. This tool plants one:

Fixture: N rows (default 40M, ~x80 of the bench token volume) with a
power-law key column — ONE key carries 35% of all rows, the rest spread
uniformly over 9,999 cold keys — and a per-row-unique value column.
Deterministic (id-derived, no rand()), written once to parquet.

Two skew-sensitive shapes are measured, UNSALTED vs SALTED, plus the AQE
runtime defense where it applies:

1. heavy-state distinct agg: groupBy(key).size(collect_set(value)).
   Map-side partial aggregation does not help (values are unique, the
   partial sets union without shrinking), and AQE cannot split an
   aggregation's skewed partition (skew handling is join-only) — the hot
   key's millions of values build ONE reducer's set while every other
   reducer idles. The SALT IS THE DEFENSE: phase 1 groups on
   (key, salt=hash(value)%B) — exact, because each distinct value lands
   in exactly one bucket — phase 2 sums the B partial distinct counts.
   (Spark's own count_distinct avoids this via the Expand rewrite, which
   re-keys the first aggregate by (key, value) — the same spread-by-value
   trick built into the planner; collect_set/collect_list sessionization
   shapes get no such rewrite, which is what this measures.)
2. fact-to-dim equi-join on the skewed key with the broadcast path
   disabled (autoBroadcastJoinThreshold=-1 — the regime where the dim is
   too big to broadcast): sort-merge join puts the hot key's 1.75M fact
   rows in one task. Measured three ways: unsalted with AQE skew-join
   OFF (the straggler), salted — replicate the dim SALT_BUCKETS times,
   salt the fact side (flattened by construction), and unsalted with AQE
   skew-join ON (Spark's runtime re-plan, the second defense skew.py
   documents).

Besides wall time, the report records the dominant stage's p50/max task
durations (UI REST taskSummary) — the straggler is visible as max >> p50
on the unsalted run and max ~ p50 on the salted one — and asserts the
salted results EQUAL the unsalted ones (salting must be invisible in
results, the same invariant tests/test_skew_blocking.py pins at sf0.01).

Usage: python tools/skew_smoke.py [--rows 40000000] [--append SCALE_SMOKE.md]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from realtime_twitter_trends_analytics_spark.operators.skew import SALT_BUCKETS  # noqa: E402
from realtime_twitter_trends_analytics_spark.session import apply_runtime_confs  # noqa: E402

WORK = "/tmp/skew_smoke"
HOT_SHARE_PCT = 35
COLD_KEYS = 9_999
SECTION_HEADER = "## Planted hot-key skew: salted vs unsalted (round 9)"


def build_fixture(spark: SparkSession, n_rows: int) -> str:
    path = f"{WORK}/fact_{n_rows}"
    if os.path.exists(f"{path}/_SUCCESS"):
        return path
    # 35% of ids -> key 0 (id%100<35), rest uniform over the cold keys;
    # value is per-row unique so count_distinct state is maximal
    df = spark.range(n_rows).select(
        F.when(F.col("id") % 100 < HOT_SHARE_PCT, F.lit(0))
        .otherwise(F.pmod(F.hash(F.col("id")), COLD_KEYS) + 1)
        .alias("key"),
        F.col("id").alias("value"),
    )
    df.repartition(32).write.mode("overwrite").parquet(path)
    return path


def _rest(spark: SparkSession, suffix: str):
    port = spark.sparkContext.uiWebUrl.rsplit(":", 1)[-1]
    app = spark.sparkContext.applicationId
    url = f"http://localhost:{port}/api/v1/applications/{app}{suffix}"
    return json.loads(urllib.request.urlopen(url, timeout=10).read())


def straggler_profile(spark: SparkSession, since_stage_id: int) -> dict:
    """p50/max TASK duration of the heaviest post-`since_stage_id` REDUCE
    stage (shuffle read > 0; heaviest = max single-task duration): the
    straggler signature — scan stages are excluded so a slow parquet read
    can't mask the reducer picture."""
    stages = _rest(spark, "/stages?status=complete")
    worst = None
    for st in stages:
        if st["stageId"] <= since_stage_id or not st.get("shuffleReadBytes", 0):
            continue
        try:
            summ = _rest(
                spark,
                f"/stages/{st['stageId']}/{st['attemptId']}/taskSummary"
                "?quantiles=0.5,1.0",
            )
        except Exception:
            continue
        p50, p100 = summ["executorRunTime"]
        if worst is None or p100 > worst["max_task_ms"]:
            worst = {
                "stage_id": st["stageId"],
                "p50_task_ms": round(p50),
                "max_task_ms": round(p100),
                "n_tasks": st["numCompleteTasks"],
            }
    return worst or {}


def last_stage_id(spark: SparkSession) -> int:
    stages = _rest(spark, "/stages?status=complete")
    return max((st["stageId"] for st in stages), default=-1)


def timed(spark: SparkSession, df) -> tuple[float, list, dict]:
    sid0 = last_stage_id(spark)
    t0 = time.time()
    rows = df.collect()
    dt = time.time() - t0
    return round(dt, 2), rows, straggler_profile(spark, sid0)


def run(spark: SparkSession, fact_path: str) -> list[dict]:
    fact = spark.read.parquet(fact_path)
    out: list[dict] = []

    # ---------- 1. heavy-state distinct aggregation ----------
    unsalted_agg = fact.groupBy("key").agg(
        F.size(F.collect_set("value")).cast("long").alias("nd")
    )
    salted_agg = (
        fact.withColumn("salt", F.pmod(F.hash("value"), F.lit(SALT_BUCKETS)))
        .groupBy("key", "salt")
        .agg(F.size(F.collect_set("value")).cast("long").alias("pnd"))
        .groupBy("key")
        .agg(F.sum("pnd").alias("nd"))
    )
    check = lambda rows: (len(rows), sum(r["nd"] for r in rows))  # noqa: E731
    t_u, r_u, s_u = timed(spark, unsalted_agg)
    t_s, r_s, s_s = timed(spark, salted_agg)
    assert check(r_u) == check(r_s), (check(r_u), check(r_s))
    out.append({"shape": "distinct_agg unsalted", "sec": t_u, **s_u})
    out.append({"shape": "distinct_agg salted", "sec": t_s, **s_s})

    # ---------- 2. fact-to-dim join, broadcast disabled ----------
    dim = (
        spark.range(COLD_KEYS + 1)
        .select(F.col("id").alias("key"), (F.col("id") * 7).alias("payload"))
        .repartition(4)
    )
    dim.write.mode("overwrite").parquet(f"{WORK}/dim")
    dim = spark.read.parquet(f"{WORK}/dim")

    prev_bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_skew = spark.conf.get("spark.sql.adaptive.skewJoin.enabled")
    prev_thresh = spark.conf.get(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
    )
    prev_advis = spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        # sum(value) forces the fact side to carry its unique value column
        # through the join shuffle: a constant-key-only shuffle row
        # compresses ~100x (lz4 map outputs) and AQE's byte-based skew
        # detection — like any size-based planner — would see a tiny hot
        # partition that is huge in ROWS; real fact payloads don't
        # compress like that, and neither should the fixture's
        join_agg = lambda j: j.groupBy().agg(  # noqa: E731
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("sv"),
            F.sum("payload").alias("sp"),
        )
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        t_ju, r_ju, s_ju = timed(spark, join_agg(fact.join(dim, "key")))
        out.append({"shape": "join unsalted (AQE skew off)", "sec": t_ju, **s_ju})

        salted_fact = fact.withColumn(
            "salt", F.pmod(F.hash("value"), F.lit(SALT_BUCKETS))
        )
        salted_dim = dim.crossJoin(
            spark.range(SALT_BUCKETS).select(F.col("id").alias("salt"))
        )
        t_js, r_js, s_js = timed(
            spark, join_agg(salted_fact.join(salted_dim, ["key", "salt"]))
        )
        out.append({"shape": "join salted", "sec": t_js, **s_js})

        # AQE only splits a partition that exceeds BOTH 5x the median AND
        # skewedPartitionThresholdInBytes (256 MB default — sized for real
        # clusters). The planted hot partition here is tens of MB, so the
        # demo lowers the byte floors to make the 5x-median rule decide,
        # exactly as a 100 TB deployment would leave the defaults.
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
        t_ja, r_ja, s_ja = timed(spark, join_agg(fact.join(dim, "key")))
        out.append({"shape": "join unsalted (AQE skew on)", "sec": t_ja, **s_ja})

        assert r_ju == r_js == r_ja, (r_ju, r_js, r_ja)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bcast)
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", prev_skew)
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", prev_thresh
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", prev_advis)
    return out


def render_section(rows: list[dict], n_rows: int) -> str:
    lines = [
        SECTION_HEADER,
        "",
        f"Generated by `python tools/skew_smoke.py` — {n_rows:,} rows, ONE",
        f"key = {HOT_SHARE_PCT}% of all rows (rest uniform over {COLD_KEYS:,} cold",
        "keys), per-row-unique values. Task p50/max come from the UI REST",
        "taskSummary of the heaviest stage of each run: a straggler shows",
        "as max >> p50; a flattened plan as max ~ p50. Salted results are",
        "asserted EQUAL to unsalted before anything is recorded.",
        "",
        "| shape | wall sec | p50 task ms | max task ms | max/p50 | tasks |",
        "|---|---|---|---|---|---|",
    ]
    for r in rows:
        ratio = (
            round(r["max_task_ms"] / max(r["p50_task_ms"], 1), 1)
            if r.get("max_task_ms")
            else "-"
        )
        lines.append(
            f"| {r['shape']} | {r['sec']} | {r.get('p50_task_ms', '-')} "
            f"| {r.get('max_task_ms', '-')} | {ratio} | {r.get('n_tasks', '-')} |"
        )
    lines += [
        "",
        "Reading (matches skew.py's two-defense docstring, now measured):",
        "",
        "- AGGREGATION skew has no AQE rescue (partition splitting is",
        "  join-only), and the unsalted heavy-state agg shows it: the hot",
        "  key's distinct set builds in ONE task (max/p50 ~20x). The",
        "  two-phase salt flattens it to ~2x at a faster wall — the salted",
        "  agg is the only defense and wins outright.",
        "- JOIN skew: AQE's runtime split is the first-choice defense (the",
        "  skew-on line: extra tasks appear, max ~ p50, fastest wall).",
        "  Salting still cuts the worst task vs the unprotected join and is",
        "  the portable fallback when AQE cannot apply, but it pays two",
        "  wider sorts here. Its residual max/p50 (~3-4x) is bucket-over-",
        f"  reducer collision: {SALT_BUCKETS} hot sub-keys hash onto 32",
        "  reducers, so some reducer draws 2-3 of them — at cluster scale B",
        "  is sized to the executor count and the residual vanishes.",
        "- Detection caveat measured along the way: AQE keys off COMPRESSED",
        "  map-output sizes; a constant-valued hot key compresses ~100x and",
        "  hid below the skew threshold until the fixture carried realistic",
        "  payload bytes (the sum(value) column). Size-based skew detection",
        "  can under-fire on low-entropy hot keys — the salted shapes have",
        "  no such blind spot.",
        "",
    ]
    return "\n".join(lines)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=40_000_000)
    ap.add_argument("--append", default=None, help="markdown file to update")
    args = ap.parse_args()

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "true")  # REST taskSummary source
        .config("spark.ui.showConsoleProgress", "false")
        # the unsalted straggler task holds the hot key's full distinct
        # set in one thread — give the single local JVM headroom for it
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .appName("skew-smoke")
        .getOrCreate()
    )
    apply_runtime_confs(spark)
    fact_path = build_fixture(spark, args.rows)
    # steady-state policy: one warm-up pass (JIT/codegen), then measure
    run(spark, fact_path)
    rows = run(spark, fact_path)
    for r in rows:
        print(r, flush=True)
    section = render_section(rows, args.rows)
    if args.append:
        with open(args.append) as fh:
            content = fh.read()
        if SECTION_HEADER in content:  # idempotent re-run: replace section
            content = content[: content.index(SECTION_HEADER)].rstrip() + "\n"
        with open(args.append, "w") as fh:
            fh.write(content.rstrip() + "\n\n" + section)
        print(f"section written to {args.append}")
    else:
        print(section)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
