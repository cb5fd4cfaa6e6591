"""Parallelism probe at ~sf0.3 (r15, VERDICT r14 item 8).

The r14 scaling block showed every sampled query running as fast or
faster at 8 cores than 32 at sf0.1 — the bench SF is scheduling-bound, so
local core-scaling measurements say nothing about the 100 TB parallelism
story. This probe times the heaviest scan-bound queries on the ~3x
synthetic fixture tools/scale_probe.py builds (disjoint shards of sf0.1,
schema-preserving) at BOTH core counts, isolated fresh-session per run,
warm min-of-2 noop-sink — the committed sec@8 / sec@32 table is the
measured datum for "does the heavy tier actually parallelize once there
is data to parallelize".

Expected: ratios well above 1 on scan/compute-bound lines (a perfectly
parallel query reads 4.0); ratios ~1 mark lines that are still
overhead-bound even at 3x volume — round-16 targets.

Usage:
  python tools/par_probe.py [--queries name ...] [--out PAR_PROBE_r15.txt]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DEFAULT_QUERIES = [
    # the heavy map/scan tier (fan_out_small sites and their consumers)
    "staging:tokenized_docs",
    "staging:doc_shingles",
    "staging:dsir_instances",
    "textstats_winnowing",
    "dedup_dup_spans",
    "corpus_pipeline_v4",
    "corpus_pipeline_neardup",
    "staging:kcore_edges",
    "percentiles",
    "stats_aggregates",
    "dedup_embedding_cosine",
    "market_basket_rules",
]

_RUNNER = r"""
import json, sys, time
sf, cpus, names = sys.argv[1], sys.argv[2], sys.argv[3:]
from pyspark.sql import SparkSession
spark = (
    SparkSession.builder.master(f"local[{cpus}]")
    .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "16g")
    .appName("par_probe")
    .getOrCreate()
)
sys.path.insert(0, %(repo)r)
from realtime_twitter_trends_analytics_spark.registry import (
    all_queries, all_bench_only, all_staging, clear_staging_memos,
)
from realtime_twitter_trends_analytics_spark.session import apply_runtime_confs
apply_runtime_confs(spark)
qmap = {**all_queries(), **all_bench_only()}
qmap.update({f"staging:{k}": v for k, v in all_staging().items()})
out = {}
for name in names:
    fn = qmap.get(name)
    if fn is None:
        out[name] = None
        continue
    staging = name.startswith("staging:")
    best = None
    for i in range(3):  # 1 warm + 2 timed
        if staging:
            clear_staging_memos()
        t0 = time.time()
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        if i and (best is None or dt < best):
            best = dt
        spark.catalog.clearCache()
    out[name] = round(best, 3)
print("PAR_PROBE_JSON:" + json.dumps(out))
"""


def run(cpus: str, sf_dir: str, names: "list[str]") -> dict:
    proc = subprocess.run(
        [sys.executable, "-c", _RUNNER % {"repo": REPO}, sf_dir, cpus, *names],
        capture_output=True,
        text=True,
        env={**os.environ, "PYTHONPATH": REPO},
    )
    for line in proc.stdout.splitlines():
        if line.startswith("PAR_PROBE_JSON:"):
            return json.loads(line[len("PAR_PROBE_JSON:"):])
    raise SystemExit(f"runner failed at {cpus} cores:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", nargs="*", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--rounds", type=int, default=2,
                    help="interleaved (8c, 32c) session pairs; min kept")
    args = ap.parse_args()
    names = args.queries or DEFAULT_QUERIES

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from scale_probe import build_fixture

    sf_dir = build_fixture()
    mins: dict[tuple[str, str], float] = {}
    # interleave 8c/32c sessions so host phases cancel (the r14 lesson)
    for rnd in range(args.rounds):
        for cpus in ("8", "32"):
            got = run(cpus, sf_dir, names)
            for q, sec in got.items():
                if sec is None:
                    continue
                key = (cpus, q)
                mins[key] = min(mins.get(key, float("inf")), sec)
            print(f"  round {rnd + 1}/{args.rounds} {cpus}c done", file=sys.stderr)

    lines = [
        f"## parallelism probe at {sf_dir} (tools/par_probe.py): warm "
        f"min-of-2 noop-sink per fresh local[N] session, interleaved "
        f"x{args.rounds}; ratio = sec@8 / sec@32 (scan-bound ~4 expected, "
        f"~1 = overhead-bound)",
        f"{'query':34s} {'sec@8':>8s} {'sec@32':>8s} {'ratio':>7s}",
    ]
    for q in names:
        s8, s32 = mins.get(("8", q)), mins.get(("32", q))
        if s8 is None or s32 is None:
            lines.append(f"{q:34s} {'-':>8s} {'-':>8s} {'-':>7s}")
            continue
        lines.append(f"{q:34s} {s8:8.3f} {s32:8.3f} {s8 / s32:7.2f}")
    body = "\n".join(lines) + "\n"
    print(body)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(body)
    return 0


if __name__ == "__main__":
    sys.exit(main())
