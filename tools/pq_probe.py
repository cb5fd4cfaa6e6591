"""Literal-vs-relation PQ encode crossover probe (round 14, ADVICE r13
item 3 — the PQ twin of tools/coarse_probe.py).

What it shows, and how it differs from the centroid wall:
- the literal face (pq_codes_sql: one aggregate/zip_with subexpression per
  (block, code) baked into the plan) has NO hard refusal up to 65k entries
  — but its PLAN cost (parse + optimize + codegen) grows linearly with the
  entry count and is paid PER CALL: per micro-batch in the streaming
  ingest/serve hot paths. This probe therefore rebuilds the DataFrame per
  timed run (fresh plan), matching per-trigger reality.
- the relation face (pq_encode: broadcast equi-join on block + min(struct)
  keyed argmin, the batch _pq_assign shape) plans in constant time and
  pays one broadcast + one keyed exchange of N*blocks rows.
- past PQ_LITERAL_CEILING the literal face refuses by design (the probe
  records the refusal) — the ceiling is placed at the measured point where
  the literal face's per-call plan cost overtakes the relation face's
  whole wall.

Usage: python tools/pq_probe.py [--n 2000] [--blocks 16]
           [--codes 8 32 128 256 512 1024] [--append SCALE_SMOKE.md]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import realtime_twitter_trends_analytics_spark.operators.ml as ml  # noqa: E402
from realtime_twitter_trends_analytics_spark.session import get_spark  # noqa: E402

SUB = 8  # sub_dim per block (the gate geometry)


def _codebook(n_blocks: int, n_codes: int) -> list:
    return [
        (b, c, [((b * 31 + c * 7 + d * 3) % 201) - 100 for d in range(SUB)])
        for b in range(n_blocks)
        for c in range(n_codes)
    ]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2000)
    ap.add_argument("--blocks", type=int, default=16)
    ap.add_argument(
        "--codes", type=int, nargs="*", default=[8, 32, 128, 256, 512, 1024]
    )
    ap.add_argument("--append", default=None)
    args = ap.parse_args()

    spark = get_spark("pq-probe")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    dim = args.blocks * SUB
    vecs = spark.createDataFrame(
        [
            (i, [((i * 29 + d * 7 + (i * d) % 11) % 201) - 100 for d in range(dim)])
            for i in range(args.n)
        ],
        "vec_id long, qe array<bigint>",
    ).localCheckpoint()

    def wall(build) -> float:
        # fresh DataFrame per run: the literal face's cost is plan-side and
        # paid per call (per micro-batch in streaming), so reusing one
        # analyzed plan would hide exactly the cost being measured
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            build().write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        return best

    lines = [
        "",
        f"### PQ encode crossover: literal expression vs broadcast codebook "
        f"relation (round 14; N={args.n} x {dim}-dim, {args.blocks} blocks x "
        f"{SUB}-dim subvectors, warm min-of-2 noop-sink, FRESH plan per run; "
        f"PQ_LITERAL_CEILING={ml.PQ_LITERAL_CEILING} entries)",
        "",
        "| entries (blocks x K) | literal face | relation face | faces equal |",
        "|---|---|---|---|",
    ]

    def flat(df):
        return sorted(
            (r["vec_id"], tuple(r["codes"])) for r in df.collect()
        )

    try:
        for n_codes in args.codes:
            cb = _codebook(args.blocks, n_codes)
            entries = len(cb)
            t_rel = wall(
                lambda: ml.pq_encode(vecs, cb, ["vec_id"], force="relation")
            )
            if entries <= ml.PQ_LITERAL_CEILING:
                t_lit = wall(
                    lambda: ml.pq_encode(vecs, cb, ["vec_id"], force="literal")
                )
                eq = (
                    "yes"
                    if flat(ml.pq_encode(vecs, cb, ["vec_id"], force="literal"))
                    == flat(ml.pq_encode(vecs, cb, ["vec_id"], force="relation"))
                    else "NO — BUG"
                )
                lines.append(
                    f"| {entries} ({args.blocks}x{n_codes}) | {t_lit:.2f}s "
                    f"| {t_rel:.2f}s | {eq} |"
                )
            else:
                try:
                    ml.pq_encode(vecs, cb, ["vec_id"], force="literal")
                    refusal = "DID NOT REFUSE — BUG"
                except ValueError:
                    refusal = "refused (by design)"
                lines.append(
                    f"| {entries} ({args.blocks}x{n_codes}) | {refusal} "
                    f"| {t_rel:.2f}s | n/a (relation only) |"
                )
            print(lines[-1])
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    report = "\n".join(lines) + "\n"
    if args.append:
        with open(args.append, "a") as fh:
            fh.write(report)
        print(f"appended to {args.append}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
