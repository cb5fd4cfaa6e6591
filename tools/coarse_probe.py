"""Literal-vs-relation coarse-quantizer crossover probe (round 13, VERDICT
r12 item 1): measure BOTH faces of ml.nearest_centroid across K, through
and past K_LITERAL_CEILING, and record where each face lives.

What it shows:
- below the ceiling the literal face (centroids baked into the plan, zero
  exchanges) wins on per-call latency BUT pays O(K*D) expression size —
  plan/codegen cost grows with K until Catalyst stops planning it;
- the relation face (crossJoin(broadcast(K-row relation)) + min(struct)
  keyed argmin) pays one broadcast + one keyed agg, with cost ~flat in K
  on the plan side and N*K on the compute side — the SAME N*K distance
  work the literal face does, just expressed as data instead of plan;
- past the ceiling only the relation face runs (the literal face refuses
  by design — the probe records the refusal), so the dispatch point IS
  the crossover.

Method: synthetic (vec_id, qe) corpus (N x 64-dim BIGINT, deterministic),
warm min-of-2 noop-sink walls per (K, face); exact row-level equality of
the two faces is asserted at every K where both run (the same pin as
tests/test_coarse_relation.py, re-checked at probe volumes).

Usage: python tools/coarse_probe.py [--n 2000] [--ks 8 512 2048 4096 8192 16384]
                                    [--append SCALE_SMOKE.md]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from realtime_twitter_trends_analytics_spark.operators.ml import (  # noqa: E402
    EMB_DIM,
    K_LITERAL_CEILING,
    nearest_centroid,
)
from realtime_twitter_trends_analytics_spark.session import get_spark  # noqa: E402


def _cents(k: int) -> list:
    return [
        (cl, [((cl * 131 + d * 17 + (cl * d) % 13) % 16001) - 8000 for d in range(EMB_DIM)])
        for cl in range(k)
    ]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2000)
    ap.add_argument(
        "--ks", type=int, nargs="*", default=[8, 512, 2048, 4096, 8192, 16384]
    )
    ap.add_argument("--append", default=None)
    ap.add_argument(
        "--shard-k", type=int, default=None,
        help="also time the SHARDED relation regime (round 14, VERDICT r13 "
        "item 5): at this K, lower BROADCAST_CENTROID_BYTES to force "
        "--shards shards and time the per-shard-broadcast + final keyed "
        "agg face against the single-broadcast face at the same K, with "
        "row equality — the ceil(K/K_shard) cost model measured, not argued",
    )
    ap.add_argument("--shards", type=int, default=6)
    ap.add_argument(
        "--two-level-ks", type=int, nargs="*", default=None,
        help="also probe the TWO-LEVEL quantizer (round 14 — the K~1e6 "
        "remedy SCALE.md names): at each K, time the flat relation face "
        "vs nearest_centroid_two_level at p=1/p=2 (S=ceil(sqrt(K)) "
        "super-cells), measure assignment agreement with the flat argmin, "
        "and pin the EXACT arm (p=S) row-equal — compute drops from "
        "O(N*K) to O(N*(S + p*K/S))",
    )
    args = ap.parse_args()

    spark = get_spark("coarse-probe")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    vecs = spark.createDataFrame(
        [
            (i, [((i * 29 + d * 7 + (i * d) % 11) % 16001) - 8000 for d in range(EMB_DIM)])
            for i in range(args.n)
        ],
        "vec_id long, qe array<bigint>",
    ).localCheckpoint()

    def wall(df) -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        return best

    lines = [
        "",
        f"### Coarse-quantizer crossover: literal vs broadcast-join relation "
        f"(round 13; N={args.n} x {EMB_DIM}-dim, warm min-of-2 noop-sink; "
        f"K_LITERAL_CEILING={K_LITERAL_CEILING})",
        "",
        "| K | literal face | relation face | broadcast payload | faces equal |",
        "|---|---|---|---|---|",
    ]
    try:
        for k in args.ks:
            cents = _cents(k)
            mb = k * (EMB_DIM + 1) * 8 / 1e6
            rel = nearest_centroid(vecs, cents, ["vec_id"], force="relation")
            t_rel = wall(rel)
            if k <= K_LITERAL_CEILING:
                lit = nearest_centroid(vecs, cents, ["vec_id"], force="literal")
                t_lit = wall(lit)
                flat = lambda df: sorted(  # noqa: E731
                    (r["vec_id"], r["m"]["d2"], r["m"]["cl"]) for r in df.collect()
                )
                eq = "yes" if flat(lit) == flat(rel) else "NO — BUG"
                lines.append(
                    f"| {k} | {t_lit:.2f}s | {t_rel:.2f}s | {mb:.1f} MB | {eq} |"
                )
            else:
                try:
                    nearest_centroid(vecs, cents, ["vec_id"], force="literal")
                    refusal = "DID NOT REFUSE — BUG"
                except ValueError:
                    refusal = "refused (by design)"
                lines.append(
                    f"| {k} | {refusal} | {t_rel:.2f}s | {mb:.1f} MB | n/a (relation only) |"
                )
            print(lines[-1])
        if args.shard_k is not None:
            import realtime_twitter_trends_analytics_spark.operators.ml as ml_mod

            k = args.shard_k
            cents = _cents(k)
            bytes_total = k * (EMB_DIM + 1) * 8
            un = nearest_centroid(vecs, cents, ["vec_id"], force="relation")
            t_un = wall(un)
            rows_un = sorted(
                (r["vec_id"], r["m"]["d2"], r["m"]["cl"]) for r in un.collect()
            )
            saved = ml_mod.BROADCAST_CENTROID_BYTES
            try:
                ml_mod.BROADCAST_CENTROID_BYTES = max(
                    1, bytes_total // args.shards
                )
                n_sh = len(ml_mod._centroid_shards(cents))
                sh = nearest_centroid(vecs, cents, ["vec_id"], force="relation")
                t_sh = wall(sh)
                rows_sh = sorted(
                    (r["vec_id"], r["m"]["d2"], r["m"]["cl"])
                    for r in sh.collect()
                )
            finally:
                ml_mod.BROADCAST_CENTROID_BYTES = saved
            eq = "yes" if rows_sh == rows_un else "NO — BUG"
            lines += [
                "",
                f"Sharded regime at K={k} (forced budget "
                f"{bytes_total // args.shards} B -> {n_sh} shards of the "
                f"{bytes_total / 1e6:.1f} MB relation): single-broadcast "
                f"{t_un:.2f}s vs sharded {t_sh:.2f}s, rows equal: {eq}. "
                f"Cost model: {n_sh} broadcasts + per-shard keyed argmin "
                f"over the checkpointed input + one final keyed agg over "
                f"{n_sh} x N rows.",
            ]
            print(lines[-1])
        if args.two_level_ks:
            from realtime_twitter_trends_analytics_spark.operators.ml import (
                nearest_centroid_two_level,
                s_for_k,
                two_level_rows,
            )

            lines += [
                "",
                f"### Two-level quantizer vs flat relation face (round 14; "
                f"N={args.n} x {EMB_DIM}-dim, warm min-of-2 noop-sink; "
                f"S=ceil(sqrt(K)) super-cells, SUPER_ITERS Lloyd rounds over "
                f"the K centroid ROWS — distance work N*(S + p*K/S) vs N*K)",
                "",
                "| K | S | train | flat relation | two-level p=1 | p=2 | "
                "agree p=1 | p=2 | exact arm (p=S) |",
                "|---|---|---|---|---|---|---|---|---|",
            ]
            for k in args.two_level_ks:
                cents = _cents(k)
                t0 = time.time()
                plan = two_level_rows(spark, cents)
                t_train = time.time() - t0
                flat = nearest_centroid(vecs, cents, ["vec_id"], force="relation")
                t_flat = wall(flat)
                flat_cl = {r["vec_id"]: r["m"]["cl"] for r in flat.collect()}
                times, agree = {}, {}
                for p in (1, 2):
                    two = nearest_centroid_two_level(
                        vecs, cents, ["vec_id"], probes=p, plan=plan
                    )
                    times[p] = wall(two)
                    got = {r["vec_id"]: r["m"]["cl"] for r in two.collect()}
                    agree[p] = sum(
                        1 for i, cl in got.items() if flat_cl[i] == cl
                    ) / len(flat_cl)
                exact = nearest_centroid_two_level(
                    vecs, cents, ["vec_id"], probes=len(plan[0]), plan=plan
                )
                ex_rows = sorted(
                    (r["vec_id"], r["m"]["d2"], r["m"]["cl"])
                    for r in exact.collect()
                )
                fl_rows = sorted(
                    (i, None, cl) for i, cl in flat_cl.items()
                )
                ex_eq = (
                    "equal"
                    if [(i, cl) for i, _, cl in ex_rows]
                    == [(i, cl) for i, _, cl in fl_rows]
                    else "NO — BUG"
                )
                lines.append(
                    f"| {k} | {s_for_k(k)} | {t_train:.1f}s | {t_flat:.2f}s "
                    f"| {times[1]:.2f}s | {times[2]:.2f}s | {agree[1]:.3f} "
                    f"| {agree[2]:.3f} | {ex_eq} |"
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
