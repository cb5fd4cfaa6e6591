"""Maintained-ANN-index growth probe (round 10): measure, not argue, how
per-batch SERVE cost scales as the index grows.

The streaming dedup path proved its per-batch cost FLAT as the index grows
(x3 corpus probe, round 9) because a banded equi-join touches only matched
buckets and bucket occupancy there is bounded by construction. The ANN
serve face is DIFFERENT and this probe documents it honestly: with a fixed
bucket space (LSH_BITS=6 -> 64 buckets/table), candidate pairs per query
grow LINEARLY with corpus size (occupancy = corpus/64 per table), so
per-batch serve time grows ~linearly with the ingested volume. That is not
a defect of the topology — it is the LSH recall/candidate trade at fixed
code length. The production levers at 100 TB, in the order a deployment
pulls them: more bits per code (each bit halves occupancy), more tables
with fewer probes, or the IVF path (similarity.py sim_ivf_*) whose nprobe
bounds candidates per query independent of corpus size.

Method: run the maintained-index topology over K files of constant
per-file volume (750 ingest + 250 query rows); the per-batch `batch_sec`
metric (writer-recorded wall) is printed per batch alongside the
cumulative index size. Expect batch_sec ~ a + b * index_rows; report the
fitted slope per 1k ingested vectors.

Usage: python tools/ann_growth_probe.py [--files 12] [--append SCALE_SMOKE.md]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from realtime_twitter_trends_analytics_spark.session import get_spark  # noqa: E402
from realtime_twitter_trends_analytics_spark.streaming.ann_stream import (  # noqa: E402
    run_streaming_ann_maintain,
)

INGEST_PER_FILE = 750  # override with --ingest-per-file
QUERY_PER_FILE = 250


def vec_of(i: int) -> list:
    return [
        ((i * 131 + d * 17 + (i * d) % 7) % 1000) / 1000.0 - 0.5 for d in range(64)
    ]


def build_source(
    src: str, files: int, ingest_per_file: int, first: int = 0
) -> None:
    os.makedirs(src, exist_ok=True)
    for f_idx in range(first, files):
        with open(f"{src}/b{f_idx:03d}.json", "w") as fh:
            for i in range(ingest_per_file):
                vid = f_idx * ingest_per_file + i
                fh.write(
                    json.dumps({"kind": "ingest", "id": vid, "embedding": vec_of(vid)})
                    + "\n"
                )
            for i in range(QUERY_PER_FILE):
                target = max(0, f_idx - 1) * ingest_per_file + i
                fh.write(
                    json.dumps(
                        {
                            "kind": "query",
                            "id": 10_000_000 + f_idx * QUERY_PER_FILE + i,
                            "embedding": vec_of(target),
                        }
                    )
                    + "\n"
                )


def serve_faces_probe(spark, args) -> int:
    """Both faces of the serve-side query dispatch at the SAME |Q| — the
    broadcast face ships |Q| x nprobe probe rows (each carrying the LUT +
    query vector) to every executor; the shuffle face exchanges probe and
    index rows on cell. Warm min-of-2 noop-sink walls (the fresh-plan
    rebuild per run matches per-trigger streaming reality), row equality
    asserted at every |Q|."""
    import time

    from pyspark.sql import functions as F  # noqa: F811

    from realtime_twitter_trends_analytics_spark.streaming.ivfpq_stream import (
        IVFPQ_SERVE_BCAST_MAX_Q,
        _serve_ivfpq_topk,
        build_ivfpq_model,
        encode_ivfpq_rows,
    )

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try:
        model = build_ivfpq_model(spark, "/root/testdata/sf0.001")
        if args.pq8:
            # PRODUCTION 8-bit PQ shape (16 blocks x 256 codes = 4096
            # entries > PQ_LITERAL_CEILING): geometry derives from the
            # codebook rows, so the serve LUT takes the RELATION face and
            # the encode the broadcast equi-join — this arm times the
            # 8-bit serve volume the round-14 dispatch contemplates
            # (deterministic synthetic codewords; recall is not the
            # subject here, the plan shape and wall are)
            sub = 4  # 64-dim vectors / 16 blocks
            model = {
                **model,
                "codebook": [
                    [b, c, [((b * 31 + c * 7 + d * 3) % 201) - 100 for d in range(sub)]]
                    for b in range(16)
                    for c in range(256)
                ],
            }
        n_entries = len(model["codebook"])
        corpus = spark.createDataFrame(
            [(i, vec_of(i)) for i in range(args.serve_n)],
            "cand_id long, embedding array<double>",
        )
        idx = encode_ivfpq_rows(corpus, model).localCheckpoint()
        lines = [
            "",
            f"### IVF-PQ serve query-face dispatch: broadcast vs shuffle "
            f"(round 14; index {args.serve_n} rows, "
            f"{'8-BIT model (16x256 = 4096 entries -> RELATION LUT face)' if args.pq8 else 'gate model'} "
            f"[{n_entries} codebook entries], warm "
            f"min-of-2 noop-sink; dispatch bound "
            f"IVFPQ_SERVE_BCAST_MAX_Q={IVFPQ_SERVE_BCAST_MAX_Q})",
            "",
            "| \\|Q\\| | broadcast face | shuffle face | rows equal |",
            "|---|---|---|---|",
        ]
        for qi, n_q in enumerate(args.serve_qs):
            queries = spark.createDataFrame(
                [(1_000_000 + i, vec_of(i % args.serve_n)) for i in range(n_q)],
                "query_id long, embedding array<double>",
            ).localCheckpoint()

            def wall(bcast: bool) -> float:
                best = float("inf")
                for _ in range(2):
                    t0 = time.time()
                    _serve_ivfpq_topk(
                        idx, queries, model, 10, False, broadcast_queries=bcast
                    ).write.format("noop").mode("overwrite").save()
                    best = min(best, time.time() - t0)
                return best

            t_b, t_s = wall(True), wall(False)
            # row equality is pinned at the smallest |Q| (and in
            # tests/test_ivfpq_maintain.py at every face combination);
            # re-collecting 10*|Q| rows twice per larger point would
            # dominate the probe's own wall without adding signal
            if qi == 0:
                eq = sorted(
                    map(
                        tuple,
                        _serve_ivfpq_topk(
                            idx, queries, model, 10, False,
                            broadcast_queries=True,
                        ).collect(),
                    )
                ) == sorted(
                    map(
                        tuple,
                        _serve_ivfpq_topk(
                            idx, queries, model, 10, False,
                            broadcast_queries=False,
                        ).collect(),
                    )
                )
                eq_s = "yes" if eq else "NO — BUG"
            else:
                eq_s = "(pinned at smallest |Q|)"
            lines.append(f"| {n_q} | {t_b:.2f}s | {t_s:.2f}s | {eq_s} |")
            print(lines[-1])
        report = "\n".join(lines) + "\n"
        if args.append:
            with open(args.append, "a") as fh:
                fh.write(report)
            print(f"appended to {args.append}")
        return 0
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        spark.stop()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=12)
    ap.add_argument("--ingest-per-file", type=int, default=INGEST_PER_FILE)
    ap.add_argument("--append", default=None)
    ap.add_argument(
        "--compact-at",
        type=int,
        default=None,
        help="drain this many files, compact+prune the index (base+delta "
        "serving), then continue with the remaining files through the same "
        "checkpoint — the compact-then-continue probe (round 11)",
    )
    ap.add_argument(
        "--rebucket-bits",
        type=int,
        default=None,
        help="with --compact-at: WIDEN the LSH code to this many bits "
        "during the boundary compaction (rebucket_ann_index) — the 'more "
        "bits per code' lever; post-boundary batches serve against the "
        "wider bucket space and the per-batch wall slope resets",
    )
    ap.add_argument(
        "--ivfpq",
        action="store_true",
        help="probe the maintained IVF-PQ topology instead of sign-LSH "
        "(round 12): per-batch serve cost vs index growth; with "
        "--compact-at, the boundary compaction RETRAINS the model at "
        "k_for_corpus(N) — the derived-K occupancy reset, the IVF-PQ "
        "analogue of --rebucket-bits",
    )
    ap.add_argument(
        "--serve-faces",
        action="store_true",
        help="time the IVF-PQ serve dispatch's BOTH query faces (round 14, "
        "VERDICT r13 item 4): broadcast(probe) join vs plain shuffle "
        "equi-join on cell, same |Q|, warm min-of-2 noop-sink walls + row "
        "equality — the shuffle fallback past IVFPQ_SERVE_BCAST_MAX_Q "
        "becomes a measured fact, the house style for every dispatch",
    )
    ap.add_argument(
        "--serve-n", type=int, default=8000,
        help="--serve-faces: index size (encoded vectors)",
    )
    ap.add_argument(
        "--serve-qs", type=int, nargs="*", default=[500, 2000, 6000],
        help="--serve-faces: query-batch sizes to time at",
    )
    ap.add_argument(
        "--pq8",
        action="store_true",
        help="--serve-faces: swap in the PRODUCTION 8-bit PQ codebook "
        "shape (16 blocks x 256 codes = 4096 entries, past "
        "PQ_LITERAL_CEILING) so the serve runs the RELATION LUT face and "
        "the encode the broadcast equi-join — times the 8-bit serve "
        "volume the round-14 PQ dispatch contemplates (round 14, second "
        "pass)",
    )
    args = ap.parse_args()

    spark = get_spark("ann-growth-probe")
    if args.serve_faces:
        return serve_faces_probe(spark, args)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    work = tempfile.mkdtemp(prefix="ann_growth_")
    MODEL_SF = "/root/testdata/sf0.1"

    def run_topology(**kw):
        if args.ivfpq:
            from realtime_twitter_trends_analytics_spark.streaming.ivfpq_stream import (
                run_streaming_ivfpq_maintain,
            )

            return run_streaming_ivfpq_maintain(
                spark, f"{work}/src", work, MODEL_SF, **kw
            )
        return run_streaming_ann_maintain(spark, f"{work}/src", work, **kw)

    try:
        metrics: list[dict] = []
        compact_stats = None
        if args.compact_at is not None:
            build_source(f"{work}/src", args.compact_at, args.ingest_per_file)
            ok = run_topology(
                max_files_per_trigger=1, metrics=metrics, timeout_sec=1200
            )
            if not ok:
                print("TIMEOUT in phase 1 — no numbers recorded")
                return 1
            if args.ivfpq:
                from realtime_twitter_trends_analytics_spark.streaming.ann_stream import (
                    prune_absorbed_epochs,
                )
                from realtime_twitter_trends_analytics_spark.streaming.ivfpq_stream import (
                    compact_ivfpq_index,
                )

                compact_stats = compact_ivfpq_index(
                    spark, f"{work}/ivfpq_index", f"{work}/ivfpq_compact",
                    f"{work}/ivfpq_model", retrain=True,
                )
                prune_absorbed_epochs(f"{work}/ivfpq_index", f"{work}/ivfpq_compact")
            elif args.rebucket_bits is not None:
                from realtime_twitter_trends_analytics_spark.streaming.ann_stream import (
                    prune_absorbed_epochs,
                    rebucket_ann_index,
                )

                compact_stats = rebucket_ann_index(
                    spark, f"{work}/ann_index", f"{work}/ann_compact",
                    args.rebucket_bits,
                )
                prune_absorbed_epochs(f"{work}/ann_index", f"{work}/ann_compact")
            else:
                from realtime_twitter_trends_analytics_spark.streaming.ann_stream import (
                    compact_ann_index,
                    prune_absorbed_epochs,
                )

                compact_stats = compact_ann_index(
                    spark, f"{work}/ann_index", f"{work}/ann_compact"
                )
                prune_absorbed_epochs(f"{work}/ann_index", f"{work}/ann_compact")
            build_source(
                f"{work}/src", args.files, args.ingest_per_file,
                first=args.compact_at,
            )
        else:
            build_source(f"{work}/src", args.files, args.ingest_per_file)
        ok = run_topology(
            max_files_per_trigger=1, metrics=metrics, timeout_sec=1200
        )
        if not ok:
            print("TIMEOUT — no numbers recorded")
            return 1
        topo = "IVF-PQ" if args.ivfpq else "ANN"
        title = (
            f"### Maintained-{topo} serve cost vs index growth "
            f"({'round 12' if args.ivfpq else 'round 10'}, "
            f"{args.ingest_per_file} ingests/batch)"
        )
        if compact_stats is not None:
            verb = (
                f"retrained at K=k_for_corpus (model generation "
                f"{compact_stats.get('model_generation')}, recall "
                f"{compact_stats.get('recall')})"
                if args.ivfpq
                else (
                    f"rebucketed to {args.rebucket_bits} bits"
                    if args.rebucket_bits is not None
                    else "compacted"
                )
            )
            title = (
                f"### Maintained-{topo} compact-then-continue probe "
                f"({'round 12' if args.ivfpq else 'round 11'}, "
                f"{args.ingest_per_file} ingests/batch; {verb}+pruned "
                f"after batch {args.compact_at - 1}: "
                f"{compact_stats['files_before']} epoch files -> "
                f"{compact_stats['files_after']} base files, "
                f"{compact_stats['rows']} rows)"
            )
        lines = ["", title, ""]
        lines.append("| batch | index rows before serve | queries | batch_sec |")
        lines.append("|---|---|---|---|")
        xs, ys = [], []
        for m in sorted(metrics, key=lambda m: m["batch_id"]):
            idx_rows = (m["batch_id"] + 1) * args.ingest_per_file  # incl. own batch
            mark = (
                " (first post-compaction)"
                if compact_stats is not None and m["batch_id"] == args.compact_at
                else ""
            )
            lines.append(
                f"| {m['batch_id']}{mark} | {idx_rows} | {m['n_queries']} "
                f"| {m['batch_sec']} |"
            )
            if m["batch_id"] >= 1:  # batch 0 pays checkpoint/codegen setup
                xs.append(idx_rows)
                ys.append(m["batch_sec"])
        n = len(xs)
        mx, my = sum(xs) / n, sum(ys) / n
        slope = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
            (x - mx) ** 2 for x in xs
        )
        lines.append("")
        if args.ivfpq:
            lines.append(
                f"Fitted slope {slope * 1000:+.3f} s per 1k ingested vectors "
                f"(batches 1..{args.files - 1}; batch 0 excluded — it pays "
                "checkpoint + codegen setup). Interpretation: candidates per "
                "query = nprobe x occupancy, and occupancy = corpus/K — at a "
                "FIXED model the arithmetic term grows linearly with the "
                "index, exactly like the LSH face at fixed bits. The lever "
                "is the retrain-at-compaction (K = k_for_corpus(N), "
                "occupancy back to ~TARGET_CELL_SIZE): post-boundary batches "
                "serve against re-sized cells and the slope resets — the "
                "derived-K defense exercised through the real maintained "
                "topology, not just the batch faces."
            )
        else:
            lines.append(
                f"Fitted slope {slope * 1000:+.3f} s per 1k ingested vectors "
                f"(batches 1..{args.files - 1}; batch 0 excluded — it pays "
                "checkpoint + codegen setup). Interpretation: candidates per "
                "query grow linearly with the corpus at fixed LSH_BITS (bucket "
                "occupancy = corpus/64 per table), so the ARITHMETIC term is "
                "linear in index size — but per-trigger fixed cost (scheduling, "
                "plan analysis, state commits) dominates until occupancy is "
                "large, so a ~zero/negative slope at small volume means the "
                "fixed term is masking the linear one (JIT still warming), not "
                "that serve is free. Production levers when the linear term "
                "surfaces: more bits per code, more tables with fewer probes, "
                "or the IVF path whose nprobe caps candidates per query (see "
                "module docstring)."
            )
        report = "\n".join(lines) + "\n"
        print(report)
        if args.append:
            with open(args.append, "a") as fh:
                fh.write(report)
            print(f"appended to {args.append}")
        return 0
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
