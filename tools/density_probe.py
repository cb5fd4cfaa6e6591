"""Density-defense probe (round 11, VERDICT r10 item 2): MEASURE the
raised-K defense for the cell-blocked family instead of naming it.

The ~sf0.3 scale probe surfaced two density-coupled walls at FIXED
constants: dedup_semantic_cells 2.2 -> 24.4 s (3x data, ~11x wall) and
sim_pq_adc_ann 1.7 -> 16.2 s. The skew study set the precedent: plant the
failure mode AND measure the defense. This probe does that for cell
density:

- dedup_semantic_cells: with K_CLUSTERS fixed, per-cell occupancy grows
  linearly with N and the within-cell pair term O(sum cell^2)
  quadratically. The defense is THE rule in ml.k_for_corpus
  (K ~= N / TARGET_CELL_SIZE, calibrated to reproduce the gate constant at
  the bench SF): occupancy pinned at ~TARGET_CELL_SIZE, pair term returns
  to ~linear. Both arms run here, warm, min-of-2, with the candidate-pair
  volume computed from the report's own cell sizes — the quadratic term
  and its collapse are printed, not asserted from theory.
- sim_pq_adc_ann: DECOMPOSED rather than defended — the ADC candidate set
  is |Q| x N x PQ_BLOCKS (every (block,code) bucket holds exactly |Q| LUT
  rows), i.e. LINEAR in N at fixed query count; the r10 probe's 16.2 s was
  cold PQ/k-means training + first-plan codegen riding on the query's
  wall, not a density term. This probe times training separately and
  reports the warm query wall at both volumes so the linear shape is on
  the record. (The per-query ADC rank over all N candidates IS the
  at-1B-vectors concern; the corpus-independent path is IVF — the nprobe
  levers documented in SCALE.md.)

Volumes: x1 (sf0.1, 2000 vectors), x3 (the scale-probe fixture), and a
DENSE x10 embeddings-only fixture (20k vectors) — at x3 the pair term is
still dwarfed by per-query fixed cost (the ANN growth probe's lesson), so
the x10 layer exists to make the quadratic term, and its collapse under
derived K, visible in WALL SECONDS and not only in the exact
candidate-pair counts.

Usage:
  python tools/density_probe.py [--append SCALE_SMOKE.md] [--runs 2]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASE = "/root/testdata/sf0.1"
DENSE = "/tmp/density_probe/x10"
DENSE_COPIES = 10


def build_dense_fixture() -> str:
    """x10 embeddings-only fixture: every sf0.1 vector replicated with
    offset vec_ids and a tiny deterministic per-copy perturbation (exact
    duplicate vectors would make every copy-set a clique at any threshold;
    the perturbation keeps the density realistic while cell populations
    grow exactly DENSE_COPIES x)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = f"{DENSE}/embeddings.parquet"
    if os.path.exists(out):
        return DENSE
    os.makedirs(DENSE, exist_ok=True)
    tab = pq.read_table(f"{BASE}/embeddings.parquet")
    n = tab.num_rows
    vec_ids = tab["vec_id"].to_pylist()
    embs = tab["embedding"].to_pylist()
    labels = tab["label"].to_pylist()
    ids_out, emb_out, lab_out = [], [], []
    for c in range(DENSE_COPIES):
        for i in range(n):
            ids_out.append(vec_ids[i] + c * n)
            if c == 0:
                emb_out.append(embs[i])
            else:
                emb_out.append(
                    [
                        float(v) + ((c * 31 + d) % 7 - 3) * 1e-3
                        for d, v in enumerate(embs[i])
                    ]
                )
            lab_out.append(labels[i])
    sch = tab.schema
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(ids_out, type=sch.field("vec_id").type),
                "embedding": pa.array(emb_out, type=sch.field("embedding").type),
                "label": pa.array(lab_out, type=sch.field("label").type),
            }
        ),
        out,
    )
    return DENSE


def wall(df, runs: int) -> float:
    """Warm min-of-N wall of FULLY computing df — noop write, not count():
    count() on the report's final left join lets Catalyst eliminate the
    join against the aggregate's unique keys and skip the entire pair
    subtree (measured: 25M-pair scans 'completing' in 0.1 s)."""
    best = float("inf")
    for _ in range(runs):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return best


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--append", default=None)
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    from scale_probe import build_fixture

    fx = build_fixture()

    from realtime_twitter_trends_analytics_spark.operators import ml
    from realtime_twitter_trends_analytics_spark.operators.similarity import (
        _semantic_cells_report,
        ivfpq_observed,
        sim_pq_adc_ann,
    )
    from realtime_twitter_trends_analytics_spark.session import get_spark
    from realtime_twitter_trends_analytics_spark.sources.loaders import load_table

    spark = get_spark("density-probe")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try:
        dense = build_dense_fixture()
        rows_out = []
        sem = {}
        for tag, sf in [("x1", BASE), ("x3", fx), ("x10", dense)]:
            n = load_table(spark, sf, "embeddings").count()
            k_default = ml.K_CLUSTERS
            k_derived = ml.k_for_corpus(n)

            arms = [("fixed K", k_default)]
            if k_derived != k_default:
                arms.append(("derived K", k_derived))
            for arm, k in arms:
                # pre-pay training so the recorded wall is the OPERATOR
                t0 = time.time()
                ml.kmeans_centroid_rows(spark, sf, k)
                t_train = time.time() - t0
                rep = _semantic_cells_report(spark, sf, k if arm != "fixed K" else None)
                w = wall(rep, args.runs)
                cells = rep.collect()
                cand = sum(r["n_vectors"] * (r["n_vectors"] - 1) // 2 for r in cells)
                occ_max = max(r["n_vectors"] for r in cells)
                sem[(tag, arm)] = (w, cand)
                rows_out.append(
                    f"| dedup_semantic_cells | {tag} | {arm} (K={k}) | {n} | "
                    f"{cand} | {occ_max} | {t_train:.2f} | {w:.2f} |"
                )
            # sanity: at the bench SF the rule reproduces the gate constant
            if sf == BASE:
                assert k_derived == k_default, (k_derived, k_default)

            t0 = time.time()
            ml.pq_trained(spark, sf)
            t_train = time.time() - t0
            w = wall(sim_pq_adc_ann(spark, sf), args.runs)
            sem[(tag, "pq")] = (w, n * 10 * 8)
            rows_out.append(
                f"| sim_pq_adc_ann | {tag} | n/a (linear by shape) | {n} | "
                f"{n * 10 * 8} | n/a | {t_train:.2f} | {w:.2f} |"
            )
            # IVF-PQ: candidates per query ~ nprobe x occupancy — fixed K
            # degrades toward the flat scan as occupancy grows; derived K
            # pins candidates at nprobe x TARGET_CELL_SIZE. Candidate rows
            # are COUNTED (round 12, VERDICT r11 item 1): an Observation on
            # the ADC aggregate's input rides the timed job itself, so the
            # column is the measured fact, not the nprobe*N/K estimate.
            for arm, k in arms:
                t0 = time.time()
                ml.kmeans_centroid_rows(spark, sf, k)
                t_train = time.time() - t0  # memo-warm after the cells arms
                df, obs = ivfpq_observed(
                    spark, sf, k if arm != "fixed K" else None
                )
                w = wall(df, args.runs)
                cand = int(obs.get["adc_candidate_rows"])
                sem[(tag, f"ivfpq {arm}")] = (w, cand)
                rows_out.append(
                    f"| sim_ivfpq_ann | {tag} | {arm} (K={k}) | {n} | "
                    f"{cand} (counted) | n/a | {t_train:.2f} | {w:.2f} |"
                )

        def ratio(a, b):
            return sem[a][0] / sem[b][0]

        lines = [
            "",
            "### Density defense, measured (round 12: IVF-PQ candidate "
            f"rows now COUNTED via Observation; warm min-of-{args.runs}, "
            "training pre-paid and reported separately)",
            "",
            "| query | volume | arm | N | candidate pairs | max cell | "
            "train s | wall s |",
            "|---|---|---|---|---|---|---|---|",
            *rows_out,
            "",
            f"dedup_semantic_cells: fixed K candidate pairs grow x"
            f"{sem[('x10', 'fixed K')][1] / sem[('x1', 'fixed K')][1]:.0f} "
            f"for x10 data (the quadratic term) and the wall follows at x"
            f"{ratio(('x10', 'fixed K'), ('x1', 'fixed K')):.1f}; with "
            f"derived K (ml.k_for_corpus: occupancy pinned ~TARGET_CELL_SIZE="
            f"{ml.TARGET_CELL_SIZE}) pairs grow only x"
            f"{sem[('x10', 'derived K')][1] / sem[('x1', 'fixed K')][1]:.0f} "
            f"and the wall x"
            f"{ratio(('x10', 'derived K'), ('x1', 'fixed K')):.1f} — "
            "~linear, the defense measured. Already visible at x3: fixed K "
            f"x{ratio(('x3', 'fixed K'), ('x1', 'fixed K')):.1f} vs derived "
            f"K x{ratio(('x3', 'derived K'), ('x1', 'fixed K')):.1f} "
            "(matching the x9 vs x3 pair split).",
            f"sim_pq_adc_ann: warm wall x"
            f"{ratio(('x3', 'pq'), ('x1', 'pq')):.1f} at x3 and x"
            f"{ratio(('x10', 'pq'), ('x1', 'pq')):.1f} at x10 — ~linear as "
            "the candidate shape predicts (|Q| x N x PQ_BLOCKS: every "
            "(block,code) bucket holds exactly |Q| LUT rows, so there is no "
            "occupancy-squared term); the r10 scale probe's 9.6x was cold "
            "codebook training + first-plan codegen riding on the query "
            "wall, decomposed here into the train column. The 1B-vector "
            "lever remains IVF (nprobe bounds candidates per query).",
            f"sim_ivfpq_ann: fixed K x"
            f"{ratio(('x10', 'ivfpq fixed K'), ('x1', 'ivfpq fixed K')):.1f}"
            f" vs derived K x"
            f"{ratio(('x10', 'ivfpq derived K'), ('x1', 'ivfpq fixed K')):.1f}"
            " wall at x10 — at this volume BOTH faces are inside the "
            "per-query fixed cost (plan + LUT build + rank windows). The "
            "candidate column is now COUNTED (Observation on the ADC "
            "input, riding the timed job): fixed K grows x"
            f"{sem[('x10', 'ivfpq fixed K')][1] / max(1, sem[('x1', 'ivfpq fixed K')][1]):.1f}"
            f" for x10 data ({sem[('x1', 'ivfpq fixed K')][1]} -> "
            f"{sem[('x10', 'ivfpq fixed K')][1]} rows) while derived K "
            f"holds at {sem[('x10', 'ivfpq derived K')][1]} rows (x"
            f"{sem[('x10', 'ivfpq derived K')][1] / max(1, sem[('x1', 'ivfpq fixed K')][1]):.1f}"
            ") — the defense measured in the unit the sandbox cannot "
            "hide; rows are the term that dominates at 10^8+ codes. "
            "Registered as sim_ivfpq_ann_prod (bench-only, equality-"
            "pinned at bench SF; bound pinned in "
            "tests/test_ivfpq_candidates.py).",
        ]
        report = "\n".join(lines) + "\n"
        print(report)
        if args.append:
            with open(args.append, "a") as fh:
                fh.write(report)
            print(f"appended to {args.append}")
        return 0
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
