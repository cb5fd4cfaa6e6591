"""Same-box adjudication of bench_diff flags, automated (round 13, VERDICT
r12 item 3 — "the decisive receipt for host drift is now ritual; make it a
tool").

Every round since r4, flagged per-query "regressions" have been adjudicated
by hand: check out the PREVIOUS round's unchanged tree in a worktree,
re-bench the flagged lines on TODAY's box, interleaved with the current
tree, and compare min-of-N warm noop-sink timings. If the old tree
reproduces the elevation, the flag is host drift; if the new tree is
genuinely slower head-to-head, it is a code regression. The judge re-ran
the same ritual independently in r12 and confirmed it settles the question.

Usage:
    python tools/rebench_flagged.py OLD_REF BENCH_DIFF.txt [--sf DIR]
        [--rounds 3] [--queries a b c] [--keep-worktree]

- OLD_REF: git ref of the previous round's tree (e.g. the r12 gate commit).
- BENCH_DIFF.txt: the bench_diff output whose FAIL list to adjudicate
  (--queries overrides; with neither flag list nor queries, exits 0).

Method (the r4 ritual, mechanized):
- `git worktree add --detach` OLD_REF (no build step — pure Python pkg).
- 2 x --rounds SUBPROCESS runs, ALTERNATING old/new tree each run (the
  interleaving that cancels slow-box minutes), each run: fresh Spark
  local[$SPARK_GRAFT_CPUS], per query one warm noop-sink execution then
  one timed noop-sink execution (the repo's timing discipline: noop sink,
  never count() — Catalyst prunes subtrees under count).
- Per (tree, query): MIN across rounds (warm min-of-N, same as bench.py).
- Verdict per query: new_min/old_min <= --parity-max (default 1.15x, the
  bench total gate) = parity/host-drift; above = regression CONFIRMED on
  this box. Exit 1 iff any confirmed.
- ESCALATION rule (r13 lesson, the events_acf case: sub-threshold
  "confirmed" verdicts at 1.15-1.20x with flipping per-round raws are
  usually phase noise): a confirmed query whose ratio lands inside
  (parity-max, --escalate-below] is automatically re-adjudicated with
  --escalate-rounds extra interleaved rounds before the verdict stands —
  min-of-more is strictly tighter, so escalation can only ACQUIT.

The stdout table is the adjudication section BENCH_DIFF_r{N}.txt embeds —
and bench_diff.py --adjudicate OLD_REF runs this tool inline on its own
FAIL list, so one command produces the diff with the table embedded.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Runs inside EACH tree (cwd = tree root) via `python -c`: argv = sf_dir,
# cpus, then query names. Resolves names through whichever registries the
# tree exposes (gate queries, bench-only prod twins, staging builders,
# demo: / staging: prefixes), times warm noop-sink, prints one JSON line.
_RUNNER = r"""
import json, sys, time
sf, cpus, names = sys.argv[1], sys.argv[2], sys.argv[3:]
from pyspark.sql import SparkSession
spark = (
    SparkSession.builder.master(f"local[{cpus}]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "8g")
    .appName("rebench_flagged")
    .getOrCreate()
)
from realtime_twitter_trends_analytics_spark.registry import all_queries
qmap = dict(all_queries())
try:
    from realtime_twitter_trends_analytics_spark.registry import all_bench_only
    qmap.update(all_bench_only())
except ImportError:
    pass
try:
    from realtime_twitter_trends_analytics_spark.registry import all_staging
    qmap.update({f"staging:{k}": v for k, v in all_staging().items()})
except ImportError:
    pass
qmap.update({f"demo:{k}": v for k, v in list(qmap.items())})
try:
    from realtime_twitter_trends_analytics_spark.registry import clear_staging_memos
except ImportError:
    def clear_staging_memos():
        pass
out = {}
for name in names:
    fn = qmap.get(name)
    if fn is None:
        out[name] = None
        continue
    staging = name.startswith("staging:")
    if staging:
        clear_staging_memos()   # a memoized build re-times as ~0s otherwise
    fn(spark, sf).write.format("noop").mode("overwrite").save()   # warm
    if staging:
        clear_staging_memos()
    t0 = time.time()
    fn(spark, sf).write.format("noop").mode("overwrite").save()
    out[name] = round(time.time() - t0, 4)
print("REBENCH_JSON:" + json.dumps(out))
"""


def parse_flags(path: str) -> "list[str]":
    with open(path) as fh:
        text = fh.read()
    m = re.search(r"FAIL: \d+ per-query regressions > [\d.]+x: ([^\n]+)", text)
    return [q.strip() for q in m.group(1).split(",")] if m else []


def run_tree(tree: str, sf: str, cpus: str, names: "list[str]") -> "dict[str, float]":
    proc = subprocess.run(
        [sys.executable, "-c", _RUNNER, sf, cpus, *names],
        cwd=tree, capture_output=True, text=True, timeout=1800,
        env={**os.environ, "PYTHONPATH": tree},
    )
    for line in proc.stdout.splitlines():
        if line.startswith("REBENCH_JSON:"):
            return json.loads(line[len("REBENCH_JSON:"):])
    raise SystemExit(
        f"runner produced no result in {tree}:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old_ref")
    ap.add_argument("bench_diff", nargs="?")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--parity-max", type=float, default=1.15)
    ap.add_argument("--queries", nargs="*", default=None)
    ap.add_argument("--keep-worktree", action="store_true")
    ap.add_argument(
        "--escalate-below", type=float, default=1.45,
        help="confirmed ratios <= this get --escalate-rounds extra "
        "interleaved rounds before the verdict stands (r13: sub-threshold "
        "confirmations with flipping raws are usually phase noise; r15: "
        "raised 1.20 -> 1.45 after three min-of-3 CONFIRMED flags at "
        "1.32-1.38x all flipped to parity at min-of-5 — this box's phase "
        "band is wider than the old ceiling assumed)",
    )
    ap.add_argument("--escalate-rounds", type=int, default=2)
    ap.add_argument(
        "--escalate-above", type=float, default=1.10,
        help="SYMMETRIC escalation floor (r15, VERDICT r14 item 9): parity "
        "verdicts with ratio in (this, parity-max] ALSO get the extra "
        "rounds — escalating only confirmations is a one-sided acquittal "
        "bias (min-of-more can push a near-threshold parity either way)",
    )
    args = ap.parse_args()

    names = args.queries or (parse_flags(args.bench_diff) if args.bench_diff else [])
    if not names:
        print("no flagged queries to adjudicate — nothing to do")
        return 0

    wt = tempfile.mkdtemp(prefix="rebench_old_")
    subprocess.run(
        ["git", "worktree", "add", "--detach", "--force", wt, args.old_ref],
        cwd=REPO, check=True, capture_output=True,
    )
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    mins: dict[tuple[str, str], float] = {}

    def interleave(qnames: "list[str]", rounds: int, tag: str) -> None:
        for rnd in range(rounds):
            for label, tree in (("old", wt), ("new", REPO)):  # INTERLEAVED
                got = run_tree(tree, args.sf, cpus, qnames)
                for q, sec in got.items():
                    if sec is None:
                        continue
                    key = (label, q)
                    mins[key] = min(mins.get(key, float("inf")), sec)
                print(
                    f"  {tag} round {rnd + 1}/{rounds} {label}: "
                    + " ".join(f"{q}={got[q]}" for q in qnames),
                    file=sys.stderr,
                )

    def verdicts(qnames: "list[str]") -> "dict[str, float | None]":
        out: dict[str, float | None] = {}
        for q in qnames:
            o, n = mins.get(("old", q)), mins.get(("new", q))
            out[q] = (n / o) if (o and n is not None) else None
        return out

    try:
        interleave(names, args.rounds, "base")
        ratios = verdicts(names)
        # symmetric band around parity_max (r15): near-threshold verdicts
        # on BOTH sides re-run, not just sub-threshold confirmations
        marginal = [
            q
            for q, r in ratios.items()
            if r is not None and args.escalate_above < r <= args.escalate_below
        ]
        escalated = set()
        if marginal:
            print(
                f"  escalating {len(marginal)} near-threshold verdict(s) "
                f"(({args.escalate_above}, {args.escalate_below}]x) with "
                f"{args.escalate_rounds} "
                f"extra interleaved rounds: {', '.join(marginal)}",
                file=sys.stderr,
            )
            interleave(marginal, args.escalate_rounds, "escalate")
            escalated = set(marginal)
            ratios = verdicts(names)
    finally:
        if args.keep_worktree:
            print(f"worktree kept at {wt}", file=sys.stderr)
        else:
            subprocess.run(
                ["git", "worktree", "remove", "--force", wt],
                cwd=REPO, capture_output=True,
            )

    total_rounds = args.rounds + args.escalate_rounds
    print(
        f"## same-box adjudication (tools/rebench_flagged.py): old={args.old_ref} "
        f"vs current tree, interleaved min-of-{args.rounds} warm noop-sink "
        f"(min-of-{total_rounds} where escalated), sf={args.sf}"
    )
    print(f"{'query':42s} {'old_min':>8s} {'new_min':>8s} {'ratio':>7s}  verdict")
    confirmed = []
    for q in names:
        o, n = mins.get(("old", q)), mins.get(("new", q))
        if o is None or n is None:
            print(f"{q:42s} {'-':>8s} {'-':>8s} {'-':>7s}  absent in one tree")
            continue
        ratio = n / o if o else float("inf")
        esc = " [escalated]" if q in escalated else ""
        verdict = (
            "parity (host drift)"
            if ratio <= args.parity_max
            else "REGRESSION confirmed"
        ) + esc
        if ratio > args.parity_max:
            confirmed.append(q)
        print(f"{q:42s} {o:8.3f} {n:8.3f} {ratio:6.2f}x  {verdict}")
    print(
        f"adjudication: {len(names) - len(confirmed)}/{len(names)} parity"
        + (f"; CONFIRMED regressions: {', '.join(confirmed)}" if confirmed else "")
    )
    return 1 if confirmed else 0


if __name__ == "__main__":
    sys.exit(main())
