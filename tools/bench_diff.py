"""Bench regression gate (VERDICT r3 item 5): compare two bench result
files on their common query set and fail loudly on per-query or total
regressions. Round 3's 1.39x common-set drift shipped silently because
nothing diffed the files — this tool is now part of the end-of-round
checklist next to tools/verify_local.py.

Usage:
    python tools/bench_diff.py OLD NEW [--per-query-max 1.25] [--total-max 1.15]

OLD/NEW accept any of:
  - a driver artifact (BENCH_r{N}.json: {"parsed": {...}, "tail": "..."})
  - a raw bench payload (bench_full.json / the first JSON line of bench.py)

Exit code 1 if any query exceeds --per-query-max or the common-set total
exceeds --total-max. Queries present on one side only are listed but never
fail the gate (coverage growth is not a regression).
"""

from __future__ import annotations

import argparse
import json
import re
import sys


def load_payload(path: str) -> tuple[dict[str, float], float | None]:
    """(per-query seconds, canary_sec or None if the file predates r11)."""
    with open(path) as fh:
        doc = json.load(fh)
    # driver artifact: prefer parsed payload, fall back to scraping the tail
    if "parsed" in doc or "tail" in doc:
        parsed = doc.get("parsed")
        if parsed and parsed.get("queries"):
            return dict(parsed["queries"]), parsed.get("canary_sec")
        # tail scrape: the per-query map may be truncated at its head —
        # recover every complete "name": seconds pair that survived
        tail = doc.get("tail", "")
        pairs = re.findall(r'"([a-zA-Z0-9_]+)":\s*([0-9]+\.[0-9]+)', tail)
        known_scalars = {"value", "sf", "elapsed_sec", "rows_per_sec", "canary_sec"}
        got = {
            k: float(v)
            for k, v in pairs
            if k not in known_scalars and not k.startswith("q_")
        }
        # recall/streaming/canary sub-keys leak into the scrape; drop them
        for noise in (
            "lsh", "ivf", "ivf_kmeans", "pq_adc", "input_rows",
            "cpu_hash", "shuffle_agg", "string_regex", "sec",
        ):
            got.pop(noise, None)
        if not got:
            raise SystemExit(f"{path}: no usable per-query data (parsed null, tail empty)")
        m = re.search(r'"canary_sec":\s*([0-9.]+)', tail)
        return got, (float(m.group(1)) if m else None)
    # raw payload
    if "queries" in doc:
        return dict(doc["queries"]), doc.get("canary_sec")
    raise SystemExit(f"{path}: unrecognized bench file format")


def canon_tiers(queries: "dict[str, float]") -> "dict[str, float]":
    """Pair tier-renamed lines across rounds (ADVICE r12): a query demoted
    to the 'demo:' tier keeps benching under 'demo:<name>', but a
    previous round recorded it bare — exact-key pairing would drop it
    from the common set for one round (reported dropped+added, untracked)
    exactly when the rename happened. Strip the tier prefix when the bare
    name is not also present on the same side (a collision would mean two
    genuinely different lines; keep both untouched then). 'staging:' is
    NOT stripped — staging lines are stable under that prefix on both
    sides by construction."""
    out = dict(queries)
    for k in list(out):
        if k.startswith("demo:"):
            bare = k[len("demo:"):]
            if bare not in out:
                out[bare] = out.pop(k)
    return out


def load_queries(path: str) -> dict[str, float]:
    return canon_tiers(load_payload(path)[0])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--per-query-max", type=float, default=1.25)
    ap.add_argument("--total-max", type=float, default=1.15)
    ap.add_argument(
        "--min-sec",
        type=float,
        default=0.3,
        help="ignore per-query ratios when BOTH sides are below this (noise floor)",
    )
    ap.add_argument(
        "--adjudicate",
        default=None,
        metavar="OLD_REF",
        help="on per-query FAIL, run tools/rebench_flagged.py against this "
        "git ref inline (round 14, VERDICT r13 item 6): the same-box "
        "interleaved table prints right here, so redirecting this command "
        "produces BENCH_DIFF_r{N}.txt with the adjudication embedded; the "
        "exit code then reflects the ADJUDICATED verdicts (a flag cleared "
        "to parity no longer fails the gate)",
    )
    args = ap.parse_args()

    (old, c_old), (new, c_new) = load_payload(args.old), load_payload(args.new)
    old, new = canon_tiers(old), canon_tiers(new)
    # Host-speed normalization (r11, VERDICT r10 item 3): when BOTH sides
    # carry the fixed-shape canary, divide every ratio by the host ratio —
    # the mechanical form of the interleaved same-box adjudication every
    # round since r4 has re-paid by hand. A canary ratio outside [1/3, 3]
    # means the probes themselves misbehaved (or the host changed class);
    # fall back to raw ratios and say so.
    host = 1.0
    if c_old and c_new:
        host = c_new / c_old
        if not (1 / 3 <= host <= 3):
            print(f"canary ratio {host:.3f}x outside sanity band — NOT normalizing")
            host = 1.0
        else:
            print(
                f"host canary: old={c_old:.3f}s new={c_new:.3f}s "
                f"ratio={host:.3f}x — per-query/total ratios below are "
                f"host-normalized (raw ratio / {host:.3f})"
            )
    else:
        print("host canary: absent on one side (pre-r11 artifact) — raw ratios")
    common = sorted(set(old) & set(new))
    only_old = sorted(set(old) - set(new))
    only_new = sorted(set(new) - set(old))
    if not common:
        print("no common queries between the two files")
        return 1

    total_old = sum(old[k] for k in common)
    total_new = sum(new[k] for k in common)
    total_raw = total_new / total_old if total_old else float("inf")
    # GATE on min(raw, normalized) — round 12: the canary is a ONE-SIDED
    # rescue. When the host got slower, dividing by the canary ratio
    # rescues honest code from host drift (the r10/r11 use case). When
    # the canary says the host got FASTER but the queries did not move,
    # the far likelier cause is canary noise (its own cross-run spread
    # measured 0.655-0.831 on one box in one day — r12's adjudication)
    # than a code regression that exactly offsets a host speedup; gating
    # on the normalized ratio there manufactures failures. Both columns
    # still print, so a real offset regression remains visible.
    total_ratio = min(total_raw, total_raw / host)

    rows = []
    failures = []
    for k in common:
        raw = new[k] / old[k] if old[k] else float("inf")
        ratio = min(raw, raw / host)
        flag = ""
        if ratio > args.per_query_max and max(old[k], new[k]) >= args.min_sec:
            flag = "REGRESSION"
            failures.append(k)
        elif ratio < 1 / args.per_query_max:
            flag = "improved"
        rows.append((ratio, raw, k, old[k], new[k], flag))

    print(f"common set: {len(common)} queries   old={total_old:.3f}s   "
          f"new={total_new:.3f}s   raw={total_raw:.3f}x   "
          f"normalized={total_raw / host:.3f}x   "
          f"gated-on={total_ratio:.3f}x (gate {args.total_max}x = "
          "min(raw, normalized) per the one-sided-rescue rule)")
    if host != 1.0:
        print("  gated     raw  query" + " " * 37 + "old    ->  new")
    for ratio, raw, k, o, n, flag in sorted(rows, reverse=True):
        if flag or ratio > 1.1:
            print(f"  {ratio:5.2f}x {raw:5.2f}x  {k:40s} {o:7.3f} -> {n:7.3f}  {flag}")
    if only_old:
        print(f"dropped from new ({len(only_old)}): {', '.join(only_old)}")
    if only_new:
        print(f"added in new ({len(only_new)}): {', '.join(only_new)}")

    if failures:
        print(f"FAIL: {len(failures)} per-query regressions > {args.per_query_max}x: "
              f"{', '.join(failures)}")
    if failures and args.adjudicate:
        # same-box adjudication inline (the r4 ritual; mechanized in r13,
        # auto-triggered in r14): interleaved min-of-N against the
        # UNCHANGED old tree decides drift vs regression — its exit code
        # replaces the raw flag list in the gate verdict
        import os
        import subprocess

        print()
        proc = subprocess.run(
            [
                sys.executable,
                os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "rebench_flagged.py"),
                args.adjudicate,
                "--queries", *failures,
            ],
            text=True, capture_output=True,
        )
        sys.stdout.write(proc.stdout)
        sys.stderr.write(proc.stderr)
        confirmed = proc.returncode != 0
        if not confirmed:
            print("per-query flags adjudicated to parity (host drift)")
        failed = confirmed or total_ratio > args.total_max
    else:
        failed = bool(failures) or total_ratio > args.total_max
    if total_ratio > args.total_max:
        print(f"FAIL: common-set total {total_ratio:.3f}x > {args.total_max}x")
    if not failed:
        print("PASS" + (" (after adjudication)" if failures else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
