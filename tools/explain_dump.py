"""Dump `.explain("formatted")` for named queries to plans/<tag>/<name>_<suffix>.txt.

Round-14 optimization-round tooling: the judge checks plan claims
(Exchange counts, join strategies, PushedFilters, BatchEvalPython nodes)
against committed files, so every touched query gets a *_before.txt /
*_after.txt pair produced by this one command.

Usage:
    python tools/explain_dump.py --tag r14 --suffix before q1 q2 ...
    python tools/explain_dump.py --tag r14 --suffix after  q1 q2 ...

Names resolve through the same registries as the bench (gate queries,
bench-only twins, `staging:` builders). Plans are captured from the lazy
frame the query function returns — the same frame the bench's noop sink
executes.
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="r14")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from realtime_twitter_trends_analytics_spark.registry import (
        all_bench_only,
        all_queries,
        all_staging,
        clear_staging_memos,
    )
    from realtime_twitter_trends_analytics_spark.session import get_spark

    spark = get_spark("explain-dump")
    qmap = {**all_queries(), **all_bench_only()}
    qmap.update({f"staging:{k}": v for k, v in all_staging().items()})

    out_dir = os.path.join(REPO, "plans", args.tag)
    os.makedirs(out_dir, exist_ok=True)
    for name in args.names:
        fn = qmap.get(name)
        if fn is None:
            print(f"SKIP {name}: not in any registry", file=sys.stderr)
            continue
        if name.startswith("staging:"):
            clear_staging_memos()
        df = fn(spark, args.sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        fname = name.replace("staging:", "staging_")
        path = os.path.join(out_dir, f"{fname}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
        spark.catalog.clearCache()
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
