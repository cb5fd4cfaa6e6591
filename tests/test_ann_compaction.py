"""Index compaction for the maintained ANN store (round 10): rewriting
the per-epoch batch=<id> partitions into one bucket-clustered layout must
be INVISIBLE to serving — identical top-k rows — while collapsing the
small-files fan-out that every serve otherwise lists and opens.

The fixture drains a real multi-epoch ingest stream (so the epoch layout
is the genuine article, not a synthetic copy), then serves the same query
set against the epoch dir and the compacted dir through the same
_serve_topk plan.
"""

from __future__ import annotations

import json
import os
import time

from realtime_twitter_trends_analytics_spark.streaming.ann_stream import (
    _serve_topk,
    compact_ann_index,
    run_streaming_ann_maintain,
)

SF = "/root/testdata/sf0.001"


def _vec(i: int) -> list:
    return [
        ((i * 131 + d * 17 + (i * d) % 7) % 1000) / 1000.0 - 0.5 for d in range(64)
    ]


def test_compacted_index_serves_identical_results(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    # 6 ingest epochs of 120 vectors each
    for f_idx in range(6):
        with open(src / f"b{f_idx}.json", "w") as fh:
            for i in range(120):
                vid = f_idx * 120 + i
                fh.write(
                    json.dumps({"kind": "ingest", "id": vid, "embedding": _vec(vid)})
                    + "\n"
                )
    now = time.time()
    for i in range(6):
        os.utime(src / f"b{i}.json", (now - 60 + i * 5, now - 60 + i * 5))
    assert run_streaming_ann_maintain(
        spark, str(src), str(tmp_path / "work"), max_files_per_trigger=1
    )
    index_dir = f"{tmp_path}/work/ann_index"
    compact_dir = f"{tmp_path}/work/ann_index_compact"

    stats = compact_ann_index(spark, index_dir, compact_dir, n_partitions=4)
    # the whole point: epoch fan-out collapses (6 epochs x coalesce(2)
    # files -> 4 bucket-clustered files), no rows lost
    assert stats["files_after"] < stats["files_before"], stats
    assert stats["files_after"] <= 4, stats
    idx = spark.read.parquet(index_dir)
    assert stats["rows"] == idx.count()

    queries = spark.createDataFrame(
        [(900 + i, _vec(i * 37)) for i in range(20)],
        "query_id long, embedding array<double>",
    )

    def serve(d):
        df = _serve_topk(spark.read.parquet(d), queries, 10, False)
        return sorted(
            (r["query_id"], r["cand_id"], r["cosine"], r["rnk"]) for r in df.collect()
        )

    assert serve(index_dir) == serve(compact_dir)
