"""Streaming near-dup dedup (round 9, VERDICT r8 items 3 + 5).

- a planted CROSS-BATCH near-dup (same long text, one token changed) must
  be dropped when its batch probes the index built from earlier batches;
- a planted WITHIN-BATCH near-dup must be dropped in its own batch
  (keeper = smaller doc_id);
- novel and sig-less (too-short-to-shingle) docs must survive;
- FAILURE INJECTION: killing the query after >=1 committed batch and
  restarting from the same checkpoint must produce a survivor store
  identical to an uninterrupted run — the foreachBatch epoch replay +
  overwrite-by-batch-id writes are the exactly-once claim S10 implies,
  and this test fails if the batch-0 reset or the append double-applies.

The near-dup texts share 26 of 28 3-token shingles (true Jaccard ~0.87);
with the fixed md5-based minhash family the estimated Jaccard and band
collisions are fully deterministic, so there is no sampling flake.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from realtime_twitter_trends_analytics_spark.streaming.dedup_stream import (
    read_docs_stream,
    run_streaming_dedup,
    streaming_dedup_reset,
    streaming_dedup_writer,
)
from realtime_twitter_trends_analytics_spark.streaming.pipeline import (
    write_with_first_batch_setup,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while seventeen green "
    "turtles watch quietly from the river bank near the old stone bridge "
    "at dawn every single summer morning"
)


def _fill(i: int) -> str:
    return " ".join(f"w{i}x{j} token{(i * 31 + j * 7) % 991}" for j in range(15))


def _write_docs(path, rows) -> None:
    with open(path, "w") as fh:
        for doc_id, text in rows:
            fh.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")


def _make_source(src) -> None:
    src.mkdir()
    # batch 0: base doc 1, unique docs 2-4, and 7 = near-dup of 2 (within-batch)
    _write_docs(
        src / "b0.json",
        [
            (1, BASE + " alpha edition"),
            (2, _fill(2)),
            (3, _fill(3)),
            (4, _fill(4)),
            (7, _fill(2).replace("token62", "tokenZZ")),
        ],
    )
    # batch 1: 11 = cross-batch near-dup of 1, 12 novel, 13 sig-less short
    _write_docs(
        src / "b1.json",
        [
            (11, BASE + " beta edition"),
            (12, _fill(12)),
            (13, "tiny doc"),
        ],
    )
    # batch 2: 21 = near-dup of a batch-1 SURVIVOR (12); 22 novel
    _write_docs(
        src / "b2.json",
        [
            (21, _fill(12).replace("token379", "tokenQQ")),
            (22, _fill(22)),
        ],
    )
    # FileStreamSource orders files by MODIFICATION TIME, and three files
    # written back-to-back can share an mtime tick (observed: b1 drained
    # first) — pin strictly increasing mtimes so batch order is b0,b1,b2
    now = time.time()
    for i, name in enumerate(["b0.json", "b1.json", "b2.json"]):
        os.utime(src / name, (now - 30 + i * 10, now - 30 + i * 10))


def _survivor_ids(spark, work) -> list[int]:
    df = spark.read.parquet(f"{work}/dedup_store/survivors")
    return sorted(r[0] for r in df.select("doc_id").collect())


def test_streaming_dedup_drops_planted_near_dups(spark, tmp_path):
    src = tmp_path / "src"
    _make_source(src)
    results: list[dict] = []
    finished = run_streaming_dedup(
        spark,
        str(src),
        str(tmp_path / "work"),
        max_files_per_trigger=1,
        results=results,
    )
    assert finished, "stream did not drain"
    assert len(results) == 3, results
    by_id = {r["batch_id"]: r for r in results}
    # batch 0: within-batch pair (2, 7) -> 7 dropped, nothing cross-batch yet
    assert by_id[0]["n_dropped_cross"] == 0
    assert by_id[0]["n_dropped_within"] == 1
    assert by_id[0]["n_kept"] == 4
    # batch 1: 11 caught against the index; novel + short docs kept
    assert by_id[1]["n_dropped_cross"] == 1
    assert by_id[1]["n_kept"] == 2
    # batch 2: 21 matches batch-1 survivor 12 (the index grew across batches)
    assert by_id[2]["n_dropped_cross"] == 1
    assert by_id[2]["n_kept"] == 1
    assert _survivor_ids(spark, tmp_path / "work") == [1, 2, 3, 4, 12, 13, 22]


def test_streaming_dedup_short_docs_never_indexed(spark, tmp_path):
    """Sig-less docs survive but add no band/sig rows to the index."""
    src = tmp_path / "src"
    src.mkdir()
    _write_docs(src / "b0.json", [(1, "tiny doc"), (2, BASE)])
    finished = run_streaming_dedup(spark, str(src), str(tmp_path / "work"))
    assert finished
    work = tmp_path / "work"
    assert _survivor_ids(spark, work) == [1, 2]
    sig_ids = {
        r[0]
        for r in spark.read.parquet(f"{work}/dedup_store/sigs").select("doc_id").collect()
    }
    assert sig_ids == {2}


def test_streaming_dedup_epoch_replay_is_idempotent(spark, tmp_path):
    """Deterministic epoch-replay regression (round-10 ADVICE, high): the
    failure window where a batch's three batch=<id> index writes all
    committed but the stream died BEFORE the checkpoint commit. The replay
    re-runs the same epoch with its own stale rows already on disk — if
    the probe read them back, every sig-bearing doc would match itself at
    est_jaccard 1.0 as a 'cross' dup, emptying the survivor epoch and the
    index partition. The restart test above only kills in a narrow window
    and cannot reliably reach this interleaving, so we drive the writer
    directly."""
    work = tmp_path / "work"
    index_dir = f"{work}/dedup_store"
    streaming_dedup_reset(index_dir)
    results: list[dict] = []
    write = streaming_dedup_writer(spark, index_dir, results=results)

    b0 = spark.createDataFrame(
        [(1, BASE + " alpha edition"), (2, _fill(2))], "doc_id long, text string"
    )
    b1 = spark.createDataFrame(
        [(11, BASE + " beta edition"), (12, _fill(12)), (13, "tiny doc")],
        "doc_id long, text string",
    )
    write(b0, 0)
    write(b1, 1)
    first = results[-1]
    assert first == {
        "batch_id": 1, "n_in": 3, "n_dropped_cross": 1,
        "n_dropped_within": 0, "n_kept": 2,
    }
    # the replay: same epoch, same rows, stale batch=1 index state on disk
    write(b1, 1)
    assert results[-1] == first, f"replay diverged: {results[-1]} != {first}"
    assert _survivor_ids(spark, work) == [1, 2, 12, 13]
    sigs = spark.read.parquet(f"{index_dir}/sigs")
    assert sorted(r[0] for r in sigs.select("doc_id").collect()) == [1, 2, 12]


def test_streaming_dedup_restart_equals_uninterrupted(spark, tmp_path):
    """Failure injection: stop after the first committed batch, restart
    from the checkpoint, final store must equal the uninterrupted run."""
    src = tmp_path / "src"
    _make_source(src)

    # reference: uninterrupted drain
    ref_results: list[dict] = []
    assert run_streaming_dedup(
        spark, str(src), str(tmp_path / "ref"), max_files_per_trigger=1,
        results=ref_results,
    )
    ref_ids = _survivor_ids(spark, tmp_path / "ref")

    # injected-failure run: same topology, stopped after >=1 batch commits
    work = tmp_path / "work"
    index_dir = f"{work}/dedup_store"
    results: list[dict] = []

    def start():
        docs = read_docs_stream(spark, str(src), max_files_per_trigger=1)
        return write_with_first_batch_setup(
            docs,
            checkpoint_dir=f"{work}/ckpt",
            sink_writer=streaming_dedup_writer(spark, index_dir, results=results),
            first_batch_setup=lambda _bdf: streaming_dedup_reset(index_dir),
            output_mode="append",
        )

    q = start()
    deadline = time.time() + 120
    while not results and time.time() < deadline:
        time.sleep(0.2)
    assert results, "no batch committed before the kill"
    q.stop()  # kill mid-corpus (batches 1/2 not yet, or partially, applied)
    q.awaitTermination(60)

    q2 = start()  # restart from the SAME checkpoint — offsets replay
    assert q2.awaitTermination(180), "restarted stream did not drain"

    ids = _survivor_ids(spark, work)
    assert ids == ref_ids, f"restart diverged: {ids} != {ref_ids}"
    # no double-applied rows: doc_ids unique across the whole store
    df = spark.read.parquet(f"{index_dir}/survivors")
    assert df.count() == df.select("doc_id").distinct().count()
    sigs = spark.read.parquet(f"{index_dir}/sigs")
    assert sigs.count() == sigs.select("doc_id").distinct().count()
