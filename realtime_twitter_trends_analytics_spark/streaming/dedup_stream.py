"""Streaming near-duplicate dedup — the ingest face of the banded-MinHash
index (round 9, VERDICT r8 next-round item 3).

The reference's only streaming dedup is exact-key dropDuplicates on
(ts, hashtag, country) (proc:115) — operator A2. This module is that
operator's near-dup generalization for a 100 TB training-data ingest:
per micro-batch,

1. shingle + MinHash-sign the batch (the dedup.py template, applied to
   the micro-batch DataFrame instead of a corpus directory),
2. PROBE the persisted banded index with the batch's (band_id, band_key)
   rows — the incremental-probe shape (dedup.py dedup_incremental_probe):
   the equi-join shuffles only increment-sized band rows, and the wide
   K-hash signatures re-join on doc_id for the surviving candidates only,
3. verify candidates by estimated Jaccard (signature agreement / K),
4. drop near-dups (cross-batch against the index, and within-batch via
   the same banded self-join), append the SURVIVORS' documents, band rows
   and signatures to the store/index.

Scale notes (the 100 TB contract):
- Per-batch cost is O(batch + matched buckets), never O(corpus): the
  corpus side enters only through the band-key equi-join and the
  candidate-only signature join. On a real cluster the index is a
  bucketed table on band_key so the probe shuffles ONLY the batch side;
  the local form reads the index parquet per batch (same join shape).
- Exactly-once: every per-batch write lands in mode("overwrite") under a
  batch=<id> subdirectory, so a post-failure replay of the same epoch
  overwrites its own output instead of double-appending — the same
  idempotence contract write_with_first_batch_setup's batch-0 reset
  implies, extended to every batch (exercised by the failure-injection
  test, tests/test_streaming_dedup.py).
- Only SURVIVORS enter the index: later near-dups match the canonical
  keeper, and the index grows with the deduped corpus, not the raw feed.
- Docs too short to shingle (< SHINGLE tokens) are always kept and add
  nothing to the index — they are invisible to near-dup detection by
  construction (exact dedup is a separate, cheaper pass).

Within-batch rule: a doc is dropped if it has a verified match with a
SMALLER doc_id in the same batch (greedy keeper-by-min-id — for a chain
a~b~c this keeps a and drops both b and c, the aggressive choice every
production near-dedup makes; the batch analogue canonicalizes with
connected components instead, dedup.py dedup_clusters).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..audit import audit_plan
from ..operators.dedup import (
    JACCARD_THRESHOLD,
    MINHASH_K,
    banded_rel,
    minhash_signatures_for,
    signature_match_count,
)

_SIG_COLS = [f"h{k}" for k in range(MINHASH_K)]


def _index_paths(index_dir: str) -> tuple[str, str, str]:
    return (
        os.path.join(index_dir, "bands"),
        os.path.join(index_dir, "sigs"),
        os.path.join(index_dir, "survivors"),
    )


def streaming_dedup_reset(index_dir: str) -> None:
    """First-batch target reset (the S8 pattern applied to the dedup
    store): drop the index + survivor trees so a from-scratch stream
    starts against an empty corpus. Pass as first_batch_setup — a replay
    of epoch 0 re-runs it, and the epoch-0 writes that follow rebuild the
    same state (idempotent)."""
    for p in _index_paths(index_dir):
        shutil.rmtree(p, ignore_errors=True)


def _has_parquet(path: str) -> bool:
    if not os.path.isdir(path):
        return False
    for _root, _dirs, files in os.walk(path):
        if any(f.endswith(".parquet") for f in files):
            return True
    return False


def streaming_dedup_writer(
    spark: SparkSession,
    index_dir: str,
    results: list | None = None,
    threshold: float = JACCARD_THRESHOLD,
):
    """foreachBatch sink_writer implementing the per-batch probe/append
    cycle described in the module docstring. ``batch_df`` must carry
    (doc_id, text) plus any payload columns; survivors are appended with
    their full row. ``results`` (optional) collects per-batch metrics
    (batch_id, n_in, n_dropped_cross, n_dropped_within, n_kept)."""
    bands_dir, sigs_dir, surv_dir = _index_paths(index_dir)

    def write(batch_df: DataFrame, batch_id: int) -> DataFrame:
        # n_in rides an Observation on the source frame (r14, the
        # corpus_stream ADVICE-r10 pattern): the old batch_df.count()
        # re-scanned the micro-batch source once per trigger purely for
        # metrics; the observed count fills during the signature
        # checkpoint's own scan (sig derives from the observed frame).
        obs_in = None
        if results is not None:
            from pyspark.sql import Observation

            obs_in = Observation()
            batch_df = batch_df.observe(obs_in, F.count(F.lit(1)).alias("n_in"))
        # one distributed signature build per batch; localCheckpoint so the
        # band explode, the two probes and the survivor anti-join all read
        # the materialized K-hash rows instead of re-shingling the text
        sig = audit_plan(
            "stream_dedup_signatures",
            minhash_signatures_for(batch_df.select("doc_id", "text")),
        ).localCheckpoint()
        bands = banded_rel(sig)
        sa = sig.select(
            F.col("doc_id").alias("n"), *[F.col(h).alias(f"a_{h}") for h in _SIG_COLS]
        )
        est = (signature_match_count("a", "b") / F.lit(MINHASH_K)).alias("est_jaccard")

        # ---- ONE candidate join for both drop reasons (round-9 second
        # pass: the separate within-batch self-join and index-probe join
        # cost a join stage each; uniting the right side halves the join
        # stages per batch). The right side is the batch's own band rows
        # tagged 'within' plus — when the index exists — the persisted
        # band rows tagged 'cross'; doc_ids are globally unique across
        # the stream (the dedup identity contract), so the union sides
        # cannot collide. Within-pairs keep only c < n (greedy
        # keeper-by-min-id, module docstring); cross-pairs keep all.
        left = bands.select(F.col("doc_id").alias("n"), "band_id", "band_key")
        cand_right = bands.select(
            F.col("doc_id").alias("c"), "band_id", "band_key",
            F.lit("within").alias("why"),
        )
        sb = sig.select(
            F.col("doc_id").alias("c"), *[F.col(h).alias(f"b_{h}") for h in _SIG_COLS]
        )
        if _has_parquet(bands_dir):
            # Epoch-replay safety: if this batch committed its batch=<id>
            # index writes but died before the checkpoint commit, the replay
            # re-enters here with its OWN stale rows already on disk under
            # batch=<id>. Reading them back would make every sig-bearing doc
            # a 1.0-Jaccard "cross" dup of itself and corrupt the survivor
            # store. The batch=<id> layout surfaces `batch` as a partition
            # column, so excluding the current epoch is a partition-pruned
            # filter — the replay sees exactly the index state the first
            # attempt saw.
            cand_right = cand_right.union(
                spark.read.parquet(bands_dir)
                .filter(F.col("batch") != F.lit(batch_id))
                .select(
                    F.col("doc_id").alias("c"), "band_id", "band_key",
                    F.lit("cross").alias("why"),
                )
            )
            sb = sb.union(
                spark.read.parquet(sigs_dir)
                .filter(F.col("batch") != F.lit(batch_id))
                .select(
                    F.col("doc_id").alias("c"),
                    *[F.col(h).alias(f"b_{h}") for h in _SIG_COLS],
                )
            )
        # c != n on cross pairs is belt-and-braces for the same replay
        # hazard (doc_ids are globally unique across the stream, so a
        # legitimate cross pair can never have c == n)
        cand = (
            left.join(cand_right, ["band_id", "band_key"])
            .filter(
                ((F.col("why") == "cross") & (F.col("c") != F.col("n")))
                | (F.col("c") < F.col("n"))
            )
            .select("n", "c", "why")
            .distinct()
        )

        # ONE distributed job materializes the whole drop set (cross +
        # within verified in the same plan); "cross" < "within", so a doc
        # caught by both is attributed to the index hit. The per-why drop
        # counts ride a second Observation on the pre-checkpoint frame
        # (r14): they fill during the checkpoint job, replacing the old
        # dropped.groupBy("why").count().collect() follow-up job.
        drop_plan = (
            cand.join(sa, "n")
            .join(sb, "c")
            .select("n", est, "why")
            .filter(F.col("est_jaccard") >= threshold)
            .groupBy(F.col("n").alias("doc_id"))
            .agg(F.min("why").alias("why"))
        )
        obs_drop = None
        if results is not None:
            from pyspark.sql import Observation

            obs_drop = Observation()
            drop_plan = drop_plan.observe(
                obs_drop,
                F.sum(F.when(F.col("why") == "cross", 1).otherwise(0)).alias(
                    "n_cross"
                ),
                F.sum(F.when(F.col("why") == "within", 1).otherwise(0)).alias(
                    "n_within"
                ),
            )
        dropped = audit_plan("stream_dedup_drop_set", drop_plan).localCheckpoint()
        drop_ids = dropped.select("doc_id")

        # ---- survivors: everything not dropped (including sig-less short
        # docs, which never appear in `sig` and can never be dropped);
        # keep_sig is a cheap anti-join of two checkpointed relations, so
        # it is recomputed for the two index writes instead of paying a
        # third materialization. Writes coalesce to a few files: each is
        # micro-batch-sized (a deployment sizes this to batch volume).
        survivors = batch_df.join(drop_ids, "doc_id", "left_anti")
        survivors.coalesce(2).write.mode("overwrite").parquet(
            f"{surv_dir}/batch={batch_id}"
        )
        keep_sig = sig.join(drop_ids, "doc_id", "left_anti")
        keep_sig.coalesce(2).write.mode("overwrite").parquet(
            f"{sigs_dir}/batch={batch_id}"
        )
        banded_rel(keep_sig).coalesce(2).write.mode("overwrite").parquet(
            f"{bands_dir}/batch={batch_id}"
        )

        if results is not None:
            # both observations were filled by the checkpoint jobs above
            n_cross = int(obs_drop.get["n_cross"] or 0)
            n_within = int(obs_drop.get["n_within"] or 0)
            n_in = int(obs_in.get["n_in"])
            results.append(
                {
                    "batch_id": batch_id,
                    "n_in": n_in,
                    "n_dropped_cross": n_cross,
                    "n_dropped_within": n_within,
                    "n_kept": n_in - n_cross - n_within,
                }
            )
        # foreachBatch ignores the return value; composed topologies
        # (corpus_stream) reuse the survivor frame without re-reading the
        # just-written parquet (whose partition may be empty)
        return survivors

    return write


def read_docs_stream(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Bounded-replay document stream: JSON lines of {doc_id, text} — the
    docs-table analogue of pipeline.read_raw_stream (on a cluster this is
    the Kafka/object-store feed; the schema is pinned, never inferred)."""
    reader = spark.readStream.schema("doc_id long, text string")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(source_dir)


def run_streaming_dedup(
    spark: SparkSession,
    source_dir: str,
    work_dir: str,
    max_files_per_trigger: int | None = None,
    results: list | None = None,
    timeout_sec: int = 300,
) -> bool:
    """Wire source -> writer through the production foreachBatch entry
    (write_with_first_batch_setup: batch-0 reset + checkpointing) and
    drain with availableNow. Returns awaitTermination's verdict."""
    from .pipeline import write_with_first_batch_setup

    index_dir = os.path.join(work_dir, "dedup_store")
    docs = read_docs_stream(
        spark, source_dir, max_files_per_trigger=max_files_per_trigger
    )
    q = write_with_first_batch_setup(
        docs,
        checkpoint_dir=os.path.join(work_dir, "ckpt"),
        sink_writer=streaming_dedup_writer(spark, index_dir, results=results),
        first_batch_setup=lambda _bdf: streaming_dedup_reset(index_dir),
        output_mode="append",
    )
    done = q.awaitTermination(timeout_sec)
    if not done:
        # timeout verdict: stop and drain before returning so the caller can
        # safely tear down source/checkpoint/store directories (a leaked
        # running query would race the cleanup with background failures)
        q.stop()
        q.awaitTermination()
    return done
