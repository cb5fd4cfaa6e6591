"""End-to-end streaming corpus ingestion (round 10, VERDICT r9 item 4):
quality gate -> streaming near-dup dedup -> per-(lang, source) accounting
in ONE foreachBatch topology — the streaming twin of the batch corpus
pipelines (cleaning.corpus_pipeline_flagship's composition, with the
near-dup generalization of its exact-dedup stage).

Per micro-batch:

1. GATE: the C4/Gopher first-failing-rule verdict (cleaning._verdict_sql —
   the literal same SQL string the batch operators and the DuckDB oracles
   run; SURVEY §1.3's batch/stream unification receipt) filters the batch
   to kept docs. Pure column arithmetic, no shuffle.
2. NEAR-DUP DEDUP: the gated docs flow through streaming_dedup_writer —
   MinHash-sign, probe the persisted banded index (earlier epochs only),
   drop verified near-dups, append survivors + their band/sig rows under
   overwrite-by-batch-id epochs (dedup_stream.py's exactly-once contract).
3. ACCOUNTING: the batch's survivors aggregate to per-(lang, source)
   (n_docs, n_tokens) DELTA rows under acct_dir/batch=<id>. The deltas
   derive from the survivor frame the dedup stage just computed (no
   re-read of the possibly-empty parquet partition), so a replayed epoch
   rewrites the identical delta. The final accounting is sum-over-epochs —
   read_corpus_accounting — and equals the batch aggregation over the
   final survivor store by construction (each survivor contributes to
   exactly one epoch's delta).

Scale notes: stages 1 and 3 are batch-sized (a filter and a tiny agg);
stage 2 is the O(batch + matched buckets) index probe — the whole
topology's per-batch cost is independent of corpus size (proven flat by
the dedup stream's x3 corpus-growth probe; this module adds only
batch-local work on top).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..audit import audit_plan
from ..functions import dialect as dl
from ..operators.cleaning import _verdict_sql
from ..operators.dedup import JACCARD_THRESHOLD
from .dedup_stream import streaming_dedup_reset, streaming_dedup_writer


def streaming_corpus_reset(index_dir: str, acct_dir: str):
    """First-batch reset for the composed topology: dedup index + survivor
    store + accounting epochs all start empty (idempotent on an epoch-0
    replay, same as streaming_dedup_reset)."""
    import shutil

    def setup(_bdf: DataFrame) -> None:
        streaming_dedup_reset(index_dir)
        shutil.rmtree(acct_dir, ignore_errors=True)

    return setup


def eval_shingle_set(docs: DataFrame) -> DataFrame:
    """The decontamination stage's static ground truth: DISTINCT 3-gram
    shingles of the eval documents, as a 1-column relation the per-batch
    contamination join probes. Build it ONCE (the runner localCheckpoints
    it) — the eval set does not change while a stream runs; at 100 TB it
    is tiny next to the feed and broadcasts."""
    from ..operators.dedup import shingles_sql

    return (
        docs.select(F.expr(dl.split_ws(dl.SPARK, "text")).alias("toks"))
        .select(
            F.explode(
                F.expr(dl.arr_distinct(dl.SPARK, shingles_sql(dl.SPARK, "toks")))
            ).alias("sh")
        )
        .distinct()
    )


def streaming_corpus_writer(
    spark: SparkSession,
    index_dir: str,
    acct_dir: str,
    results: list | None = None,
    threshold: float = JACCARD_THRESHOLD,
    eval_shingles: DataFrame | None = None,
):
    """foreachBatch sink_writer composing gate -> [decontamination] ->
    near-dup dedup -> accounting (module docstring). ``batch_df`` must
    carry (doc_id, text, lang, source); extra payload columns ride through
    to the survivor store. ``results`` collects the dedup stage's
    per-batch metrics plus the gate's drop count.

    ``eval_shingles`` (round 12, the corpus_pipeline_v4 stage) arms the
    decontamination step: a gated doc whose distinct-3-gram overlap with
    the eval set exceeds DECON_MAX_CONTAM is dropped BEFORE dedup (and
    therefore never indexed — eval near-copies must not become the
    survivor another copy dedups against). Stage cost is batch-local: the
    batch's shingles join the static eval relation (stream-static join in
    foreachBatch form); per-batch metric ``n_contaminated_out`` rides the
    results list."""
    from ..operators.cleaning import DECON_MAX_CONTAM
    from ..operators.dedup import shingles_sql

    dedup_write = streaming_dedup_writer(
        spark, index_dir, results=results, threshold=threshold
    )

    def write(batch_df: DataFrame, batch_id: int) -> None:
        # The raw-batch count rides an Observation on the gate's input, so
        # it is computed DURING the dedup stage's own first action over the
        # gated frame instead of by a second source scan per micro-batch
        # (ADVICE r10: the old `batch_df.count()` here re-read the source
        # purely for metrics).
        from pyspark.sql import Observation

        obs = Observation()
        observed = batch_df.observe(obs, F.count(F.lit(1)).alias("n_raw"))
        gated = observed.filter(F.expr(_verdict_sql(dl.SPARK)) == "kept")
        n_contam = 0
        if eval_shingles is not None:
            ksh = gated.select(
                "doc_id", F.expr(dl.split_ws(dl.SPARK, "text")).alias("toks")
            ).select(
                "doc_id",
                F.explode(
                    F.expr(dl.arr_distinct(dl.SPARK, shingles_sql(dl.SPARK, "toks")))
                ).alias("sh"),
            )
            contam_ids = (
                ksh.join(eval_shingles.withColumn("hit", F.lit(1)), "sh", "left")
                .groupBy("doc_id")
                .agg(
                    (F.sum(F.coalesce("hit", F.lit(0))) / F.count(F.lit(1))).alias(
                        "frac"
                    )
                )
                .filter(F.col("frac") > DECON_MAX_CONTAM)
                .select("doc_id")
            )
            # LEFT_ANTI join, not collect+isin (ADVICE r12): an isin over
            # collected ids inlines one literal per contaminated doc into
            # the plan (expression-size/analysis cost grows with per-batch
            # contamination, and driver memory holds the id list); the
            # anti-join keeps the predicate PLAN-SIDE — the batch face
            # (corpus_pipeline_v4) uses the same join shape. contam_ids is
            # batch-bounded, so it broadcasts. It is localCheckpoint'ed
            # first (ADVICE r13): the shingle-join subplan executes exactly
            # ONCE (at the checkpoint) — the n_contam metric count and the
            # anti-join both read the materialized blocks instead of each
            # re-running the scan + explode + join.
            contam_ids = audit_plan(
                "corpus_stream_contam_ids", contam_ids
            ).localCheckpoint()
            n_contam = contam_ids.count()
            gated = gated.join(F.broadcast(contam_ids), "doc_id", "left_anti")
        survivors = dedup_write(gated, batch_id)
        n_tok = F.size(F.expr(dl.split_ws(dl.SPARK, "text")))
        delta = (
            survivors.select("lang", "source", n_tok.alias("n_tok"))
            .groupBy("lang", "source")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_tok").cast("bigint").alias("n_tokens"),
            )
        )
        delta.coalesce(1).write.mode("overwrite").parquet(
            f"{acct_dir}/batch={batch_id}"
        )
        if results is not None and results:
            # annotate the dedup stage's record with the gate's drop count;
            # obs.get blocks until the first action over the observed plan
            # (the dedup stage's signature build) has fired — no extra scan
            rec = results[-1]
            if rec.get("batch_id") == batch_id and "n_gated_out" not in rec:
                rec["n_contaminated_out"] = n_contam
                rec["n_gated_out"] = (
                    int(obs.get["n_raw"]) - rec["n_in"] - n_contam
                )

    return write


def read_corpus_accounting(spark: SparkSession, acct_dir: str) -> DataFrame:
    """Sum the per-epoch accounting deltas to the corpus totals — the
    streaming analogue of aggregating the final survivor store."""
    return (
        spark.read.parquet(acct_dir)
        .groupBy("lang", "source")
        .agg(
            F.sum("n_docs").cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        )
    )


def read_corpus_docs_stream(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Bounded-replay corpus feed: JSON lines {doc_id, text, lang, source}
    with a pinned schema."""
    reader = spark.readStream.schema(
        "doc_id long, text string, lang string, source string"
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(source_dir)


def run_streaming_corpus_pipeline(
    spark: SparkSession,
    source_dir: str,
    work_dir: str,
    max_files_per_trigger: int | None = None,
    results: list | None = None,
    timeout_sec: int = 300,
    eval_source_dir: str | None = None,
) -> bool:
    """Wire source -> composed writer through the production foreachBatch
    entry and drain with availableNow. Returns awaitTermination's verdict;
    on timeout the query is stopped and drained before returning.

    ``eval_source_dir`` (round 12): a directory of eval documents (same
    JSON schema as the feed); when given, their shingle set is built ONCE
    (localCheckpoint — static ground truth for the whole run) and every
    batch runs the decontamination stage against it, the streaming face of
    corpus_pipeline_v4."""
    from .pipeline import write_with_first_batch_setup

    index_dir = os.path.join(work_dir, "dedup_store")
    acct_dir = os.path.join(work_dir, "accounting")
    docs = read_corpus_docs_stream(
        spark, source_dir, max_files_per_trigger=max_files_per_trigger
    )
    eval_sh = None
    if eval_source_dir is not None:
        eval_docs = spark.read.schema(
            "doc_id long, text string, lang string, source string"
        ).json(eval_source_dir)
        eval_sh = eval_shingle_set(eval_docs).localCheckpoint()
    q = write_with_first_batch_setup(
        docs,
        checkpoint_dir=os.path.join(work_dir, "ckpt"),
        sink_writer=streaming_corpus_writer(
            spark, index_dir, acct_dir, results=results, eval_shingles=eval_sh
        ),
        first_batch_setup=streaming_corpus_reset(index_dir, acct_dir),
        output_mode="append",
    )
    done = q.awaitTermination(timeout_sec)
    if not done:
        q.stop()
        q.awaitTermination()
    return done
