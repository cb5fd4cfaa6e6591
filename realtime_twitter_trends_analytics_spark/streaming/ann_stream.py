"""Streaming ANN serve path (round 9): the ONLINE face of the LSH index.

The batch ANN operators (similarity.py sim_lsh_ann and friends) answer
"top-k for every corpus vector" as one job. A deployed retrieval system
instead builds the bucketed index ONCE at ingest and serves a STREAM of
query vectors against it — the write-once / join-many contract the IVF
and band-index designs already document, realized here for queries:

- build_ann_index materializes the corpus side pre-exploded to
  (t, bucket, cand_id, cv): one row per vector per LSH table, exactly the
  shape the batch candidate join streams through. On a cluster this
  table is bucketed by (t, bucket) so a probe shuffles ONLY the query
  side; vectors ride through the equi-join just like the batch plan
  (similarity.py:491-498 — the dedup shuffle carries scored triples,
  never vectors).
- streaming_ann_writer: per micro-batch, explode each query to its
  TABLES x PROBES Hamming<=1 bucket probes (the multi-probe trick,
  identical constants), broadcast the probe rows (a micro-batch of
  queries is small by definition), equi-join the index, cosine on the
  join output, collapse multi-table duplicates with max(), rank top-k
  per query. Results land under an overwrite-by-batch-id path — the same
  epoch-replay idempotence contract as the streaming dedup store.

Parity: with queries drawn from the corpus and exclude_self=True, the
served results are asserted EQUAL to batch sim_lsh_ann's rows for those
query ids (tests/test_streaming_ann.py) — the streaming face is the same
operator, not an approximation of it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window as W

from ..audit import audit_plan
from ..functions import dialect as dl
from ..operators.similarity import (
    ANN_LSH_TABLES,
    LSH_BITS,
    LSH_PROBE_MASKS,
    TOP_K,
    dot_sql,
    lsh_bucket_sql,
    lsh_probe_masks,
    norm_sql,
)
from ..sources.loaders import load_table


def build_ann_index(spark: SparkSession, sf_dir: str, index_dir: str) -> None:
    """One-time index build: (t, bucket, cand_id, cv) — per-table bucket
    rows with the vector carried alongside (see module docstring)."""
    emb = load_table(spark, sf_dir, "embeddings")
    rows = emb.select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("cv"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("t"),
                        F.expr(lsh_bucket_sql(dl.SPARK, "embedding", t)).alias(
                            "bucket"
                        ),
                    )
                    for t in range(ANN_LSH_TABLES)
                ]
            )
        ).alias("p"),
    ).select(F.col("p.t").alias("t"), F.col("p.bucket").alias("bucket"), "cand_id", "cv")
    audit_plan("stream_ann_index_build", rows).write.mode("overwrite").parquet(
        index_dir
    )


def _serve_topk(
    idx: DataFrame,
    queries: DataFrame,
    k: int,
    exclude_self: bool,
    n_bits: int | None = None,
) -> DataFrame:
    """The serve plan shared by the write-once and maintained-index faces:
    explode each query to its TABLES x PROBES Hamming<=2 bucket probes,
    broadcast the probe rows, equi-join the index, cosine, collapse
    multi-table duplicates with max(), rank top-k per query.

    The probe fan-out is TWO chained explodes — base bucket per table
    first (TABLES copies of the 6-plane projection expression), then the
    XOR masks (pure integer ops) — NOT one TABLES x MASKS array: inlining
    the bucket expression 88 times made Catalyst analysis + codegen the
    dominant PER-MICRO-BATCH cost (measured round 10: the maintained-index
    topology served at ~120 rows/s with the fused form vs ~190 after
    the split; a batch job pays that compile once, a stream pays it every
    trigger).

    Norms are PRE-COMPUTED per side before the candidate join — the
    sim_topk_bruteforce discipline: per matched pair the work is ONE dot
    product, not dot + two norms (3x the array arithmetic on the
    dominant O(pairs x d) term). Same doubles, same expression order, so
    the scores are bit-equal to cosine_sql's.

    ``n_bits`` (round 11): the bucket width the index was built at —
    None is the gate constant; a rebucketed index's manifest supplies a
    wider code (see rebucket_ann_index) and probes must match it."""
    masks = LSH_PROBE_MASKS if n_bits is None else lsh_probe_masks(n_bits)
    base = queries.select(
        F.col("query_id"),
        F.col("embedding").alias("qv"),
        F.expr(norm_sql(dl.SPARK, "embedding")).alias("qnorm"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("t"),
                        F.expr(
                            lsh_bucket_sql(dl.SPARK, "embedding", t, n_bits)
                        ).alias("b0"),
                    )
                    for t in range(ANN_LSH_TABLES)
                ]
            )
        ).alias("p"),
    ).select(
        "query_id", "qv", "qnorm", F.col("p.t").alias("t"), F.col("p.b0").alias("b0")
    )
    probes = base.select(
        "query_id",
        "qv",
        "qnorm",
        "t",
        "b0",
        F.explode(F.array(*[F.lit(m) for m in masks])).alias("m"),
    ).select(
        "query_id",
        "qv",
        "qnorm",
        "t",
        F.col("b0").bitwiseXOR(F.col("m")).alias("bucket"),
    )
    idx = idx.withColumn("cnorm", F.expr(norm_sql(dl.SPARK, "cv")))
    joined = F.broadcast(probes).join(idx, ["t", "bucket"])
    if exclude_self:
        joined = joined.filter(F.col("query_id") != F.col("cand_id"))
    scored = (
        joined.select(
            "query_id",
            "cand_id",
            # identical multiplication order to cosine_sql(qv, cv)
            (
                F.expr(dot_sql(dl.SPARK, "qv", "cv"))
                / (F.col("qnorm") * F.col("cnorm"))
            ).alias("cosine"),
        )
        .groupBy("query_id", "cand_id")
        .agg(F.max("cosine").alias("cosine"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return audit_plan(
        "stream_ann_serve",
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "cand_id", F.round("cosine", 4).alias("cosine"), "rnk"),
    )


def streaming_ann_writer(
    spark: SparkSession,
    index_dir: str,
    results_dir: str,
    k: int = TOP_K,
    exclude_self: bool = False,
    metrics: list | None = None,
):
    """foreachBatch sink_writer: serve each micro-batch of (query_id,
    embedding) rows against the persisted index; write the per-query
    top-k to results_dir/batch=<id> (idempotent on epoch replay).
    exclude_self drops cand_id == query_id matches — set it when queries
    are corpus members, mirroring batch sim_lsh_ann's semantics."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        idx = spark.read.parquet(index_dir)
        topk = _serve_topk(idx, batch_df, k, exclude_self)
        topk.write.mode("overwrite").parquet(f"{results_dir}/batch={batch_id}")
        if metrics is not None:
            served = batch_df.count()
            metrics.append({"batch_id": batch_id, "n_queries": served})

    return write


def streaming_ann_maintain_reset(
    index_dir: str, results_dir: str, compact_dir: str | None = None
):
    """First-batch reset (the S8 pattern) for the maintained-index
    topology: drop index + results (and any compacted base from a prior
    incarnation — a fresh stream serving a stale base would resurrect
    vectors the new stream never ingested) so a from-scratch stream starts
    empty; an epoch-0 replay re-runs it and the epoch-0 writes rebuild the
    same state."""
    import shutil

    def setup(_bdf: DataFrame) -> None:
        import os

        shutil.rmtree(index_dir, ignore_errors=True)
        shutil.rmtree(results_dir, ignore_errors=True)
        if compact_dir is not None:
            # a promoted generation lives behind the _CURRENT pointer —
            # clear it too, or the fresh stream would serve the old base
            target = _resolve_compact_dir(compact_dir)
            if target is not None and target != compact_dir:
                shutil.rmtree(target, ignore_errors=True)
            try:
                os.remove(compact_dir + "_CURRENT")
            except FileNotFoundError:
                pass
            shutil.rmtree(compact_dir, ignore_errors=True)

    return setup


COMPACT_MANIFEST = "_ANN_COMPACT_MANIFEST.json"  # "_"-prefixed: Spark's
# file index treats it as hidden, so reading compact_dir as parquet skips it

EPOCH_META = "_EPOCH_META.json"  # per-epoch sidecar (also "_"-hidden):
# records the lsh_bits the epoch's rows were WRITTEN at. Closes the
# ADVICE r12 mixed-width hazard: an epoch committed between a rebucket's
# snapshot and its _CURRENT promotion is written at the OLD width but has
# batch_id > the new base's absorbed_through — without the stamp, the
# base+delta union would probe it at the NEW width and its vectors would
# be silently unfindable.


def _write_epoch_meta_dict(epoch_dir: str, meta: dict) -> None:
    import json
    import os

    tmp = os.path.join(epoch_dir, EPOCH_META + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, os.path.join(epoch_dir, EPOCH_META))


def _read_epoch_meta_dict(epoch_dir: str) -> "dict | None":
    import json
    import os

    p = os.path.join(epoch_dir, EPOCH_META)
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return json.load(fh)


def _write_epoch_meta(epoch_dir: str, lsh_bits: int) -> None:
    _write_epoch_meta_dict(epoch_dir, {"lsh_bits": int(lsh_bits)})


def _read_epoch_meta(epoch_dir: str) -> "int | None":
    """The stamped write width, or None (pre-stamp epoch, or a replay
    died between the parquet overwrite — which clears the dir, stamp
    included — and the re-stamp). None means UNTRUSTED, not LSH_BITS:
    the reader rehashes unstamped deltas from their carried vectors
    whenever it cannot prove they match the serve width."""
    meta = _read_epoch_meta_dict(epoch_dir)
    if meta is None or "lsh_bits" not in meta:
        return None
    return int(meta["lsh_bits"])


def _bucket_rehash_expr(out_bits: int) -> str:
    """Recompute the per-table bucket from the carried vector at
    ``out_bits`` — bit b's hyperplane depends only on (table, b), so this
    is a pure refinement/widening, shared by the compaction rebucket and
    the mixed-width delta repair."""
    return "element_at(array({}), t + 1)".format(
        ", ".join(
            lsh_bucket_sql(dl.SPARK, "cv", t, out_bits)
            for t in range(ANN_LSH_TABLES)
        )
    )


def _epoch_dirs(index_dir: str) -> "list[tuple[int, str]]":
    """(batch_id, path) of every epoch partition under the maintained
    index, sorted by batch id; tolerates non-epoch junk dirs."""
    import glob
    import os

    out = []
    for p in glob.glob(os.path.join(index_dir, "batch=*")):
        try:
            out.append((int(os.path.basename(p).split("=", 1)[1]), p))
        except ValueError:
            continue
    return sorted(out)


def _read_compact_manifest(compact_dir: str | None) -> dict | None:
    import json
    import os

    if compact_dir is None:
        return None
    mpath = os.path.join(compact_dir, COMPACT_MANIFEST)
    if not os.path.exists(mpath):
        return None
    with open(mpath) as fh:
        return json.load(fh)


def _resolve_compact_dir(compact_dir: str | None) -> str | None:
    """Follow the ``<compact_dir>_CURRENT`` pointer when present — the
    LSM superblock: generation n+1 compactions write to a FRESH directory
    (parquet cannot atomically overwrite a directory being read), and
    ``promote_compacted_generation`` flips this pointer so a RUNNING
    maintained stream picks the new base up on its next trigger without
    re-wiring the writer. No pointer = the directory itself (generation 1
    compacts in place relative to the runner's default)."""
    import os

    if compact_dir is None:
        return None
    ptr = compact_dir + "_CURRENT"
    if os.path.exists(ptr):
        with open(ptr) as fh:
            target = fh.read().strip()
        if target:
            return target
    return compact_dir


def promote_compacted_generation(compact_dir: str, new_dir: str) -> None:
    """Atomically point the maintained topology's serve base at a freshly
    written generation: write ``<compact_dir>_CURRENT`` (tmp + rename, so
    a reader never sees a partial pointer) naming ``new_dir``. Call it
    after ``compact_ann_index``/``rebucket_ann_index`` finished writing
    ``new_dir`` with ``base_compact_dir`` = the previous generation; the
    next trigger's manifest read, bucket width, and base+delta union all
    follow the pointer. The superseded generation's directory stays on
    disk (a concurrently planning trigger may still read it) — delete it
    once the stream has moved on, like pruned epochs."""
    import os

    if _read_compact_manifest(new_dir) is None:
        raise ValueError(f"{new_dir} holds no {COMPACT_MANIFEST}; compact first")
    ptr = compact_dir + "_CURRENT"
    tmp = ptr + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(new_dir)
    os.replace(tmp, ptr)


def read_maintained_index(
    spark: SparkSession, index_dir: str, compact_dir: str | None = None
) -> DataFrame | None:
    """The ONE reader of the maintained index's logical content (round 11,
    VERDICT r10 item 4): base+delta composition over a compacted layout.

    - No compaction yet (no manifest under compact_dir, or compact_dir is
      None): the index is the union of the epoch partitions — plain
      ``spark.read.parquet(index_dir)``, the round-10 behavior.
    - After ``compact_ann_index``: the index is the compacted BASE plus
      every epoch with batch_id > the manifest's ``absorbed_through`` —
      the LSM base+delta read. Epochs <= absorbed_through are IGNORED even
      if present on disk: their rows already live in the base, so a
      checkpoint replay that re-overwrites an absorbed epoch (identical
      rows by the overwrite-by-batch-id contract) cannot double-count, and
      ``prune_absorbed_epochs`` may delete them at leisure.

    Returns None when the index holds no rows anywhere (the caller serves
    the pinned empty schema). ``compact_dir`` is pointer-aware: a
    ``_CURRENT`` file beside it redirects to the promoted generation.

    Mixed-width deltas (round 12, the ADVICE r11 medium item): every
    delta epoch must carry the BASE's bucket width or its vectors are
    unfindable at serve time (probes are issued at the manifest's width).
    An epoch stamped at a DIFFERENT width — committed between a
    rebucket's epoch snapshot and its ``_CURRENT`` promotion — or an
    epoch with no stamp at all (pre-stamp layout, or a replay that died
    between the parquet overwrite and the re-stamp) is REHASHED map-side
    from its carried vectors (``_bucket_rehash_expr``; cost: one
    projection over the small delta only). Stamped-and-matching deltas
    pass through untouched, so the steady-state plan is unchanged."""
    from .dedup_stream import _has_parquet

    cols = ["t", "bucket", "cand_id", "cv"]
    compact_dir = _resolve_compact_dir(compact_dir)
    manifest = _read_compact_manifest(compact_dir)
    if manifest is None:
        if not _has_parquet(index_dir):
            return None
        # no base: serve width is the gate constant; repair any epoch not
        # provably written at it (a rebucket CANNOT have run — it would
        # have left a manifest — but a foreign/legacy epoch still must
        # not be silently unfindable)
        serve_bits = LSH_BITS
        epochs = [p for _b, p in _epoch_dirs(index_dir) if _has_parquet(p)]
        if not epochs:
            # non-epoch layout (a write-once index dir): the round-10
            # behavior, read whole-dir at the gate width
            return spark.read.parquet(index_dir).select(*cols)
        ok = [p for p in epochs if _read_epoch_meta(p) == serve_bits]
        fix = [p for p in epochs if p not in ok]
        parts = []
        if ok:
            parts.append(spark.read.parquet(*ok).select(*cols))
        if fix:
            parts.append(
                spark.read.parquet(*fix)
                .withColumn("bucket", F.expr(_bucket_rehash_expr(serve_bits)))
                .select(*cols)
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out
    serve_bits = manifest.get("lsh_bits", LSH_BITS)
    base = spark.read.parquet(compact_dir).select(*cols)
    deltas = [
        p
        for b, p in _epoch_dirs(index_dir)
        if b > manifest["absorbed_through"] and _has_parquet(p)
    ]
    if not deltas:
        return base
    ok = [p for p in deltas if _read_epoch_meta(p) == serve_bits]
    fix = [p for p in deltas if p not in ok]
    if ok:
        base = base.unionByName(spark.read.parquet(*ok).select(*cols))
    if fix:
        base = base.unionByName(
            spark.read.parquet(*fix)
            .withColumn("bucket", F.expr(_bucket_rehash_expr(serve_bits)))
            .select(*cols)
        )
    return base


def prune_absorbed_epochs(index_dir: str, compact_dir: str) -> dict:
    """Delete epoch partitions the compacted base already contains
    (batch_id <= the manifest's absorbed_through). Safe at any point after
    compaction: ``read_maintained_index`` never reads absorbed epochs, and
    a later checkpoint replay that recreates one is equally invisible.
    Run it between triggers, like compaction itself. Pointer-aware: the
    watermark comes from the PROMOTED generation when a ``_CURRENT``
    pointer redirects."""
    import shutil

    manifest = _read_compact_manifest(_resolve_compact_dir(compact_dir))
    if manifest is None:
        raise ValueError(f"no {COMPACT_MANIFEST} under {compact_dir}")
    pruned = []
    for b, p in _epoch_dirs(index_dir):
        if b <= manifest["absorbed_through"]:
            shutil.rmtree(p)
            pruned.append(b)
    return {"pruned_epochs": pruned, "absorbed_through": manifest["absorbed_through"]}


def streaming_ann_maintain_writer(
    spark: SparkSession,
    index_dir: str,
    results_dir: str,
    k: int = TOP_K,
    exclude_self: bool = False,
    metrics: list | None = None,
    compact_dir: str | None = None,
):
    """Ingest + serve on ONE index (round 10, VERDICT r9 item 3 — the last
    un-built face of the retrieval story): each micro-batch row carries
    kind='ingest' (a new corpus vector) or kind='query'. Per batch:

    1. the batch's ingest vectors explode to (t, bucket, cand_id, cv) —
       the exact shape build_ann_index materializes — and land under
       index_dir/batch=<id> (overwrite-by-batch-id epochs, so a replayed
       epoch overwrites its own rows instead of double-appending);
    2. the batch's queries probe the FULL index — every earlier batch's
       vectors plus this batch's own ingests — through the same broadcast
       multi-probe plan as the write-once serve face (_serve_topk).

    Unlike the dedup stream, including the current epoch in the index
    read is CORRECT here: a replay re-overwrites batch=<id> with the
    identical rows before serving, so the served results are
    deterministic either way (no self-match hazard — serving is a read,
    not a drop decision). Per-batch cost is O(batch + matched buckets):
    the ingest write never reads the index, and the serve side broadcasts
    only the micro-batch's probe rows.

    ``compact_dir`` (round 11) makes the serve face base+delta-aware:
    the index read goes through ``read_maintained_index``, so after a
    between-triggers ``compact_ann_index`` the stream serves
    [compacted base ∪ epochs since compaction] — the LSM discipline the
    compaction docstring promises. Ingest is UNCHANGED: new epochs keep
    landing beside the base under index_dir/batch=<id>."""
    import time as _time

    def write(batch_df: DataFrame, batch_id: int) -> None:
        t0 = _time.time()
        # the index's CURRENT bucket width: a rebucket maintenance job may
        # have widened the code between triggers — new epochs must be
        # written, and probes issued, at the manifest's width (the
        # _CURRENT pointer redirects to a promoted generation n+1)
        manifest = _read_compact_manifest(_resolve_compact_dir(compact_dir))
        n_bits = manifest.get("lsh_bits", LSH_BITS) if manifest else LSH_BITS
        # Metric counts ride an Observation on the source frame (r14, the
        # corpus_stream ADVICE-r10 pattern): the old n_ing = ing.count() +
        # batch_df.count() pair re-scanned the micro-batch source TWICE
        # per trigger purely for metrics; the observed counts are computed
        # DURING the epoch write's own scan instead (ing — and therefore
        # the observed node — is what the epoch write executes).
        obs = None
        if metrics is not None:
            from pyspark.sql import Observation

            obs = Observation()
            batch_df = batch_df.observe(
                obs,
                F.count(F.lit(1)).alias("n_raw"),
                F.sum(
                    F.when(F.col("kind") == "ingest", 1).otherwise(0)
                ).alias("n_ing"),
            )
        ing = batch_df.filter(F.col("kind") == "ingest").select(
            F.col("id").alias("cand_id"), F.col("embedding")
        )
        rows = ing.select(
            "cand_id",
            F.col("embedding").alias("cv"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("t"),
                            F.expr(
                                lsh_bucket_sql(dl.SPARK, "embedding", t, n_bits)
                            ).alias("bucket"),
                        )
                        for t in range(ANN_LSH_TABLES)
                    ]
                )
            ).alias("p"),
        ).select(
            F.col("p.t").alias("t"), F.col("p.bucket").alias("bucket"), "cand_id", "cv"
        )
        rows.coalesce(2).write.mode("overwrite").parquet(
            f"{index_dir}/batch={batch_id}"
        )
        # stamp the width the rows were written at (AFTER the overwrite —
        # Spark's overwrite clears the dir, stamp included); the reader
        # rehashes any delta it cannot prove matches the serve width
        _write_epoch_meta(f"{index_dir}/batch={batch_id}", n_bits)
        queries = batch_df.filter(F.col("kind") == "query").select(
            F.col("id").alias("query_id"), "embedding"
        )
        idx = read_maintained_index(spark, index_dir, compact_dir)
        if idx is not None:
            topk = _serve_topk(idx, queries, k, exclude_self, n_bits=n_bits)
        else:
            # nothing ingested yet anywhere in the stream: an all-query
            # first batch serves the empty result with the pinned schema
            topk = spark.createDataFrame(
                [], "query_id long, cand_id long, cosine double, rnk int"
            )
        topk.write.mode("overwrite").parquet(f"{results_dir}/batch={batch_id}")
        if metrics is not None:
            # filled by the epoch write above — no extra job
            got = obs.get
            n_ing = int(got["n_ing"] or 0)
            metrics.append(
                {
                    "batch_id": batch_id,
                    "n_ingest": n_ing,
                    "n_queries": int(got["n_raw"]) - n_ing,
                    "batch_sec": round(_time.time() - t0, 3),
                }
            )

    return write


def compact_ann_index(
    spark: SparkSession,
    index_dir: str,
    compact_dir: str,
    n_partitions: int = 8,
    base_compact_dir: str | None = None,
    new_bits: int | None = None,
) -> dict:
    """Index MAINTENANCE companion (round 10): the streaming ingest leaves
    one batch=<id> partition per epoch — thousands of small files after a
    day of micro-batches. This job rewrites the accumulated epochs into
    one bucket-clustered layout: repartition on (t, bucket) so each probe
    key lives in exactly one file, sortWithinPartitions so footer min/max
    stats support row-group skipping. On a real cluster this writes a
    bucketed table (bucketBy(t, bucket)) so the serve join also skips the
    shuffle.

    Semantics contract (the load-bearing claim): serving against the
    compacted layout returns rows IDENTICAL to serving against the epoch
    layout (pinned in tests/test_ann_compaction.py — same vectors, same
    buckets, and _serve_topk's (cosine desc, cand_id) tiebreak is
    layout-independent).

    Measured honestly (round 10, local[32]): on LOCAL disk the epoch
    layout serves as fast as the compacted one (24 epochs/48k rows:
    3.5-6.9 s vs 8.1-8.5 s; 192 epochs/192k rows: 10.4-16.5 s vs
    14.2-15.1 s — overlapping bands, no win) because local listing is
    ~free and Spark's maxPartitionBytes split-packing equalizes read
    parallelism across layouts. The benefit case is an OBJECT STORE,
    where per-epoch listing + per-file GET latency + footer reads scale
    with file count — this sandbox cannot exhibit that regime, so the
    operator ships on the equality receipt and the files_before ->
    files_after reduction, not on a local wall-time claim.

    Run it between triggers (the stream owns the epoch dir; compaction
    owns its output). The output carries a ``_ANN_COMPACT_MANIFEST.json``
    recording the max epoch id absorbed; pass the SAME compact_dir to
    ``streaming_ann_maintain_writer`` / ``run_streaming_ann_maintain`` and
    the serve face reads [compacted base ∪ epochs since compaction]
    through ``read_maintained_index`` — the base+delta discipline every
    LSM-ish store uses, wired end-to-end (round 11; the round-10 docstring
    promised it but nothing served the union). Absorbed epochs become dead
    weight, removable with ``prune_absorbed_epochs``.

    Re-compaction (generation n+1): pass ``base_compact_dir`` = the
    previous compact_dir and a FRESH ``compact_dir`` — the input is then
    [old base ∪ epochs since the old manifest], i.e. exactly what serving
    sees; writing over a directory being read is not a thing parquet can
    do atomically, hence the fresh output per generation. To hand the new
    generation to a RUNNING maintained stream, follow with
    ``promote_compacted_generation(<runner's compact_dir>, <fresh dir>)``
    — the writer follows the ``_CURRENT`` pointer per trigger
    (``base_compact_dir`` may itself be a pointer; it is resolved).

    ``new_bits`` widens the bucket code during the rewrite — see
    rebucket_ann_index, the named entry point for that maintenance job.

    Returns {files_before, files_after, rows, absorbed_through,
    n_epochs_absorbed, generation, lsh_bits}."""
    import glob
    import json
    import os

    def _count_files(d: str) -> int:
        return len(glob.glob(os.path.join(d, "**", "*.parquet"), recursive=True))

    base_compact_dir = _resolve_compact_dir(base_compact_dir)
    # Self-overwrite guards (ADVICE r11): (a) writing the generation into
    # the directory its own lazy base read comes from is parquet's opaque
    # 'cannot overwrite a path being read from' failure — refuse with the
    # real reason; (b) a compact_dir that carries a _CURRENT pointer is a
    # RUNNER'S pointer root — writing a generation directly there would
    # land rows the pointer never names (silently never served; promote
    # into it instead).
    if base_compact_dir == compact_dir:
        raise ValueError(
            f"base_compact_dir resolves to the output dir {compact_dir}; "
            "generation n+1 must be written to a FRESH directory"
        )
    if os.path.exists(compact_dir + "_CURRENT"):
        raise ValueError(
            f"{compact_dir} has a _CURRENT pointer (it is a runner's "
            "pointer root); write the new generation to a fresh dir and "
            "promote_compacted_generation into it"
        )
    prev = _read_compact_manifest(base_compact_dir)
    if prev is None and _read_compact_manifest(
        _resolve_compact_dir(compact_dir)
    ) is not None:
        # Data-loss guard: compact_dir already holds a generation. Building
        # a new one from the EPOCHS ALONE would silently drop every row
        # whose epoch was pruned after the earlier compaction (and parquet
        # cannot atomically overwrite a directory being read anyway).
        raise ValueError(
            f"{compact_dir} already holds a compacted generation; pass it "
            "as base_compact_dir and write generation n+1 to a fresh dir"
        )
    prev_through = prev["absorbed_through"] if prev else -1
    epochs = _epoch_dirs(index_dir)
    # epochs may have been pruned since the previous generation — the new
    # watermark can never move backwards past what the old base absorbed
    absorbed_through = max([prev_through] + [b for b, _ in epochs])
    n_new = len([b for b, _ in epochs if b > prev_through])
    idx = read_maintained_index(spark, index_dir, base_compact_dir)
    if idx is None:
        raise ValueError(f"nothing to compact under {index_dir}")
    prev_bits = prev.get("lsh_bits", LSH_BITS) if prev else LSH_BITS
    if new_bits is not None and new_bits < prev_bits:
        raise ValueError(f"cannot narrow the code: {prev_bits} -> {new_bits}")
    out_bits = new_bits if new_bits is not None else prev_bits
    if out_bits != prev_bits:
        # REBUCKET during the rewrite (the 'more bits per code' density
        # lever, executable): the index rows carry the vectors, so the
        # wider bucket is recomputed from cv per row — bit b's hyperplane
        # depends only on (table, b), making this a pure REFINEMENT
        # (new_bucket mod 2^old_bits == old_bucket; identical vectors stay
        # co-bucketed at any width). Mean occupancy drops 2x per added
        # bit, which is the whole point: the maintained-serve growth curve
        # resets without touching recall for exact matches.
        idx = idx.withColumn("bucket", F.expr(_bucket_rehash_expr(out_bits)))
    rows = idx.select("t", "bucket", "cand_id", "cv")
    (
        rows.repartition(n_partitions, "t", "bucket")
        .sortWithinPartitions("t", "bucket")
        .write.mode("overwrite")
        .parquet(compact_dir)
    )
    manifest = {
        "absorbed_through": absorbed_through,
        "n_epochs_absorbed": n_new,
        "generation": (prev["generation"] + 1) if prev else 1,
        "lsh_bits": out_bits,
    }
    with open(os.path.join(compact_dir, COMPACT_MANIFEST), "w") as fh:
        json.dump(manifest, fh)
    return {
        "files_before": _count_files(index_dir),
        "files_after": _count_files(compact_dir),
        "rows": spark.read.parquet(compact_dir).count(),
        **manifest,
    }


def rebucket_ann_index(
    spark: SparkSession,
    index_dir: str,
    compact_dir: str,
    new_bits: int,
    base_compact_dir: str | None = None,
    n_partitions: int = 8,
) -> dict:
    """The 'more bits per code' maintenance job (round 11): every growth
    probe in SCALE_SMOKE.md ends with 'the production lever is more bits
    per code' — this makes the lever executable instead of prose. A
    compaction pass that simultaneously WIDENS the bucket code: rows are
    re-hashed from their carried vectors to ``new_bits`` (a pure
    refinement — see lsh_bucket_sql — so identical vectors remain
    co-bucketed and an exact-match query is found at any width), the
    manifest records the new width, and the maintained writer picks it up
    on its next trigger: post-rebucket epochs are WRITTEN at the new
    width and probes are issued with lsh_probe_masks(new_bits).

    Cost/benefit at the growth wall: per-table occupancy ~ N / 2^bits, so
    +2 bits cuts ADC candidates per query ~4x at the price of
    1+n+C(n,2) probes per table (22 -> 37 masks for 6 -> 8). Run it,
    like compaction, between triggers; narrowing is refused (it would
    merge buckets the probes could then overshoot)."""
    return compact_ann_index(
        spark,
        index_dir,
        compact_dir,
        n_partitions=n_partitions,
        base_compact_dir=base_compact_dir,
        new_bits=new_bits,
    )


def read_upsert_query_stream(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Bounded-replay mixed stream for the maintained index: JSON lines
    {kind: 'ingest'|'query', id, embedding} with a pinned schema."""
    reader = spark.readStream.schema("kind string, id long, embedding array<double>")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(source_dir)


def run_streaming_ann_maintain(
    spark: SparkSession,
    source_dir: str,
    work_dir: str,
    k: int = TOP_K,
    exclude_self: bool = False,
    max_files_per_trigger: int | None = None,
    metrics: list | None = None,
    timeout_sec: int = 300,
) -> bool:
    """Drain a mixed ingest/query stream through the maintained-index
    writer (batch-0 reset + checkpointing). Returns awaitTermination's
    verdict; on timeout the query is stopped and drained first.

    The serve face is base+delta-aware by default: compact the index
    between runs with ``compact_ann_index(spark, work_dir/ann_index,
    work_dir/ann_compact)`` and a resumed drain (same work_dir, same
    checkpoint) serves the compacted base plus post-compaction epochs.
    A FRESH stream's batch-0 reset clears the base along with the index."""
    import os

    from .pipeline import write_with_first_batch_setup

    index_dir = os.path.join(work_dir, "ann_index")
    results_dir = os.path.join(work_dir, "results")
    compact_dir = os.path.join(work_dir, "ann_compact")
    q = write_with_first_batch_setup(
        read_upsert_query_stream(spark, source_dir, max_files_per_trigger),
        checkpoint_dir=os.path.join(work_dir, "ckpt"),
        sink_writer=streaming_ann_maintain_writer(
            spark, index_dir, results_dir, k=k, exclude_self=exclude_self,
            metrics=metrics, compact_dir=compact_dir,
        ),
        first_batch_setup=streaming_ann_maintain_reset(
            index_dir, results_dir, compact_dir
        ),
        output_mode="append",
    )
    done = q.awaitTermination(timeout_sec)
    if not done:
        q.stop()
        q.awaitTermination()
    return done


def read_query_stream(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Bounded-replay query stream: JSON lines {query_id, embedding} with
    a pinned schema (floats arrive as doubles — cosine_sql casts both
    sides to double, so parity with the float-typed corpus is exact)."""
    reader = spark.readStream.schema("query_id long, embedding array<double>")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(source_dir)


def run_streaming_ann(
    spark: SparkSession,
    source_dir: str,
    work_dir: str,
    sf_dir: str,
    k: int = TOP_K,
    exclude_self: bool = False,
    max_files_per_trigger: int | None = None,
    metrics: list | None = None,
    timeout_sec: int = 300,
) -> bool:
    """Build the index (once), then drain the query stream through the
    production foreachBatch entry. Returns awaitTermination's verdict."""
    import os

    from .pipeline import write_with_first_batch_setup

    index_dir = os.path.join(work_dir, "ann_index")
    results_dir = os.path.join(work_dir, "results")
    build_ann_index(spark, sf_dir, index_dir)
    q = write_with_first_batch_setup(
        read_query_stream(spark, source_dir, max_files_per_trigger),
        checkpoint_dir=os.path.join(work_dir, "ckpt"),
        sink_writer=streaming_ann_writer(
            spark, index_dir, results_dir, k=k, exclude_self=exclude_self,
            metrics=metrics,
        ),
        output_mode="append",
    )
    done = q.awaitTermination(timeout_sec)
    if not done:
        # timeout: stop + drain before returning so callers can tear down
        # the work dir without racing a still-running query (bench.py's
        # pre-existing streaming path does the same)
        q.stop()
        q.awaitTermination()
    return done
