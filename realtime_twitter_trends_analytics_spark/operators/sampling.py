"""Dataset sampling / splitting / quantization — training-data pipeline
operators that must be DETERMINISTIC at scale (a re-run or a retried task
must assign the same row to the same split, or the dataset is corrupt).

Everything keys off md5 content/id hashes, not rand(): reproducible across
runs, engines (oracle-verified), cluster sizes, and task retries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions import dialect as dl
from ..sources.loaders import load_table


def _bucket16_sql(d: str, expr: str) -> str:
    """Deterministic 0..15 bucket from the first md5 nibble of ``expr``."""
    return dl.md5_prefix_nibble(d, expr)


def dataset_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-split documents into train/val/test (14/1/1 of 16 buckets) on
    doc_id — stable under re-partitioning, appends, and retries (the rand()
    alternative is none of those). Returns per-split counts + char volume."""
    d = load_table(spark, sf_dir, "documents")
    bucket = F.expr(_bucket16_sql(dl.SPARK, "CAST(doc_id AS STRING)"))
    split = (
        F.when(bucket == 0, "test").when(bucket == 1, "val").otherwise("train")
    )
    return (
        d.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("total_chars"))
    )


def _oracle_split() -> str:
    b = _bucket16_sql(dl.DUCK, "CAST(doc_id AS VARCHAR)")
    return f"""
SELECT CASE WHEN {b} = 0 THEN 'test' WHEN {b} = 1 THEN 'val' ELSE 'train' END AS split,
  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY 1
"""


def sample_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~1/16 systematic sample by CONTENT hash (id-independent:
    survives re-keying; duplicates sample together — handy for dedup QA)."""
    d = load_table(spark, sf_dir, "documents")
    bucket = F.expr(_bucket16_sql(dl.SPARK, "text"))
    return (
        d.filter(bucket == 0)
        .select("doc_id", "lang", "source", F.length("text").alias("text_len"))
    )


def _oracle_sample() -> str:
    b = _bucket16_sql(dl.DUCK, "text")
    return f"""
SELECT doc_id, lang, source, CAST(length(text) AS INT) AS text_len
FROM documents WHERE {b} = 0
"""


# buckets of 16 kept per language stratum (8/16, 4/16, 2/16, default 1/16)
STRATA_KEEP = {"en": 8, "es": 4, "de": 2}
DEFAULT_KEEP = 1


def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum deterministic sampling — the class-rebalancing operator
    (downsample dominant languages, keep rare ones): doc kept iff its
    content-hash bucket < keep[lang]. Same hash-bucket machinery as the
    systematic sample, so retries/re-partitioning/appends cannot change
    membership. Output is the per-stratum audit (totals, kept, achieved
    rate) a pipeline logs next to the sampled dataset."""
    d = load_table(spark, sf_dir, "documents")
    bucket = F.expr(_bucket16_sql(dl.SPARK, "text"))
    keep = F.lit(DEFAULT_KEEP)
    for lang, k in sorted(STRATA_KEEP.items()):
        keep = F.when(F.col("lang") == lang, k).otherwise(keep)
    return (
        d.select("lang", (bucket < keep).cast("int").alias("kept"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("kept").alias("n_sampled"),
            F.expr(dl.round_ratio(dl.SPARK, "sum(kept)", "count(*)")).alias("rate"),
        )
    )


def _oracle_stratified() -> str:
    b = _bucket16_sql(dl.DUCK, "text")
    whens = " ".join(
        f"WHEN '{lang}' THEN {k}" for lang, k in sorted(STRATA_KEEP.items())
    )
    kept = f"sum(CASE WHEN {b} < (CASE lang {whens} ELSE {DEFAULT_KEEP} END) THEN 1 ELSE 0 END)"
    rate = dl.round_ratio(dl.DUCK, kept, "count(*)")
    return f"""
SELECT lang, count(*) AS n_docs,
  CAST({kept} AS BIGINT) AS n_sampled,
  {rate} AS rate
FROM documents GROUP BY lang
"""


def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization per vector: scale = max|x| / 127,
    q_i = round(x_i / scale). Emitted long-form summary (quantization error
    stats) so the oracle can verify the arithmetic; the quantized array
    itself stays an array column in the intermediate.

    At 100 TB this is how embeddings ship: 4x smaller, dot products in int8
    with one rescale — the quantized column is written once and reused."""
    emb = load_table(spark, sf_dir, "embeddings")
    amax = "aggregate(embedding, CAST(0.0 AS DOUBLE), (a, x) -> greatest(a, abs(CAST(x AS DOUBLE))))"
    scale = f"({amax}) / 127.0"
    q = f"transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) / ({scale})) AS INT))"
    err = (
        f"aggregate(zip_with(embedding, {q}, (x, qq) -> "
        f"abs(CAST(x AS DOUBLE) - qq * ({scale}))), CAST(0.0 AS DOUBLE), (a, e) -> a + e)"
    )
    return emb.select(
        "vec_id",
        F.round(F.expr(scale), 6).alias("scale"),
        F.expr(f"array_max({q})").alias("q_max"),
        F.expr(f"array_min({q})").alias("q_min"),
        F.round(F.expr(err) / F.size("embedding"), 6).alias("mean_abs_err"),
    )


def _oracle_quantize() -> str:
    amax = "coalesce(list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))), 0.0)"
    scale = f"({amax}) / 127.0"
    q = f"list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) / ({scale})) AS INT))"
    err = (
        f"list_sum(list_transform(generate_series(1, len(embedding)), i -> "
        f"abs(CAST(embedding[i] AS DOUBLE) - list_extract({q}, i) * ({scale}))))"
    )
    return f"""
SELECT vec_id,
  round({scale}, 6) AS scale,
  list_max({q}) AS q_max,
  list_min({q}) AS q_min,
  round(({err}) / len(embedding), 6) AS mean_abs_err
FROM embeddings
"""


SHUFFLE_SHARDS = 8
SHUFFLE_SALT = "epoch0"


def docs_shard_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training order WITHOUT a global sort: shard by a salted
    content-id hash, order within each shard by the hash — the shuffled-
    dataset layout a training loader consumes (one file list per shard,
    each internally ordered).

    At 100 TB a global ORDER BY rand() is a full range-partition sort of
    the corpus AND non-reproducible; this is ONE hash-partition shuffle
    (the window partitions by shard), within-partition sort, no skew (md5
    is uniform), and a task retry or re-run yields byte-identical order.
    New epoch = new salt, nothing else changes."""
    d = load_table(spark, sf_dir, "documents")
    key = F.md5(F.concat_ws("|", F.col("doc_id").cast("string"), F.lit(SHUFFLE_SALT)))
    shard = F.expr(
        f"{dl.hex_nibble(dl.SPARK, 'substr(shuffle_key, 1, 1)')} % {SHUFFLE_SHARDS}"
    )
    from pyspark.sql.window import Window as W

    w = W.partitionBy("shard").orderBy("shuffle_key", "doc_id")
    return (
        d.select("doc_id", key.alias("shuffle_key"))
        .withColumn("shard", shard.cast("int"))
        .withColumn("position", F.row_number().over(w))
        .select("doc_id", "shard", "position", "shuffle_key")
    )


def _oracle_shard_order() -> str:
    key = f"md5(CAST(doc_id AS VARCHAR) || '|' || '{SHUFFLE_SALT}')"
    shard = f"({dl.hex_nibble(dl.DUCK, 'substr(shuffle_key, 1, 1)')} % {SHUFFLE_SHARDS})"
    return f"""
WITH keyed AS (
  SELECT doc_id, {key} AS shuffle_key FROM documents
)
SELECT doc_id, CAST({shard} AS INT) AS shard,
  CAST(row_number() OVER (
    PARTITION BY {shard} ORDER BY shuffle_key, doc_id
  ) AS INT) AS position,
  shuffle_key
FROM keyed
"""


SAMPLE_WEIGHTED_K = 200


def sample_weighted_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sample of K documents, inclusion probability
    ~ n_chars: priority sampling (Duffield–Lund–Thorup) with key
    u/w — u a 60-bit uniform from md5(doc_id), w the weight — keep the K
    smallest keys. No ln()/pow() (libm differs across engines; the u/w key
    is one IEEE division, bit-identical), no rand() (retry-stable).

    Scale shape: the key is a map-side projection; the global K-smallest is
    TakeOrderedAndProject (per-partition top-K, tiny final merge) — no full
    sort, no shuffle of the corpus."""
    d = load_table(spark, sf_dir, "documents")
    keyed = d.select(
        "doc_id",
        "n_chars",
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    ).withColumn(
        "priority",
        F.expr(
            f"CAST({dl.hex_prefix_u60(dl.SPARK, 'h')} + 1 AS DOUBLE)"
            " / CAST(n_chars AS DOUBLE)"
        ),
    )
    return (
        keyed.select("doc_id", "n_chars", "priority")
        .orderBy(F.asc("priority"), F.asc("doc_id"))
        .limit(SAMPLE_WEIGHTED_K)
    )


def _oracle_weighted() -> str:
    u60 = dl.hex_prefix_u60(dl.DUCK, "h")
    return f"""
WITH keyed AS (
  SELECT doc_id, n_chars, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents
)
SELECT doc_id, n_chars,
  CAST({u60} + 1 AS DOUBLE) / CAST(n_chars AS DOUBLE) AS priority
FROM keyed
ORDER BY priority ASC, doc_id ASC
LIMIT {SAMPLE_WEIGHTED_K}
"""


def sample_class_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT class equalization (the companion to sample_stratified's
    fixed-rate downsampling): every language is cut to the size of the
    rarest class by keeping each class's m lowest-hash documents —
    deterministic "random" under re-runs, appends to OTHER classes, and
    task retries, because membership depends only on (doc_id hash, m).
    Output is the audit a pipeline logs: per-class totals, kept count
    (== min class size for every row), and a kept-set checksum
    (sum/min/max of kept doc_ids) so a downstream reader can verify the
    exact membership without shipping the ids.

    Scale: the rank window partitions BY CLASS over (hash, doc_id) —
    the standard per-class hash top-m; each partition is one class
    (documents are class-skewed but a class is orders of magnitude
    below the corpus; for a single monster class, pre-filter by a hash
    prefix bound before ranking — the two-phase top-k pattern of
    sample_reservoir_per_key). The min class size rides a 1-row
    broadcast."""
    from pyspark.sql.window import Window as W

    d = load_table(spark, sf_dir, "documents")
    h = d.select(
        "lang",
        "doc_id",
        F.expr(
            dl.hex_prefix_u60(dl.SPARK, "md5(CAST(doc_id AS STRING))")
        ).alias("h"),
    )
    m = (
        h.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy()
        .agg(F.min("c").alias("m"))
    )
    ranked = h.withColumn(
        "rnk", F.row_number().over(W.partitionBy("lang").orderBy("h", "doc_id"))
    )
    kept = ranked.crossJoin(F.broadcast(m)).filter(F.col("rnk") <= F.col("m"))
    return (
        kept.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("doc_id").alias("kept_docid_sum"),
            F.min("doc_id").alias("kept_docid_min"),
            F.max("doc_id").alias("kept_docid_max"),
        )
        .join(
            h.groupBy("lang").agg(F.count(F.lit(1)).alias("n_class")), "lang"
        )
        .select(
            "lang", "n_class", "n_kept",
            "kept_docid_sum", "kept_docid_min", "kept_docid_max",
        )
        .orderBy("lang")
    )


def _oracle_class_balance() -> str:
    u60 = dl.hex_prefix_u60(dl.DUCK, "md5(CAST(doc_id AS VARCHAR))")
    return f"""
WITH h AS (
  SELECT lang, doc_id, {u60} AS h FROM documents
), m AS (
  SELECT min(c) AS m FROM (SELECT count(*) AS c FROM h GROUP BY lang)
), ranked AS (
  SELECT lang, doc_id,
    row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rnk
  FROM h
), kept AS (
  SELECT lang, doc_id FROM ranked CROSS JOIN m WHERE rnk <= m
)
SELECT k.lang, cls.n_class, count(*) AS n_kept,
  CAST(sum(doc_id) AS BIGINT) AS kept_docid_sum,
  min(doc_id) AS kept_docid_min, max(doc_id) AS kept_docid_max
FROM kept k
JOIN (SELECT lang, count(*) AS n_class FROM h GROUP BY 1) cls ON cls.lang = k.lang
GROUP BY 1, 2 ORDER BY k.lang
"""


QUERIES = {
    "docs_shard_order": docs_shard_order,
    "sample_weighted_priority": sample_weighted_priority,
    "dataset_split_assign": dataset_split_assign,
    "sample_systematic": sample_systematic,
    "sample_stratified": sample_stratified,
    "sample_class_balance": sample_class_balance,
    "embedding_quantize_int8": embedding_quantize_int8,
}

ORACLES = {
    "docs_shard_order": _oracle_shard_order(),
    "sample_weighted_priority": _oracle_weighted(),
    "dataset_split_assign": _oracle_split(),
    "sample_systematic": _oracle_sample(),
    "sample_stratified": _oracle_stratified(),
    "sample_class_balance": _oracle_class_balance(),
    "embedding_quantize_int8": _oracle_quantize(),
}
