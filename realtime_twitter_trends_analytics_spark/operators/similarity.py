"""Similarity search over the embeddings table (north-star surface).

Brute-force cosine top-k is the correctness baseline; the LSH-bucketed
variant is the 100 TB path (candidates come from a signed-random-projection
bucket equi-join, never an all-pairs product). Centroid aggregation shows
vector aggregation in long form (posexplode -> (label, dim) hash agg).

All arithmetic uses sequential left-to-right double folds (Spark
``aggregate`` / DuckDB ``list_sum``) over identical casts, so Spark and the
oracle produce bit-equal doubles before the final round(4).

Scale notes:
- dot/norm are JVM-side higher-order functions (no Python in the loop).
- brute force is a broadcast nested-loop of Q query vectors x N candidates:
  right for small Q; the LSH variant holds when Q ~ N.
- the per-query top-k uses a row_number window partitioned by query id —
  shuffle keyed by query id only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window as W

from ..functions import dialect as dl
from ..sources.loaders import load_table

N_QUERY_VECS = 10   # vec_id < 10 are the query set
TOP_K = 10
LSH_BITS = 8        # signed-random-projection bits -> 256 buckets
EMB_DIM = 64


def dot_sql(d: str, a: str, b: str) -> str:
    """Sequential double dot product of two float arrays (dual-dialect)."""
    prods = dl.transform(
        d,
        dl.seq(d, "1", str(EMB_DIM)),
        "i",
        f"CAST({dl.arr_element(d, a, 'i')} AS DOUBLE) * CAST({dl.arr_element(d, b, 'i')} AS DOUBLE)",
    )
    return dl.arr_sum_double(d, prods)


def norm_sql(d: str, a: str) -> str:
    return f"sqrt({dot_sql(d, a, a)})"


def cosine_sql(d: str, a: str, b: str) -> str:
    return f"({dot_sql(d, a, b)}) / (({norm_sql(d, a)}) * ({norm_sql(d, b)}))"


def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine top-K for each of the first N_QUERY_VECS vectors against all
    others. Query side is broadcast; candidates stream through map-side."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    c = emb.select(F.col("vec_id").alias("cand_id"), F.col("embedding").alias("cv"), "label")
    pairs = F.broadcast(q).crossJoin(c).filter(F.col("query_id") != F.col("cand_id"))
    sim = pairs.withColumn("cosine", F.expr(cosine_sql(dl.SPARK, "qv", "cv")))
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        sim.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "cand_id", "label", F.round("cosine", 4).alias("cosine"), "rnk")
    )


def _oracle_bruteforce() -> str:
    cos = cosine_sql(dl.DUCK, "q.embedding", "c.embedding")
    return f"""
WITH pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS cand_id, c.label, {cos} AS cosine
  FROM embeddings q JOIN embeddings c ON q.vec_id < {N_QUERY_VECS} AND q.vec_id <> c.vec_id
)
SELECT query_id, cand_id, label, round(cosine, 4) AS cosine, rnk FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id ASC) AS rnk
  FROM pairs
) WHERE rnk <= {TOP_K}
"""


def _hyperplane_sql(d: str, b: int) -> str:
    """Deterministic integer 'random' hyperplane b: component j has value
    ((b*31 + j*17) % 13) - 6 — identical in both engines, no RNG needed."""
    return dl.transform(
        d, dl.seq(d, "1", str(EMB_DIM)), "j", f"CAST((({b} * 31 + j * 17) % 13) - 6 AS DOUBLE)"
    )


def lsh_bucket_sql(d: str, vec: str) -> str:
    """LSH_BITS-bit signed-projection bucket id of ``vec``."""
    bits = []
    for b in range(LSH_BITS):
        h = _hyperplane_sql(d, b)
        prods = dl.transform(
            d,
            dl.seq(d, "1", str(EMB_DIM)),
            "i",
            f"CAST({dl.arr_element(d, vec, 'i')} AS DOUBLE) * {dl.arr_element(d, h, 'i')}",
        )
        dot = dl.arr_sum_double(d, prods)
        bits.append(f"(CASE WHEN ({dot}) > 0 THEN {2**b} ELSE 0 END)")
    return "(" + " + ".join(bits) + ")"


def sim_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket histogram of the signed-random-projection LSH (sanity surface
    for the ANN index: bucket sizes bound candidate cost)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select(F.expr(lsh_bucket_sql(dl.SPARK, "embedding")).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
    )


def _oracle_lsh_buckets() -> str:
    return f"""
SELECT {lsh_bucket_sql(dl.DUCK, 'embedding')} AS bucket, count(*) AS n_vectors
FROM embeddings GROUP BY 1
"""


def sim_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k via LSH: same query set as brute force, but candidates are
    only vectors in the SAME bucket — the scale path (equi-join on bucket,
    per-bucket products instead of full cross product)."""
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "bucket", F.expr(lsh_bucket_sql(dl.SPARK, "embedding"))
    )
    q = emb.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"), "bucket"
    )
    c = emb.select(F.col("vec_id").alias("cand_id"), F.col("embedding").alias("cv"), "bucket")
    pairs = F.broadcast(q).join(c, "bucket").filter(F.col("query_id") != F.col("cand_id"))
    sim = pairs.withColumn("cosine", F.expr(cosine_sql(dl.SPARK, "qv", "cv")))
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        sim.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "cand_id", F.round("cosine", 4).alias("cosine"), "rnk")
    )


def _oracle_lsh_ann() -> str:
    cos = cosine_sql(dl.DUCK, "q.embedding", "c.embedding")
    bucket = lsh_bucket_sql(dl.DUCK, "embedding")
    return f"""
WITH bucketed AS (
  SELECT vec_id, embedding, {bucket} AS bucket FROM embeddings
), pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS cand_id, {cos} AS cosine
  FROM bucketed q JOIN bucketed c ON q.bucket = c.bucket
  WHERE q.vec_id < {N_QUERY_VECS} AND q.vec_id <> c.vec_id
)
SELECT query_id, cand_id, round(cosine, 4) AS cosine, rnk FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id ASC) AS rnk
  FROM pairs
) WHERE rnk <= {TOP_K}
"""


def sim_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid in long form: posexplode to (label, dim, value),
    hash-agg mean per (label, dim). Long form IS the scalable layout — the
    shuffle key (label, dim) is uniform, and no row ever holds a full
    centroid until the (tiny) final pivot a consumer might do."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select("label", F.posexplode("embedding").alias("dim", "v"))
        .groupBy("label", "dim")
        .agg(
            F.round(F.sum(F.col("v").cast("double")) / F.count(F.lit(1)), 4).alias("centroid_v"),
            F.count(F.lit(1)).alias("n_vectors"),
        )
    )


# DuckDB: parallel unnest of the list and its index sequence zips them.
ORACLE_CENTROIDS = """
WITH exploded AS (
  SELECT label,
    unnest(generate_series(0, len(embedding) - 1)) AS dim,
    unnest(embedding) AS v
  FROM embeddings
)
SELECT label, CAST(dim AS INT) AS dim,
  round(sum(CAST(v AS DOUBLE)) / count(*), 4) AS centroid_v,
  count(*) AS n_vectors
FROM exploded GROUP BY label, dim
"""


QUERIES = {
    "sim_topk_bruteforce": sim_topk_bruteforce,
    "sim_lsh_buckets": sim_lsh_buckets,
    "sim_lsh_ann": sim_lsh_ann,
    "sim_label_centroids": sim_label_centroids,
}

ORACLES = {
    "sim_topk_bruteforce": _oracle_bruteforce(),
    "sim_lsh_buckets": _oracle_lsh_buckets(),
    "sim_lsh_ann": _oracle_lsh_ann(),
    "sim_label_centroids": ORACLE_CENTROIDS,
}
