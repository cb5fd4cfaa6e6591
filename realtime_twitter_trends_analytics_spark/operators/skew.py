"""Skew-mitigation patterns (SURVEY §4.3): the trend keys are viral —
a handful of hashtags carry most of the traffic, so a naive groupBy puts
the hottest key on one reducer.

Two defenses ship here:

1. AQE (on by default in session.py): splits skewed shuffle partitions at
   runtime for joins, coalesces empties.
2. Salted two-phase aggregation: explode each key into SALT_BUCKETS
   sub-keys, partial-agg on (key, salt), then merge per key. The second
   shuffle moves only |keys| x SALT_BUCKETS pre-aggregated rows. For
   *algebraic* aggregates Spark's own partial aggregation already does
   map-side combining — salting matters when the combine itself is
   reducer-bound (huge per-key state, e.g. count_distinct) or when a
   downstream window function pins a whole key to one task.

``trends_token_topk_salted`` is semantically identical to
``trends.trends_token_topk`` (tests assert equality) and exists as the
documented scale-out shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window as W

from ..sources.loaders import load_table

SALT_BUCKETS = 16


def trends_token_topk_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted variant of the trends top-k: phase 1 aggregates on
    (source, token, salt) — spreading any single hot token over
    SALT_BUCKETS reducers — phase 2 merges the partials per (source, token)
    and ranks. Same result, bounded per-reducer load."""
    d = load_table(spark, sf_dir, "documents")
    tok = (
        d.select("source", F.explode(F.split(F.col("text"), " ")).alias("token"))
        .filter(F.length("token") > 1)
        # deterministic salt (not rand(): keeps retries/oracle stable)
        .withColumn("salt", F.crc32(F.col("token")) % SALT_BUCKETS)
    )
    partial = tok.groupBy("source", "token", "salt").agg(
        F.count(F.lit(1)).alias("partial_cnt")
    )
    counts = partial.groupBy("source", "token").agg(
        F.sum("partial_cnt").alias("cnt")
    )
    w = W.partitionBy("source").orderBy(F.desc("cnt"), F.asc("token"))
    return counts.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= 5)


# Same oracle as trends_token_topk — salting must be invisible in results.
ORACLE_SALTED = """
WITH tok AS (
  SELECT source, unnest(string_split(text, ' ')) AS token FROM documents
), counts AS (
  SELECT source, token, count(*) AS cnt FROM tok WHERE length(token) > 1
  GROUP BY source, token
)
SELECT source, token, cnt, CAST(rnk AS INT) AS rnk FROM (
  SELECT *, row_number() OVER (PARTITION BY source ORDER BY cnt DESC, token ASC) AS rnk
  FROM counts
) WHERE rnk <= 5
"""


def skewed_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted fact-to-hot-dim join shape: replicate the (small) build side
    SALT_BUCKETS times, salt the probe side, join on (key, salt) — no
    single reducer sees a whole hot key. Build side stays broadcast here
    (documents lang dim); the pattern matters when the build side is too
    big to broadcast but the probe key is skewed."""
    d = load_table(spark, sf_dir, "documents")
    lang_dim = (
        d.groupBy("lang").agg(F.count(F.lit(1)).alias("lang_docs"))
        .crossJoin(spark.range(SALT_BUCKETS).select(F.col("id").alias("salt")))
    )
    probe = d.select(
        "doc_id", "lang", (F.crc32(F.col("text")) % SALT_BUCKETS).alias("salt")
    )
    joined = probe.join(F.broadcast(lang_dim), ["lang", "salt"])
    return joined.groupBy("lang", "lang_docs").agg(F.count(F.lit(1)).alias("n_docs"))


ORACLE_SKEW_JOIN = """
WITH dim AS (SELECT lang, count(*) AS lang_docs FROM documents GROUP BY lang)
SELECT d.lang, lang_docs, count(*) AS n_docs
FROM documents d JOIN dim ON d.lang = dim.lang
GROUP BY d.lang, lang_docs
"""


QUERIES = {
    "trends_token_topk_salted": trends_token_topk_salted,
    "skewed_join_salted": skewed_join_salted,
}

ORACLES = {
    "trends_token_topk_salted": ORACLE_SALTED,
    "skewed_join_salted": ORACLE_SKEW_JOIN,
}
