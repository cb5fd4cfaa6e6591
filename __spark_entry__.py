"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   -> flagship query on /root/testdata/sf0.001 (smoke check)
queries()      -> {name: fn(spark, sf_dir) -> DataFrame} per SURVEY.md §2
oracle_sql()   -> {name: DuckDB-runnable ANSI SQL} for the correctness gate
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from realtime_twitter_trends_analytics_spark.operators.trends import tweet_pipeline_flagship
from realtime_twitter_trends_analytics_spark.registry import all_oracles, all_queries
from realtime_twitter_trends_analytics_spark.session import apply_runtime_confs

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's full intended pipeline (SURVEY §7.2) —
    token explode -> sentiment -> per-(lang, token) count + mean sentiment ->
    top-10 per lang."""
    apply_runtime_confs(spark)
    return tweet_pipeline_flagship(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    base = all_queries()

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            apply_runtime_confs(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in base.items()}


def oracle_sql() -> dict[str, str]:
    return all_oracles()
