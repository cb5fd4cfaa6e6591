"""Central registry: every implemented query + its DuckDB oracle SQL.

The driver contract (__spark_entry__.py) re-exports these. Modules register
{name -> fn(spark, sf_dir) -> DataFrame} and {name -> oracle SQL}; a query
without an oracle gets the driver's weaker rows-only check (reserved for
genuinely non-SQL-expressible ops, e.g. binary-payload transport).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .operators import (
    analytics_ext,
    cleaning,
    dedup,
    graph,
    layout,
    grouped_pandas,
    ml,
    multimodal,
    relational,
    relational_ext,
    sampling,
    similarity,
    skew,
    sql_battery,
    textstats,
    trends,
)

_MODULES = [
    relational,
    relational_ext,
    analytics_ext,
    trends,
    dedup,
    similarity,
    skew,
    sql_battery,
    textstats,
    multimodal,
    grouped_pandas,
    sampling,
    cleaning,
    layout,
    graph,
    ml,
]

QueryFn = Callable[[SparkSession, str], DataFrame]


def all_queries() -> dict[str, QueryFn]:
    out: dict[str, QueryFn] = {}
    for m in _MODULES:
        overlap = set(out) & set(m.QUERIES)
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(m.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    unknown = set(out) - set(all_queries())
    if unknown:
        raise ValueError(f"oracles without queries: {unknown}")
    return out
