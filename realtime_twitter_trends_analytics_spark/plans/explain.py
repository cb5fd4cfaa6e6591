"""Physical-plan inspection helpers.

The engine's scale story is enforced, not hoped for: tests assert that
filters reach the parquet scan (PushedFilters), small dims broadcast, global
top-k plans as TakeOrderedAndProject, and shuffle counts stay at the
theoretical minimum. ``explain("formatted")`` output is the contract.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """Capture df.explain output as a string."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (AQE panels count
    once; reused exchanges are deduped by node id)."""
    plan = explain_str(df, "formatted")
    ids = set(re.findall(r"\((\d+)\) Exchange", plan))
    return len(ids)


def has_pushed_filters(df: DataFrame, fragment: str) -> bool:
    """True if a parquet scan in the plan pushed a filter mentioning
    ``fragment`` (e.g. a column name)."""
    plan = explain_str(df, "formatted")
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        if fragment in m.group(1):
            return True
    return False


def has_node(df: DataFrame, node: str) -> bool:
    return node in explain_str(df, "formatted")
