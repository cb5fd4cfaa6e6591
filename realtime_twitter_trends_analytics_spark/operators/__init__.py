from . import (
    dedup,
    grouped_pandas,
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

__all__ = [
    "dedup",
    "grouped_pandas",
    "multimodal",
    "relational",
    "relational_ext",
    "sampling",
    "similarity",
    "skew",
    "sql_battery",
    "textstats",
    "trends",
]
