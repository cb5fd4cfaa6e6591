from . import (
    dedup,
    grouped_pandas,
    multimodal,
    relational,
    relational_ext,
    sampling,
    similarity,
    skew,
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
    "textstats",
    "trends",
]
