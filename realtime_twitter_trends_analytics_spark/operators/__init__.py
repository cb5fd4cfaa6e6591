from . import dedup, multimodal, relational, similarity, textstats, trends

__all__ = ["dedup", "multimodal", "relational", "similarity", "textstats", "trends"]
