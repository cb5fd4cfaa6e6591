from . import dedup, multimodal, relational, relational_ext, similarity, skew, textstats, trends

__all__ = ["dedup", "multimodal", "relational", "relational_ext", "similarity", "skew", "textstats", "trends"]
