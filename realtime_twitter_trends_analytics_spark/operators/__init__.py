from . import dedup, multimodal, relational, relational_ext, similarity, textstats, trends

__all__ = ["dedup", "multimodal", "relational", "relational_ext", "similarity", "textstats", "trends"]
