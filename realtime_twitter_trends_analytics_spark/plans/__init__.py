from .explain import explain_str, count_exchanges, has_pushed_filters

__all__ = ["explain_str", "count_exchanges", "has_pushed_filters"]
