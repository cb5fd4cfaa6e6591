from . import dialect, sentiment, text

__all__ = ["dialect", "sentiment", "text"]
