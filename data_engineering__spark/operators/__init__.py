from . import dedup, merge, multimodal, quality, relational, text, vector, window

__all__ = [
    "relational", "window", "merge", "dedup", "quality", "text", "vector", "multimodal",
]
