from . import audit, pipeline

__all__ = ["audit", "pipeline"]
