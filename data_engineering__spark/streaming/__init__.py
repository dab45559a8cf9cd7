from . import windows, sinks

__all__ = ["windows", "sinks"]
