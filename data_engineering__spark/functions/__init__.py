from .derive import (
    case_when_contains,
    first_token_before,
    map_lookup,
)

__all__ = ["case_when_contains", "map_lookup", "first_token_before"]
