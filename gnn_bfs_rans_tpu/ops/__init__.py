"""Aggregation primitives: segment (reference), dense padded-neighbor (fast)."""

from . import dense, segment

__all__ = ["dense", "segment"]
