from . import dedup, linking, similarity, tracking  # noqa: F401

__all__ = ["dedup", "linking", "similarity", "tracking"]
