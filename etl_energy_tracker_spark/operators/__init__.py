from . import bucketing, dedup, linking, merge, similarity, skew, tracking  # noqa: F401

__all__ = [
    "bucketing",
    "dedup",
    "linking",
    "merge",
    "similarity",
    "skew",
    "tracking",
]
