"""Query catalog — the engine's declared operator surface.

Every operator family from SURVEY.md §2 (plus the beyond-reference
LLM-data-pipeline operators) is declared here as a named entry with

- ``fn(spark, sf_dir) -> DataFrame``: the Spark-first implementation
  (DataFrame API / Spark SQL), and
- ``oracle``: the equivalent ANSI SQL that DuckDB runs on the same
  parquet tables (``None`` for genuinely non-SQL-expressible ops —
  the driver then records a rows-only check).

Column names are aliased identically on both sides; the driver's
compare sorts columns by name and hashes values.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QueryEntry:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


CATALOG: dict[str, QueryEntry] = {}


def register(
    name: str,
    oracle: str | None,
    tags: tuple[str, ...] = (),
    doc: str = "",
) -> Callable[[Callable[[SparkSession, str], DataFrame]], Callable]:
    def deco(fn: Callable[[SparkSession, str], DataFrame]) -> Callable:
        if name in CATALOG:
            raise ValueError(f"duplicate query name {name!r}")
        CATALOG[name] = QueryEntry(name=name, fn=fn, oracle=oracle, tags=tags, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def _load_all() -> None:
    # importing the modules populates CATALOG via @register
    from . import tpch  # noqa: F401
    from . import relational  # noqa: F401
    from . import timeops  # noqa: F401
    from . import textops  # noqa: F401
    from . import vectorops  # noqa: F401
    from . import linkingops  # noqa: F401
    from . import dedupops  # noqa: F401
    from . import streamops  # noqa: F401
    from . import parity  # noqa: F401


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return {name: e.fn for name, e in CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {name: e.oracle for name, e in CATALOG.items() if e.oracle is not None}
