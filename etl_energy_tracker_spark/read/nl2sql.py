"""NL→SQL query surface — Spark rendering of
read/natlanguage_duckdb_queries.py:47-418, retargeted from DuckDB to
Spark SQL.

The reference embeds the lake schemas, the 28-market map, and query
rules into a system prompt, sends the user's question to an LLM, and
executes the returned SQL on DuckDB. Here:

- the prompt is rebuilt for the Spark SQL dialect over the registered
  lake tables (no read_parquet() incantations — tables are views, and
  Catalyst does the partition pruning the reference's prompt begs
  DuckDB for);
- the LLM call is an injectable ``llm: Callable[[str], str]`` — this
  environment has no network, so callers supply their client;
- returned SQL is safety-checked (single SELECT statement over known
  tables) before ``spark.sql``.
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..config.market_config import MARKETS
from ..schemas import PROCESSED_SCHEMAS


def _schemas_block() -> str:
    lines = []
    for name, schema in PROCESSED_SCHEMAS.items():
        cols = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in schema.fields)
        lines.append(f"- {name}({cols})")
    return "\n".join(lines)


def _market_block() -> str:
    return "\n".join(
        f"- id {m.id}: {m.name} (folder {m.folder})" for m in MARKETS
    )


def build_system_prompt() -> str:
    """The reference's prompt structure (schemas + market map + rules,
    natlanguage_duckdb_queries.py:113-338) targeting Spark SQL."""
    return f"""You translate natural-language questions about the Spanish
electricity market data lake into Spark SQL.

Tables (already registered as views; query them directly, never with
file paths):
{_schemas_block()}

Market id mapping (id_mercado):
{_market_block()}

Rules:
- Return ONE Spark SQL SELECT statement, nothing else.
- Timestamps are UTC 15-minute grid in `datetime_utc`; filter date
  ranges on `datetime_utc` (partition pruning is automatic).
- Join prices to volumes on (datetime_utc, id_mercado).
- Prices are EUR/MWh; volumes MWh. Round money to 2 decimals.
- For rolling metrics use window functions
  (e.g. avg(precio) OVER (ORDER BY datetime_utc ROWS BETWEEN 95
  PRECEDING AND CURRENT ROW) for a 24h rolling mean on 15-min data).
- Use GROUP BY ROLLUP for hierarchical summaries when asked for
  subtotals.
"""


_FORBIDDEN = re.compile(
    r"\b(INSERT|UPDATE|DELETE|DROP|CREATE|ALTER|TRUNCATE|MERGE|GRANT)\b", re.I
)


class NLQueryGenerator:
    def __init__(self, spark: SparkSession, llm: Callable[[str], str] | None = None):
        self.spark = spark
        self.llm = llm
        self.system_prompt = build_system_prompt()

    def generate_sql(self, question: str) -> str:
        # deterministic template matcher first: common question shapes
        # (prices/volumes of a market, date windows, daily averages)
        # answer offline and identically on every run; only unmatched
        # phrasings need the injected LLM client
        from .nl_templates import match_template

        templated = match_template(question)
        if templated is not None:
            return self.postprocess(templated)
        if self.llm is None:
            raise NotImplementedError(
                "question did not match an offline NL template and no LLM "
                "client is configured; pass llm=<callable str->str> "
                "(this environment has no network access)"
            )
        sql = self.llm(f"{self.system_prompt}\n\nQuestion: {question}\nSQL:")
        return self.postprocess(sql)

    @staticmethod
    def postprocess(sql: str) -> str:
        """Strip markdown fences; enforce a single read-only SELECT
        (the reference's postprocess ensures hive_partitioning —
        irrelevant on Spark; safety checks replace it)."""
        sql = re.sub(r"^```(?:sql)?|```$", "", sql.strip(), flags=re.M).strip().rstrip(";")
        if _FORBIDDEN.search(sql):
            raise ValueError("generated SQL contains a non-SELECT statement")
        if ";" in sql:
            raise ValueError("generated SQL must be a single statement")
        if not re.match(r"^\s*(SELECT|WITH)\b", sql, re.I):
            raise ValueError("generated SQL must start with SELECT/WITH")
        return sql

    def execute_query(self, question: str) -> DataFrame:
        return self.spark.sql(self.generate_sql(question))
