from .catalog import CATALOG, QueryEntry, queries, oracle_sql

__all__ = ["CATALOG", "QueryEntry", "queries", "oracle_sql"]
