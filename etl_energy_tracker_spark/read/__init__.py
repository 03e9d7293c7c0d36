from .readers import PreciosReader, VolumenesReader, register_lake_tables
from .nl2sql import NLQueryGenerator

__all__ = [
    "NLQueryGenerator",
    "PreciosReader",
    "VolumenesReader",
    "register_lake_tables",
]
