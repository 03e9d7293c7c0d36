"""Declared schemas + validation for the two-zone lake.

Mirrors the reference's validation layer
(`/root/reference/utilidades/data_validation_utils.py:17-136`): every
dataset has a pinned processed-zone StructType; ``validate`` projects,
casts, and null-checks before any write. Types follow the reference's
dtype rules — `datetime_utc` tz-naive-UTC timestamp, `id_mercado`
small int (1-28; Spark has no unsigned so ShortType), value columns
float32, entity columns string.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Processed-zone tables (SURVEY §1.4; data_validation_utils.py:17-23)
# ---------------------------------------------------------------------------

_TS = T.TimestampNTZType()


def _s(*fields: tuple[str, T.DataType]) -> T.StructType:
    return T.StructType([T.StructField(n, t, True) for n, t in fields])


PROCESSED_SCHEMAS: dict[str, T.StructType] = {
    "precios": _s(
        ("datetime_utc", _TS), ("id_mercado", T.ShortType()), ("precio", T.FloatType())
    ),
    "volumenes_i90": _s(
        ("datetime_utc", _TS),
        ("up", T.StringType()),
        ("volumenes", T.FloatType()),
        ("id_mercado", T.ShortType()),
    ),
    # tipo_transaccion kept when present (_procesador_i90.py:229-231)
    "volumenes_i90_tipo": _s(
        ("datetime_utc", _TS),
        ("up", T.StringType()),
        ("volumenes", T.FloatType()),
        ("id_mercado", T.ShortType()),
        ("tipo_transaccion", T.StringType()),
    ),
    "volumenes_omie": _s(
        ("datetime_utc", _TS),
        ("uof", T.StringType()),
        ("volumenes", T.FloatType()),
        ("id_mercado", T.ShortType()),
    ),
    "volumenes_mic": _s(
        ("datetime_utc", _TS),
        ("uof", T.StringType()),
        ("volumenes", T.FloatType()),
        ("precio", T.FloatType()),
        ("id_mercado", T.ShortType()),
        ("fecha_fichero", T.StringType()),
    ),
    "volumenes_i3": _s(
        ("datetime_utc", _TS),
        ("tecnologia", T.StringType()),
        ("volumenes", T.FloatType()),
        ("id_mercado", T.ShortType()),
    ),
    "curtailments_i90": _s(
        ("datetime_utc", _TS),
        ("up", T.StringType()),
        ("RTx", T.StringType()),
        ("tipo", T.StringType()),
        ("volumenes", T.FloatType()),
        ("id_mercado", T.ShortType()),
    ),
    "curtailments_i3": _s(
        ("datetime_utc", _TS),
        ("tecnologia", T.StringType()),
        ("RTx", T.StringType()),
        ("tipo", T.StringType()),
        ("volumenes", T.FloatType()),
        ("id_mercado", T.ShortType()),
    ),
}

# Upsert dedup keys per dataset, keep-last semantics
# (processed_file_utils.py:51-67). volumenes_mic is exempt — continuous
# intraday trades legitimately repeat (processed_file_utils.py:65-67).
DEDUP_KEYS: dict[str, list[str] | None] = {
    "precios": ["datetime_utc", "id_mercado", "precio"],
    "volumenes_i90": ["datetime_utc", "volumenes", "up", "id_mercado"],
    "volumenes_i90_tipo": ["datetime_utc", "volumenes", "up", "id_mercado"],
    "volumenes_omie": ["datetime_utc", "volumenes", "uof", "id_mercado"],
    "volumenes_mic": None,
    "volumenes_i3": ["datetime_utc", "volumenes", "tecnologia", "id_mercado"],
    "curtailments_i90": ["datetime_utc", "up", "RTx", "tipo", "id_mercado"],
    "curtailments_i3": ["datetime_utc", "tecnologia", "RTx", "tipo", "id_mercado"],
}

# ---------------------------------------------------------------------------
# Raw-zone shapes (FIXTURES.md §1; data_validation_utils.py:26-31).
# Raw keeps strings loose — `hora` is a string because of DST suffixes
# and 15-min indices (data_validation_utils.py:151-156).
# ---------------------------------------------------------------------------

RAW_SCHEMAS: dict[str, T.StructType] = {
    "raw_precios_esios": _s(
        ("datetime_utc", T.StringType()),
        ("value", T.DoubleType()),
        ("indicador_id", T.StringType()),
        ("geo_name", T.StringType()),
        ("granularidad", T.StringType()),
    ),
    "raw_volumenes_i90": _s(
        ("fecha", T.StringType()),
        ("hora", T.StringType()),
        ("granularity", T.StringType()),
        ("volumenes", T.DoubleType()),
        ("Unidad de Programación", T.StringType()),
        ("Sentido", T.StringType()),
        ("Redespacho", T.StringType()),
        ("Tipo Transacción", T.StringType()),
        ("sheet_i90_volumenes", T.StringType()),
    ),
    "raw_precios_i90": _s(
        ("fecha", T.StringType()),
        ("hora", T.StringType()),
        ("granularity", T.StringType()),
        ("precios", T.DoubleType()),
        ("Unidad de Programación", T.StringType()),
        ("Sentido", T.StringType()),
        ("Redespacho", T.StringType()),
    ),
    "raw_volumenes_i3": _s(
        ("fecha", T.StringType()),
        ("hora", T.StringType()),
        ("granularity", T.StringType()),
        ("volumenes", T.DoubleType()),
        ("Concepto", T.StringType()),
        ("Sentido", T.StringType()),
        ("Redespacho", T.StringType()),
        ("Programa", T.StringType()),
    ),
    "raw_volumenes_omie": _s(
        ("Fecha", T.StringType()),
        ("Hora", T.StringType()),
        ("Unidad", T.StringType()),
        ("Energía Compra/Venta", T.StringType()),
        ("Ofertada (O)/Casada (C)", T.StringType()),
        ("Tipo Oferta", T.StringType()),
        ("id_mercado", T.IntegerType()),
    ),
    "raw_volumenes_mic": _s(
        ("Fecha", T.StringType()),
        ("Contrato", T.StringType()),
        ("Precio", T.StringType()),
        ("Cantidad", T.StringType()),
        ("Unidad compra", T.StringType()),
        ("Unidad venta", T.StringType()),
        ("id_mercado", T.IntegerType()),
    ),
}


class SchemaValidationError(ValueError):
    pass


def validate(df: DataFrame, dataset: str, strict_nulls: tuple[str, ...] = ()) -> DataFrame:
    """Project + cast a DataFrame to the declared processed schema.

    Mirrors `_validate_columns` + dtype coercion
    (data_validation_utils.py:77-228): missing columns raise, extra
    columns are dropped, every column is cast to the pinned type.
    ``strict_nulls`` adds a lazy null-guard (fails at action time via
    ``raise_error``, so the check stays distributed — no collect).
    """
    schema = PROCESSED_SCHEMAS.get(dataset) or RAW_SCHEMAS.get(dataset)
    if schema is None:
        raise SchemaValidationError(f"unknown dataset {dataset!r}")
    missing = [f.name for f in schema.fields if f.name not in df.columns]
    if missing:
        raise SchemaValidationError(f"{dataset}: missing columns {missing}")
    cols = []
    for f in schema.fields:
        c = F.col(f.name).cast(f.dataType)
        if f.name in strict_nulls:
            c = F.when(
                F.col(f.name).isNull(),
                F.raise_error(F.lit(f"{dataset}: null in required column {f.name}")),
            ).otherwise(c)
        cols.append(c.alias(f.name))
    return df.select(*cols)
