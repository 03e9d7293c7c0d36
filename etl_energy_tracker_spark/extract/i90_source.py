"""I90/I3 Excel-in-zip source (S2/S3) — Spark rendering of
_descargador_i90.py:88-304.

The reference downloads ``archives/34`` zips, finds the header row by
scanning for the "Total" cell, reads each sheet, and melts the wide
hour columns (``1..24``/``1..96`` + Total) to long rows.

Split into offline-testable pieces:
- ``detect_header_row``: the "Total"-cell scan over a raw grid
- ``melt_hour_columns``: wide → long as a native Spark ``unpivot``
  (no pandas melt), granularity tagged from the hour-column count
- ``sheet_to_raw``: glue both, add fecha + sheet id

Excel byte decoding itself needs openpyxl (not in this container) —
gated behind an import-try; the grid-level logic takes a
list-of-lists, which tests feed directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_excel_grid(content: bytes, sheet: str) -> list[list]:
    """Excel bytes → row grid. Needs openpyxl; import-gated."""
    try:
        import io

        import openpyxl  # noqa: F401
        import pandas as pd
    except ImportError as e:  # pragma: no cover - container has no openpyxl
        raise NotImplementedError(
            "Excel decoding needs openpyxl; ingest raw CSVs instead"
        ) from e
    pdf = pd.read_excel(io.BytesIO(content), sheet_name=sheet, header=None)
    return pdf.values.tolist()


def detect_header_row(grid: list[list]) -> int:
    """Header row = first row containing a 'Total' cell
    (_descargador_i90.py:229-246)."""
    for i, row in enumerate(grid):
        if any(str(c).strip() == "Total" for c in row):
            return i
    raise ValueError("no 'Total' header cell found in sheet")


def grid_to_wide_df(spark: SparkSession, grid: list[list]) -> DataFrame:
    """Grid → wide DataFrame using the detected header row; all cells
    stay strings (raw zone is loosely typed)."""
    h = detect_header_row(grid)
    header = [str(c).strip() for c in grid[h]]
    data = [[None if c is None else str(c) for c in row] for row in grid[h + 1 :]]
    cols = ", ".join(f"`{c}` string" for c in header)
    return spark.createDataFrame(data, cols)


def melt_hour_columns(
    df: DataFrame, value_name: str = "volumenes"
) -> DataFrame:
    """Wide hour columns → long (hora, value) rows via native unpivot
    (§2.8; _descargador_i90.py:260-266). Hour columns are the numeric
    ones; granularity is tagged from their count (≤25 → hourly,
    else 15-min indices). NA/0 values drop at ingest
    (_descargador_i90.py:286-292)."""
    hour_cols = [c for c in df.columns if c.strip().lstrip("-").isdigit()]
    id_cols = [c for c in df.columns if c not in hour_cols and c.strip() != "Total"]
    granularity = "Hora" if len(hour_cols) <= 25 else "Quince minutos"
    long = df.unpivot(
        ids=id_cols,
        values=hour_cols,
        variableColumnName="hora",
        valueColumnName=value_name,
    )
    return (
        long.withColumn(value_name, F.col(value_name).cast("double"))
        .where(F.col(value_name).isNotNull() & (F.col(value_name) != 0))
        .withColumn("granularity", F.lit(granularity))
    )


def sheet_to_raw(
    spark: SparkSession,
    grid: list[list],
    fecha: str,
    sheet_id: str,
    value_name: str = "volumenes",
) -> DataFrame:
    """Full sheet → raw rows: header detection, melt, date + sheet tag
    (the reference's extract_sheets_of_interest per-sheet body)."""
    wide = grid_to_wide_df(spark, grid)
    long = melt_hour_columns(wide, value_name)
    return long.withColumn("fecha", F.lit(fecha)).withColumn(
        "sheet_i90_volumenes", F.lit(sheet_id)
    )
